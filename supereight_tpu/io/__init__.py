"""IO: dataset streams, ground truth, checkpoints, mesh/slice export.

Reference layers: `se_apps/include/interface.h` (readers),
`se_core/include/se/io/` (serialization), `se_denseslam/include/se/vtk-io.h`.
"""

from . import groundtruth, raw, serialise, synthetic, vtk  # noqa: F401


def create_reader(path: str):
    """Reader factory (reference ``createReader``, `se_apps/src/reader.cpp:22`):
    picks by input type — .raw stream (native mmap+prefetch reader when
    csrc is built, seek-based numpy fallback) or an ICL-NUIM scene
    directory."""
    import os
    if os.path.isdir(path):
        from .scene import SceneDepthReader
        return SceneDepthReader(path)
    from . import native
    if native.available():
        try:
            return native.NativeRawReader(path)
        except (IOError, RuntimeError):
            pass            # corrupt header etc.: fall back to strict numpy
    return raw.RawReader(path)
