"""VTK / PLY export: meshes, 3D field slices, block lists.

Reference: `se_denseslam/include/se/vtk-io.h:114-211` (save3DSlice,
saveBlockList) and the VTK mesh writer in `se_denseslam/include/se/commons.h:326-410`.
"""

from __future__ import annotations

import numpy as np

from supereight_tpu.core import octree


def write_vtk_mesh(path: str, triangles: np.ndarray):
    """Legacy-VTK polydata mesh of float32 [n, 3, 3] triangles
    (writeVtkMesh parity, `commons.h:326-410`)."""
    tris = np.asarray(triangles, np.float32)
    n = tris.shape[0]
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 1.0\n")
        f.write("vtk mesh generated from supereight_tpu\n")
        f.write("ASCII\n")
        f.write("DATASET POLYDATA\n")
        f.write(f"POINTS {3 * n} FLOAT\n")
        for t in tris:
            for v in t:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
        f.write(f"POLYGONS {n} {n * 4}\n")
        for i in range(n):
            f.write(f"3 {3 * i} {3 * i + 1} {3 * i + 2}\n")

def write_ply_mesh(path: str, triangles: np.ndarray):
    """Binary-less ASCII PLY of float32 [n, 3, 3] triangles."""
    tris = np.asarray(triangles, np.float32)
    n = tris.shape[0]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {3 * n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {n}\n")
        f.write("property list uchar int vertex_index\nend_header\n")
        for t in tris:
            for v in t:
                f.write(f"{v[0]} {v[1]} {v[2]}\n")
        for i in range(n):
            f.write(f"3 {3 * i} {3 * i + 1} {3 * i + 2}\n")


def save_3d_slice(path: str, m, channel: str, lower, upper):
    """Structured-points VTK export of a field slab
    (save3DSlice parity, `vtk-io.h:114-209`)."""
    lower = np.asarray(lower, int)
    upper = np.asarray(upper, int)
    xs = np.arange(lower[0], upper[0])
    ys = np.arange(lower[1], upper[1])
    zs = np.arange(lower[2], upper[2])
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    import jax.numpy as jnp
    vals = np.asarray(octree.get(m, channel, jnp.asarray(gx), jnp.asarray(gy),
                                 jnp.asarray(gz)))
    nx, ny, nz = len(xs), len(ys), len(zs)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 1.0\n")
        f.write(f"{channel} slice\nASCII\nDATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {nx} {ny} {nz}\n")
        f.write(f"ORIGIN {lower[0]} {lower[1]} {lower[2]}\n")
        f.write("SPACING 1 1 1\n")
        f.write(f"POINT_DATA {nx * ny * nz}\n")
        f.write(f"SCALARS {channel} float 1\nLOOKUP_TABLE default\n")
        # VTK structured points iterate x fastest
        for z in range(nz):
            for y in range(ny):
                for x in range(nx):
                    f.write(f"{vals[x, y, z]}\n")


def save_block_list(path: str, m):
    """Allocated block coordinates as text (saveBlockList parity)."""
    coords = np.asarray(octree.block_coords_table(m))
    n = int(m.n_blocks)
    with open(path, "w") as f:
        for i in range(n):
            c = coords[i]
            f.write(f"{c[0]} {c[1]} {c[2]}\n")
