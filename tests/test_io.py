"""IO tests: .raw roundtrip, TUM ground truth, map checkpoints, VTK/PLY."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from supereight_tpu.io import groundtruth, raw, serialise, synthetic, vtk
from supereight_tpu.core import octree
from supereight_tpu.core.octree import ChannelSpec


class TestRaw:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "t.raw")
        w = raw.RawWriter(path, 16, 12)
        d0 = (np.arange(12 * 16).reshape(12, 16) % 5000).astype(np.uint16)
        rgb = np.random.default_rng(0).integers(
            0, 255, (12, 16, 3)).astype(np.uint8)
        w.write(d0, rgb)
        w.write(d0 * 2)
        w.close()
        r = raw.RawReader(path)
        assert (r.width, r.height, len(r)) == (16, 12, 2)
        depth, rgb2 = r.read(0)
        np.testing.assert_array_equal(depth, d0)
        np.testing.assert_array_equal(rgb2, rgb)
        depth1, _ = r.read(1)
        np.testing.assert_array_equal(depth1, d0 * 2)


class TestGroundTruth:
    def test_pose_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        poses = []
        for _ in range(5):
            w = rng.normal(size=3)
            from supereight_tpu.pipeline import camera
            T = np.asarray(camera.se3_exp(
                jnp.asarray([*rng.normal(size=3) * 0.5, *w * 0.4],
                            jnp.float32)))
            poses.append(T)
        path = str(tmp_path / "gt.txt")
        groundtruth.write_poses(path, poses)
        loaded = groundtruth.read_poses(path)
        for a, b in zip(poses, loaded):
            np.testing.assert_allclose(a, b, atol=1e-5)

    def test_transform_applied(self, tmp_path):
        path = str(tmp_path / "gt.txt")
        groundtruth.write_poses(path, [np.eye(4)])
        Tr = np.eye(4, dtype=np.float32)
        Tr[:3, 3] = (1, 2, 3)
        loaded = groundtruth.read_poses(path, transform=Tr)
        np.testing.assert_allclose(loaded[0][:3, 3], (1, 2, 3), atol=1e-6)

    def test_comment_and_extra_cols(self, tmp_path):
        path = str(tmp_path / "gt.txt")
        with open(path, "w") as f:
            f.write("# comment\n")
            f.write("123.4 0.5 1 2 3 0 0 0 1\n")  # ts + 7 cols (+1 extra)
        loaded = groundtruth.read_poses(path)
        np.testing.assert_allclose(loaded[0][:3, 3], (1, 2, 3), atol=1e-6)


class TestSerialise:
    def test_map_checkpoint_roundtrip(self, tmp_path):
        chans = (ChannelSpec(name="v", dtype=jnp.float32, init=0.0,
                             empty=-1.0),)
        m = octree.init(32, 2.0, chans, capacity=128)
        m = octree.allocate_blocks(
            m, jnp.asarray([[0, 0, 0], [2, 3, 1]]), jnp.ones((2,), bool))
        m = octree.set_voxels(m, "v", jnp.asarray([1]), jnp.asarray([2]),
                              jnp.asarray([3]), jnp.asarray([7.5]))
        path = str(tmp_path / "map.npz")
        serialise.save_map(path, m)
        m2 = serialise.load_map(path)
        assert int(m2.n_blocks) == 2
        assert float(octree.get(m2, "v", 1, 2, 3)) == 7.5
        np.testing.assert_array_equal(np.asarray(m.block_index),
                                      np.asarray(m2.block_index))


class TestSeBinary:
    """Reference `Octree::save` binary format (VERDICT r3 item 2):
    save_se/load_se round-trips, and — when the csrc oracle binaries are
    built — agreement with the reference's own writer."""

    def _fused_map(self, field_name):
        # size 128, NOT 64: the reference's own Octree::load segfaults on
        # <=64^3 maps (insert() only reserves block_buffer_ when blocks
        # live at depth > 3, octree.hpp:485-491 — an upstream bug), so the
        # parser round-trip test must use a size where blocks sit deeper.
        from supereight_tpu.config import Configuration
        from supereight_tpu.pipeline import DenseSLAMSystem
        from supereight_tpu.io.synthetic import orbit_poses, render_depth
        H, W = 48, 64
        k = np.asarray([48.0 * W / 160, 48.0 * H / 120, W / 2, H / 2],
                       np.float32)
        cfg = Configuration(volume_resolution=(128,) * 3,
                            volume_size=(4.8,) * 3, pyramid=(3, 2, 2),
                            block_capacity=1024, integration_rate=1,
                            field_type=field_name)
        slam = DenseSLAMSystem((H, W), cfg)
        for i, p in enumerate(orbit_poses(3, 4.8, sweep=0.02)):
            d = np.clip(np.asarray(render_depth(
                jnp.asarray(p), jnp.asarray(k), 4.8, H, W)) * 1000,
                0, 65535).astype(np.uint16)
            slam.step(jnp.asarray(d), k, i, gt_pose=p)
        import jax
        return jax.device_get(slam.state.map), slam.field

    @pytest.mark.parametrize("field_name", ["sdf", "ofusion"])
    def test_se_roundtrip(self, tmp_path, field_name):
        m, field = self._fused_map(field_name)
        path = str(tmp_path / "map.bin")
        serialise.save_se(path, m)
        m2 = serialise.load_se(path, field.channels, capacity=m.capacity)
        assert m2.size == m.size and abs(m2.dim - m.dim) < 1e-6
        assert int(m2.n_blocks) == int(m.n_blocks)
        # per-voxel equality through the slot permutation: compare via
        # the dense block_index mapping
        live = np.asarray(octree.slot_mask(m))
        bc = np.asarray(octree.block_coords_table(m))[live]
        bi2 = np.asarray(m2.block_index)
        slot2 = bi2[bc[:, 0], bc[:, 1], bc[:, 2]]
        assert (slot2 >= 0).all()
        for c in field.channels:
            a = np.asarray(m.voxels[c.name])[live]
            b = np.asarray(m2.voxels[c.name])[slot2]
            # OFusion timestamp goes through the reference's f64 slot
            np.testing.assert_allclose(a, b, atol=1e-6)
        # node pyramid values survive where marked
        for lv in range(1, m.block_level + 1):
            al = np.asarray(m.node_alloc[lv])
            for c in field.channels:
                a = np.asarray(m.node_values[lv][c.name])[al]
                b = np.asarray(m2.node_values[lv][c.name])[
                    np.asarray(m2.node_alloc[lv]) & al] \
                    if al.any() else a
            # marked cells whose value differs from init must survive
            va = np.asarray(m.node_values[lv][field.select_channel])
            meaningful = al & (va != field.channels[0].init)
            if meaningful.any():
                vb = np.asarray(m2.node_values[lv][field.select_channel])
                np.testing.assert_allclose(va[meaningful], vb[meaningful],
                                           atol=1e-6)

    @pytest.mark.parametrize("field_name", ["sdf", "ofusion"])
    def test_reference_parser_roundtrip(self, tmp_path, field_name):
        """Our save_se through the REFERENCE's own Octree::load/save
        (csrc/se_bin_oracle): block records must survive byte-exactly.
        Skips when the oracle binary is not built."""
        import os
        import subprocess
        tool = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "csrc",
            f"se_bin_oracle_{field_name}")
        if not os.path.exists(tool):
            pytest.skip("csrc se_bin_oracle not built")
        m, field = self._fused_map(field_name)
        ours = str(tmp_path / "ours.bin")
        resaved = str(tmp_path / "resaved.bin")
        serialise.save_se(ours, m)
        out = subprocess.run([tool, ours, resaved], capture_output=True,
                             text=True, timeout=300, check=True)
        import json
        stats = json.loads(out.stdout.strip().splitlines()[-1])
        assert stats["blocks"] == int(m.n_blocks)
        live = np.asarray(octree.slot_mask(m))
        x = np.asarray(m.voxels[field.channels[0].name])[live]
        # the reference's own load only restores voxel[0] of each block
        # (memcpy sizeof(value_type), octree.hpp:946) — so compare its
        # checksum of the FIRST voxel per block plus 511 init values
        init = field.channels[0].init
        expect = float(x[:, 0].sum() + 511 * init * live.sum())
        assert abs(stats["sum_x"] - expect) < 1e-3 * max(1, abs(expect))


class TestVtk:
    def test_mesh_files_written(self, tmp_path):
        tris = np.zeros((2, 3, 3), np.float32)
        tris[0] = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        tris[1] = [[1, 1, 1], [2, 1, 1], [1, 2, 1]]
        pv = str(tmp_path / "m.vtk")
        pp = str(tmp_path / "m.ply")
        vtk.write_vtk_mesh(pv, tris)
        vtk.write_ply_mesh(pp, tris)
        assert "POLYGONS 2" in open(pv).read()
        assert "element face 2" in open(pp).read()

    def test_slice_export(self, tmp_path):
        chans = (ChannelSpec(name="v", dtype=jnp.float32, init=0.0,
                             empty=-1.0),)
        m = octree.init(32, 2.0, chans, capacity=64)
        p = str(tmp_path / "s.vtk")
        vtk.save_3d_slice(p, m, "v", (0, 0, 0), (4, 4, 2))
        content = open(p).read()
        assert "DIMENSIONS 4 4 2" in content


class TestSynthetic:
    def test_dataset_files(self, tmp_path):
        prefix = str(tmp_path / "seq")
        rawp, gtp, k = synthetic.write_dataset(prefix, 3, H=24, W=32)
        r = raw.RawReader(rawp)
        assert len(r) == 3
        poses = groundtruth.read_poses(gtp)
        assert len(poses) == 3
        d, _ = r.read(0)
        assert d.max() > 500   # something visible in mm


def test_partitioned_map_roundtrip(tmp_path):
    """Owner-partitioned maps serialise with their per-partition counters
    and restore bit-identically."""
    from supereight_tpu.core import octree
    from supereight_tpu.core.octree import ChannelSpec
    from supereight_tpu.io import serialise
    m = octree.init(64, 4.8, (ChannelSpec("v", jnp.float32, 0.0, 0.0),),
                    capacity=64, partitions=4)
    wanted = jnp.zeros((8, 8, 8), bool).at[1, 2, 3].set(True) \
        .at[7, 0, 0].set(True)
    m = octree.allocate_block_mask(m, wanted)
    path = str(tmp_path / "map.npz")
    serialise.save_map(path, m)
    m2 = serialise.load_map(path)
    assert m2.partitions == 4
    np.testing.assert_array_equal(np.asarray(m.part_counts),
                                  np.asarray(m2.part_counts))
    np.testing.assert_array_equal(np.asarray(m.block_index),
                                  np.asarray(m2.block_index))


class TestBlockList:
    def test_save_block_list(self, tmp_path):
        """saveBlockList parity (`vtk-io.h:211`): allocated block coords
        as text rows."""
        from supereight_tpu.io import vtk as vtkio
        chans = (ChannelSpec(name="v", dtype=jnp.float32, init=0.0,
                             empty=-1.0),)
        m = octree.init(32, 2.0, chans, capacity=128)
        m = octree.allocate_blocks(
            m, jnp.asarray([[0, 0, 0], [2, 3, 1], [1, 1, 1]]),
            jnp.ones((3,), bool))
        p = tmp_path / "blocks.txt"
        vtkio.save_block_list(str(p), m)
        rows = [tuple(map(int, ln.split()))
                for ln in p.read_text().splitlines()]
        assert len(rows) == int(m.n_blocks)
        coords = np.asarray(octree.block_coords_table(m))[:len(rows)]
        assert sorted(rows) == sorted(map(tuple, coords.tolist()))


class TestCreateReader:
    def test_factory_prefers_native_for_raw(self, tmp_path):
        """create_reader parity (`reader.cpp:22`): .raw goes to the
        prefetching native reader when csrc is built (numpy fallback
        otherwise) and both expose the same read() interface."""
        import supereight_tpu.io as seio
        from supereight_tpu.io import native, raw, synthetic
        base = str(tmp_path / "seq")
        synthetic.write_dataset(base, 3, H=48, W=64)
        r = seio.create_reader(base + ".raw")
        if native.available():
            assert isinstance(r, native.NativeRawReader)
        else:
            assert isinstance(r, raw.RawReader)
        assert len(r) == 3
        mm, rgb = r.read(1)
        assert mm.shape == (48, 64) and mm.dtype == np.uint16
        ref = raw.RawReader(base + ".raw").read(1)[0]
        np.testing.assert_array_equal(mm, ref)


def test_live_replay_reader(tmp_path):
    """The OpenNI live-stream contract, replayed from a .raw file: paced
    frames, drop accounting, no random access (interface.h:532+)."""
    import numpy as np
    from supereight_tpu.io import raw as raw_io
    from supereight_tpu.io.live import LiveReplayReader

    p = str(tmp_path / "seq.raw")
    w = raw_io.RawWriter(p, 8, 6)
    for i in range(10):
        w.write(np.full((6, 8), i + 1, np.uint16))
    w.close()

    # deterministic fake clock: consumer takes 2 frame periods per read
    t = {"now": 100.0}
    reader = LiveReplayReader(p, fps=30.0, clock=lambda: t["now"])
    d0, _ = reader.read_next()                 # t=0 -> frame 0
    assert d0[0, 0] == 1
    t["now"] += 2.5 / 30.0                     # sensor produced 1, 2
    d1, _ = reader.read_next()                 # -> frame 2 (frame 1 dropped)
    assert d1[0, 0] == 3
    assert reader.dropped == 1
    # a fast consumer never re-reads an old frame
    d2, _ = reader.read_next()
    assert d2[0, 0] == 4
    # stream end -> None (camera stops)
    t["now"] += 100.0
    assert reader.read_next() is None
    assert reader.width == 8 and reader.height == 6
