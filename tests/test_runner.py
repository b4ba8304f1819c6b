"""Evaluation-harness smoke test (run_kf.py parity path)."""

from supereight_tpu.apps import runner


def test_synthetic_run(tmp_path):
    res = runner.run("synthetic-room", field="sdf", resolution=64,
                     frames=8, out=str(tmp_path))
    assert res["frames"] == 8
    assert res["ate_rmse_m"] < 0.5       # gt-free ICP on a tiny map
    assert (tmp_path / "results.json").exists()
    assert (tmp_path / "benchmark.log").exists()
    assert res["fps"] > 0


def test_noise_dataset_run(tmp_path):
    """Sensor-noise ATE is a tracked registry entry (TUM noise model +
    bilateral filter path)."""
    res = runner.run("synthetic-room-noise", field="sdf", resolution=64,
                     frames=8, out=str(tmp_path))
    assert res["frames"] == 8
    assert res["ate_rmse_m"] < 0.8


def test_tum_directory_ingestion(tmp_path, monkeypatch):
    """A locally provided TUM rgbd directory converts and runs end-to-end
    through the registry (tools/tum2raw + timestamp association)."""
    import numpy as np
    from PIL import Image
    from supereight_tpu.io import synthetic, groundtruth

    # fabricate a tiny TUM sequence from the synthetic renderer
    root = tmp_path / "datasets"
    seq = root / "rgbd_dataset_freiburg1_desk"
    (seq / "depth").mkdir(parents=True)
    depths, poses, k = synthetic.generate_sequence(6, H=60, W=80,
                                                   room_dim=4.8)
    with open(seq / "depth.txt", "w") as f:
        f.write("# depth maps\n")
        for i, d in enumerate(depths):
            ts = 1000.0 + 0.033 * i
            png = (d.astype(np.float32) * 5.0).astype(np.uint16)  # mm->TUM
            Image.fromarray(png, mode="I;16").save(
                seq / "depth" / f"{ts:.6f}.png")
            f.write(f"{ts:.6f} depth/{ts:.6f}.png\n")
    # groundtruth at slightly offset timestamps (association must pair them)
    ts = [1000.004 + 0.033 * i for i in range(len(poses))]
    groundtruth.write_poses(str(seq / "groundtruth.txt"), poses,
                            timestamps=ts)

    monkeypatch.setenv("SE_DATASETS", str(root))
    res = runner.run("tum-fr1-desk", field="sdf", resolution=64,
                     frames=6, out=str(tmp_path / "out"),
                     extra_args=("-k", "30,30,40,30"))
    assert res["frames"] == 6
    assert (root / "rgbd_dataset_freiburg1_desk.raw").exists()
    assert res["ate_rmse_m"] < 1.0
