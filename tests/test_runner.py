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
