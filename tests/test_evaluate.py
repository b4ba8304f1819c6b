"""ATE/RPE evaluation harness tests (reference: TUM scripts semantics)."""

import numpy as np

from supereight_tpu.apps import evaluate


def rotz(a):
    c, s = np.cos(a), np.sin(a)
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    return T


def make_traj(n=20):
    rng = np.random.default_rng(0)
    poses = []
    for i in range(n):
        T = rotz(0.1 * i)
        T[:3, 3] = [np.cos(0.1 * i), np.sin(0.1 * i), 0.05 * i]
        poses.append(T)
    return poses


class TestATE:
    def test_identical_trajectories_zero(self):
        tr = make_traj()
        res = evaluate.ate(tr, tr)
        assert res["rmse"] < 1e-9

    def test_rigidly_displaced_trajectories_zero(self):
        tr = make_traj()
        off = rotz(0.7)
        off[:3, 3] = [5, -2, 1]
        moved = [off @ T for T in tr]
        res = evaluate.ate(moved, tr)
        assert res["rmse"] < 1e-9   # Horn alignment removes rigid offset

    def test_noise_measured(self):
        rng = np.random.default_rng(3)
        tr = make_traj()
        noisy = []
        for T in tr:
            T2 = T.copy()
            T2[:3, 3] += rng.normal(scale=0.05, size=3)
            noisy.append(T2)
        res = evaluate.ate(noisy, tr)
        assert 0.01 < res["rmse"] < 0.2

    def test_scale_search(self):
        tr = make_traj()
        scaled = [T.copy() for T in tr]
        for T in scaled:
            T[:3, 3] *= 2.0
        res = evaluate.ate(scaled, tr, with_scale=True)
        assert res["rmse"] < 1e-6


class TestScaleSearch:
    def test_golden_section_quadratic(self):
        x, fx = evaluate.golden_section_search(
            0.0, 4.0, 1e-4, lambda s: (s - 1.7) ** 2 + 3.0)
        assert abs(x - 1.7) < 1e-3 and abs(fx - 3.0) < 1e-6

    def test_recovers_trajectory_scale(self):
        tr = make_traj()
        shrunk = [np.asarray(T).copy() for T in tr]
        for T in shrunk:
            T[:3, 3] *= 0.5
        res = evaluate.ate_scale_search(shrunk, tr)
        assert abs(res["scale"] - 2.0) < 0.02
        assert res["rmse"] < 1e-2
        # agrees with the closed-form Horn scale
        closed = evaluate.ate(shrunk, tr, with_scale=True)
        assert abs(res["rmse"] - closed["rmse"]) < 1e-2

    def test_metric_trajectory_scale_near_one(self):
        tr = make_traj()
        rng = np.random.default_rng(0)
        noisy = [np.asarray(T).copy() for T in tr]
        for T in noisy:
            T[:3, 3] += rng.normal(scale=1e-3, size=3)
        res = evaluate.ate_scale_search(noisy, tr)
        assert abs(res["scale"] - 1.0) < 0.02


class TestRPE:
    def test_identical_zero(self):
        tr = make_traj()
        res = evaluate.rpe(tr, tr)
        assert res["trans_rmse"] < 1e-9
        assert res["rot_rmse_deg"] < 1e-6

    def test_drift_detected(self):
        tr = make_traj()
        drifted = []
        acc = np.eye(4)
        for T in tr:
            acc = acc @ rotz(0.01)
            drifted.append(acc @ T)
        res = evaluate.rpe(drifted, tr)
        assert res["rot_rmse_deg"] > 0.1


class TestAssociate:
    def test_nearest_matching(self):
        a = [0.0, 1.0, 2.0, 3.0]
        b = [0.009, 1.5, 2.002, 2.995]
        pairs = evaluate.associate(a, b, max_difference=0.02)
        assert (0, 0) in pairs and (2, 2) in pairs and (3, 3) in pairs
        assert all(j != 1 for _, j in pairs)
