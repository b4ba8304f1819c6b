"""Tool + infra coverage: perfstats, power, converters, viewer plots.

Reference counterparts: `se_shared/perfstats.h`, `se_apps/PowerMonitor`,
`se_tools/scene2raw.cpp` / `oni2raw.cpp`, the GUI's plot panels.
"""

import os

import numpy as np
import jax.numpy as jnp


def test_perfstats_samples_and_summary():
    from supereight_tpu.utils.perfstats import PerfStats
    st = PerfStats()
    for v in (0.01, 0.02, 0.03):
        st.sample("tracking", v)
    s = st.summary()
    assert "tracking" in s
    assert abs(st.mean("tracking") - 0.02) < 1e-9
    assert st.min("tracking") == 0.01 and st.max("tracking") == 0.03
    with st.timer("block"):
        pass
    assert len(st.results["block"]["data"]) == 1
    # table dump has header + one row per sample
    table = st.print_all_data()
    assert table.splitlines()[0].startswith("tracking")
    assert len(table.splitlines()) == 4


def test_power_monitor_degrades_gracefully():
    from supereight_tpu.utils.power import PowerMonitor
    pm = PowerMonitor()
    # no hwmon/RAPL in this container: must no-op, not raise
    sample = pm.sample()
    assert sample is None or isinstance(sample, dict)


def test_scene2raw_roundtrip(tmp_path):
    """ICL text depth -> .raw; euclidean ray lengths become planar z mm."""
    from supereight_tpu.tools import scene2raw
    from supereight_tpu.io import raw
    d = tmp_path / "scene"
    d.mkdir()
    W, Hh = scene2raw.SCENE_W, scene2raw.SCENE_H
    eu = np.full((Hh, W), 2.0, np.float32)
    np.savetxt(d / "scene_00_0000.depth", eu.reshape(1, -1), fmt="%.4f")
    out = str(tmp_path / "o.raw")
    n = scene2raw.convert(str(d), out)
    assert n == 1
    r = raw.RawReader(out)
    depth, _ = r.read(0)
    # center pixel: euclidean == planar depth (ray through the axis)
    assert abs(int(depth[Hh // 2, W // 2]) - 2000) <= 2
    # corner pixel: planar z < euclidean length
    assert int(depth[0, 0]) < 2000


def test_oni2raw_pgm_packer(tmp_path):
    from supereight_tpu.tools import oni2raw
    from supereight_tpu.io import raw
    d = tmp_path / "frames"
    d.mkdir()
    img = np.arange(40 * 30, dtype=np.uint16).reshape(30, 40) % 5000
    for i in range(2):
        with open(d / f"f{i:04d}.pgm", "wb") as f:
            f.write(b"P5\n40 30\n65535\n")
            f.write(img.byteswap().tobytes())
    out = str(tmp_path / "o.raw")
    n = oni2raw.frames_to_raw(str(d), out)
    assert n == 2
    r = raw.RawReader(out)
    depth, _ = r.read(1)
    assert depth.shape == (30, 40)
    np.testing.assert_array_equal(depth, img)


def test_viewer_plots(tmp_path):
    from supereight_tpu.apps.viewer import save_triptych, plot_trajectory
    img = np.zeros((24, 32, 4), np.uint8)
    save_triptych(str(tmp_path / "t.png"), img, img, img)
    poses = [np.eye(4, dtype=np.float32) for _ in range(5)]
    for i, p in enumerate(poses):
        p[0, 3] = 0.1 * i
    plot_trajectory(str(tmp_path / "traj.png"), poses, poses)
    assert os.path.getsize(tmp_path / "t.png") > 0
    assert os.path.getsize(tmp_path / "traj.png") > 0


def test_viewer_html_scrubber(tmp_path):
    """The decided GUI story (VERDICT r2 item 7): an offline HTML
    scrubber over the triptych PNGs replaces the reference's live Qt
    window in this display-less environment."""
    from supereight_tpu.apps.viewer import write_scrubber
    frames = [str(tmp_path / f"frame_{i:05d}.png") for i in range(3)]
    path = write_scrubber(str(tmp_path), frames)
    html = open(path).read()
    assert "frame_00002.png" in html
    assert "trajectory.png" in html
    assert "setInterval" in html          # play/pause scrubbing


def test_status_claims_match_captures():
    """VERDICT r3 item 8: STATUS.md headline numbers must quote the
    newest bench_data/driver captures verbatim — the STATUS-CLAIMS block
    pins each number to its source JSON."""
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "scripts"))
    from records_table import check_status_claims
    assert check_status_claims(root) == 0


def test_noise_regime_policy():
    """-F (bilateral) auto-selects the noise-validated occupancy stack
    unless the user pinned the knobs (VERDICT r3 item 3)."""
    from supereight_tpu.config import Configuration, apply_noise_regime

    base = Configuration(bilateral_filter=True)
    out = apply_noise_regime(base)
    assert out.field_type == "ofusion"
    assert out.integration_rate == 4
    assert not out.raycast_near_rescue

    # explicit field choice disables the whole policy
    pinned = apply_noise_regime(base, pinned=("field_type",))
    assert pinned.field_type == "sdf"
    assert pinned.integration_rate == base.integration_rate

    # partial pinning keeps the user's value for that knob only
    part = apply_noise_regime(
        Configuration(bilateral_filter=True, integration_rate=1),
        pinned=("integration_rate",))
    assert part.field_type == "ofusion" and part.integration_rate == 1

    # clean data (no bilateral) never switches
    clean = apply_noise_regime(Configuration(bilateral_filter=False))
    assert clean.field_type == "sdf"


def test_config_presets():
    """Named validated stacks (VERDICT r4 item 7): every preset yields a
    constructible Configuration; pinning keeps user knobs; unknown names
    fail loudly."""
    import dataclasses
    from supereight_tpu.config import (Configuration, PRESETS,
                                       apply_preset)

    fields = {f.name for f in dataclasses.fields(Configuration)}
    for name, upd in PRESETS.items():
        assert set(upd) <= fields, f"{name}: unknown fields {set(upd)-fields}"
        cfg = apply_preset(name)
        assert isinstance(cfg, Configuration)

    hl = apply_preset("headline")
    assert hl.field_type == "sdf" and hl.raycast_adaptive_deg == 3.8
    assert hl.integrate_budget == 3072 and hl.alloc_rate == 3

    d512 = apply_preset("demo512-sdf")
    assert d512.volume_resolution == (512, 512, 512)
    assert d512.raycast_full_res_scan and d512.integrate_budget == 24576

    # pinning: user-set field survives the preset
    pinned = apply_preset("ofusion",
                          Configuration(integration_rate=1),
                          pinned=("integration_rate",))
    assert pinned.field_type == "ofusion" and pinned.integration_rate == 1

    try:
        apply_preset("nope")
        assert False, "unknown preset must raise"
    except ValueError:
        pass


def test_benchmark_preset_flag(tmp_path):
    """--preset resolves through the benchmark frontend with explicit
    flags overriding preset fields."""
    from supereight_tpu.apps import benchmark as bm
    args = bm.parse_args(["-i", "x.raw", "--preset", "headline",
                          "--int-budget", "1024"])
    assert args.preset == "headline" and args.int_budget == 1024
