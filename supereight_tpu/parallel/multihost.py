"""Multi-HOST execution of the unified sharded frame (``jax.distributed``).

The reference is a single-process OpenMP program (SURVEY.md §2.4); its
multi-machine story does not exist.  This is the DCN regime of the
distributed design (docs/DISTRIBUTED.md "Across hosts"): one controller
process per host, each owning its local devices, all meshed into ONE
global ``Mesh``; every collective of the frame pipeline
(`frame_dist.make_process_frame_sharded`) then rides the cross-process
transport (gloo on CPU, ICI/DCN on real TPU pods).  Frames are read
HOST-LOCALLY — each process decodes its own copy of the stream, nothing
broadcasts raw frames — exactly the per-host input discipline a real
pod run needs.

The module is both launcher and worker:

* ``python -m supereight_tpu.parallel.multihost`` (or :func:`launch`)
  spawns N localhost worker processes (D virtual CPU devices each, via
  ``xla_force_host_platform_device_count``), runs the K-frame synthetic
  orbit through the process-spanning mesh, gathers the end state from
  process 0, reruns the SAME frames in a single process over an equal-
  size mesh, asserts equality, and writes
  ``bench_data/multihost_local.json``.
* ``... --worker I`` (spawned internally) is one controller process.

No real second host exists in this environment; localhost processes
exercise the actual multi-controller code path (global array
construction, cross-process collectives, host-local reads) that a
2-host deployment uses with only the coordinator address changing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

# tiny scale so the 1-core CPU backend compiles fast (test_sharding's)
H, W = 48, 64
N_FRAMES = 4
SIZE, DIM, CAPACITY = 64, 4.8, 1024
K4 = [48.0 * W / 160, 48.0 * H / 120, W / 2.0, H / 2.0]


def _frames():
    """Host-local frame acquisition: every process renders/decodes its
    own copy (deterministic), like per-host dataset shards on a pod."""
    import numpy as np
    import jax.numpy as jnp
    from supereight_tpu.io.synthetic import orbit_poses, render_depth
    k = np.asarray(K4, np.float32)
    poses = orbit_poses(N_FRAMES, DIM, sweep=0.02)
    depths = [np.clip(np.asarray(
        render_depth(jnp.asarray(p), jnp.asarray(k), DIM, H, W)) * 1000,
        0, 65535).astype(np.uint16) for p in poses]
    return depths, poses, k


def _run_mesh(mesh, out_json=None):
    """Run the unified sharded frame over ``mesh`` (which may span
    processes) and return {pose, n_blocks, tracked}."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from supereight_tpu.config import Configuration
    from supereight_tpu.pipeline import DenseSLAMSystem
    from supereight_tpu.parallel import frame_dist
    from supereight_tpu.parallel.sharding import MAP_AXIS

    n_dev = mesh.devices.size
    depths, poses, k = _frames()
    cfg = Configuration(volume_resolution=(SIZE,) * 3,
                        volume_size=(DIM,) * 3, pyramid=(3, 2, 2),
                        block_capacity=CAPACITY, integration_rate=1,
                        map_partitions=n_dev)
    slam = DenseSLAMSystem((H, W), cfg)
    slam.setPose(poses[0])

    repl = NamedSharding(mesh, P())
    shard2 = NamedSharding(mesh, P(MAP_AXIS, None))

    def mk(x, sh):
        # make_array_from_callback builds a GLOBAL array from host-local
        # data on every process — the multi-controller-safe placement
        # (device_put suffices single-process; this form covers both)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    st = jax.tree.map(lambda x: mk(x, repl), slam.state)
    st = st.replace(map=st.map.replace(
        voxels={c: mk(v, shard2) for c, v in slam.state.map.voxels.items()}))

    step = frame_dist.make_process_frame_sharded(
        mesh, slam.field, H, W, iterations=slam.iterations,
        normals="volume", max_visible_per_device=256)
    jstep = jax.jit(lambda s, d, kk, f, g: step(s, d, kk, f, g,
                                                use_gt=False, neg_y=False))
    eye = np.eye(4, dtype=np.float32)
    for i, d in enumerate(depths):
        st = jstep(st, mk(d, repl), mk(k, repl),
                   mk(np.asarray(i, np.int32), repl), mk(eye, repl))

    def fetch(x):
        return np.asarray(x.addressable_shards[0].data)

    out = {
        "pose": fetch(st.pose).tolist(),
        "n_blocks": int(fetch(st.map.n_blocks)),
        "tracked": bool(fetch(st.tracked)),
        "n_devices": int(n_dev),
    }
    if out_json is not None:
        with open(out_json, "w") as fh:
            json.dump(out, fh)
    return out


#: Worker bootstrap: ``jax.distributed.initialize`` MUST run before the
#: first XLA-backend touch, and importing supereight_tpu initializes the
#: backend (module-level jnp constants) — so workers start from ``-c``
#: with the distributed runtime up BEFORE the package import.
_WORKER_BOOT = """
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes={procs}, process_id={pid})
from supereight_tpu.parallel import multihost
multihost.worker_body({pid!r}, {out!r})
"""


def worker_body(process_id: int, out_json):
    """One controller process of the process-spanning mesh (distributed
    runtime already initialized by the bootstrap)."""
    import numpy as np
    import jax
    from jax.sharding import Mesh
    devs = sorted(jax.devices(), key=lambda d: d.id)
    mesh = Mesh(np.array(devs), ("map",))
    _run_mesh(mesh, out_json=out_json if process_id == 0 else None)


def launch(num_processes: int = 2, devices_per_proc: int = 4,
           port: int = 9933, record_path=None, timeout: int = 600):
    """Spawn the workers, run the single-process control, assert
    equality, optionally write the record.  Returns (multi, single)."""
    import tempfile
    out_json = os.path.join(tempfile.mkdtemp(prefix="se_mh_"), "mh.json")
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS",)}
    procs = []
    for i in range(num_processes):
        env = dict(env_base,
                   JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   XLA_FLAGS="--xla_force_host_platform_device_count="
                             f"{devices_per_proc}")
        boot = _WORKER_BOOT.format(port=port, procs=num_processes,
                                   pid=i, out=out_json if i == 0 else None)
        procs.append(subprocess.Popen(
            [sys.executable, "-c", boot],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            logs.append(out.decode(errors="replace"))
    finally:
        # a worker that died early leaves its peer blocked in
        # jax.distributed.initialize holding the coordinator port —
        # never leak workers past launch()
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for i, p in enumerate(procs):
        if p.returncode != 0:
            raise RuntimeError(
                f"worker {i} failed rc={p.returncode}:\n{logs[i][-2000:]}")
    with open(out_json) as fh:
        multi = json.load(fh)

    # single-process control on an equal-size one-process mesh
    import numpy as np
    import jax
    from jax.sharding import Mesh
    n = num_processes * devices_per_proc
    devs = jax.devices()
    if len(devs) < n:
        raise RuntimeError(
            f"launcher process has {len(devs)} devices, need {n} "
            f"(set xla_force_host_platform_device_count={n})")
    mesh = Mesh(np.array(sorted(devs, key=lambda d: d.id)[:n]), ("map",))
    single = _run_mesh(mesh)

    pose_m = np.asarray(multi["pose"])
    pose_s = np.asarray(single["pose"])
    if multi["n_blocks"] != single["n_blocks"]:
        raise AssertionError(
            f"n_blocks {multi['n_blocks']} != {single['n_blocks']}")
    if not np.allclose(pose_m, pose_s, atol=1e-4):
        raise AssertionError(f"pose mismatch:\n{pose_m}\nvs\n{pose_s}")
    if record_path is not None:
        rec = {
            "processes": num_processes,
            "devices_per_process": devices_per_proc,
            "frames": N_FRAMES,
            "transport": "gloo (localhost multi-controller; the code "
                         "path a 2-host pod run uses — only the "
                         "coordinator address changes)",
            "n_blocks": multi["n_blocks"],
            "tracked": multi["tracked"],
            "tracked_note": "false is expected at this 64^3 toy scale: "
                            "TSDF quantization exceeds the 2 cm "
                            "divergence gate (tests/test_pipeline.py "
                            "make_slam note); the assertion is 1-vs-2-"
                            "process EQUALITY of pose and map",
            "pose_match_vs_single_process": True,
            "pose_max_abs_diff": float(np.abs(pose_m - pose_s).max()),
        }
        with open(record_path, "w") as fh:
            json.dump(rec, fh, indent=1)
    return multi, single


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--devices", type=int, default=4)
    ap.add_argument("--port", type=int, default=9933)
    ap.add_argument("--record", default="")
    args = ap.parse_args(argv)
    multi, single = launch(args.procs, args.devices, port=args.port,
                           record_path=args.record or None)
    print(json.dumps({"multi": multi, "single": single}))


if __name__ == "__main__":
    main()
