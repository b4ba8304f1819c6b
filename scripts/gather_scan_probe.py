"""On-chip gather/scatter throughput vs table size, measured INSIDE a scan.

Every prior microbenchmark was poisoned by per-dispatch output round-trips
through the axon tunnel; this one runs R repetitions inside one lax.scan
and returns a single scalar, so the wall clock measures on-chip work only.

Each scan step varies the index array (carry-dependent) to defeat any
computation caching.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import signal
    signal.alarm(3300)
    import jax
    import jax.numpy as jnp

    results = {}
    rng = np.random.default_rng(0)
    R = 64            # scan length (amortizes dispatch)

    def scan_time(name, make_step, n_elems):
        """make_step(carry_idx) -> (new_idx, scalar). Times R steps."""
        def step(carry, _):
            idx, acc = carry
            idx2, val = make_step(idx)
            return (idx2, acc + val), ()

        @jax.jit
        def run(idx0):
            (_, acc), _ = jax.lax.scan(step, (idx0, jnp.float32(0)),
                                       None, length=R)
            return acc

        idx0 = jnp.asarray(rng.integers(0, 1 << 20, (32,)), jnp.uint32)
        acc = run(idx0)
        np.asarray(acc)
        t0 = time.perf_counter()
        acc = run(idx0 + 1)
        np.asarray(acc)
        dt = (time.perf_counter() - t0) / R
        ns_per = dt / n_elems * 1e9
        results[name] = round(ns_per, 3)
        print(f"# {name:36s} {dt*1e3:8.3f} ms/step  {ns_per:7.2f} ns/elem",
              file=sys.stderr)

    # ---- gather from tables of varying size ----
    N_IDX = 1 << 20   # 1M gathered elements per step
    for size_mb, shape in [(0.25, (256, 256)), (1, (512, 512)),
                           (4, (1024, 1024)), (16, (2048, 2048)),
                           (33, (2048, 4096)), (67, (4096, 4096))]:
        table = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        n = shape[0] * shape[1]
        flat = table.reshape(-1)

        def mk(idx, flat=flat, n=n):
            # cheap per-step index perturbation (carry-dependent)
            base = jax.random.bits(jax.random.PRNGKey(0), (N_IDX,),
                                   jnp.uint32)
            ii = ((base ^ idx[0]) % n).astype(jnp.int32)
            vals = flat[ii]
            return idx + 1, jnp.sum(vals)
        scan_time(f"gather_{size_mb}MB_1M", mk, N_IDX)

    # coherent gather (sequential rows) from the 33MB table
    table = jnp.asarray(rng.standard_normal((2048, 4096)), jnp.float32)
    flat33 = table.reshape(-1)

    def mk_coh(idx):
        start = (idx[0] % jnp.uint32(1 << 20)).astype(jnp.int32)
        ii = start + jnp.arange(N_IDX, dtype=jnp.int32)
        return idx + 1, jnp.sum(flat33[ii])
    scan_time("gather_33MB_1M_coherent", mk_coh, N_IDX)

    # bf16 vs f32 at 33MB(f32-equiv) scale
    table16 = jnp.asarray(rng.standard_normal((2048, 4096)), jnp.bfloat16)
    flat16 = table16.reshape(-1)

    def mk16(idx):
        base = jax.random.bits(jax.random.PRNGKey(1), (N_IDX,), jnp.uint32)
        ii = ((base ^ idx[0]) % jnp.uint32(2048 * 4096)).astype(jnp.int32)
        return idx + 1, jnp.sum(flat16[ii]).astype(jnp.float32)
    scan_time("gather_16MBbf16_1M", mk16, N_IDX)

    # ---- scatter into targets of varying size ----
    N_SC = 1 << 18    # 256k scattered elements per step
    for size_kb, n in [(32, 32 * 32 * 32), (300, 76800), (2048, 1 << 19),
                       (33000, 2048 * 4096)]:
        def mk_sc(idx, n=n):
            base = jax.random.bits(jax.random.PRNGKey(2), (N_SC,),
                                   jnp.uint32)
            ii = ((base ^ idx[0]) % jnp.uint32(n)).astype(jnp.int32)
            tgt = jnp.zeros((n,), jnp.float32).at[ii].add(1.0, mode="drop")
            return idx + 1, tgt[0]
        scan_time(f"scatter_{size_kb}KB_256k", mk_sc, N_SC)

    # ---- the actual raycast sampling pattern: 25 samples/ray from 33MB ----
    vol = jnp.asarray(rng.standard_normal((256, 256, 256)), jnp.bfloat16)

    def mk_ray(idx):
        base = jax.random.bits(jax.random.PRNGKey(3), (25, 240, 320),
                               jnp.uint32)
        ii = (base ^ idx[0]) % jnp.uint32(256 ** 3)
        v = vol.reshape(-1)[ii.astype(jnp.int32)]
        return idx + 1, jnp.sum(v).astype(jnp.float32)
    scan_time("raycast_pattern_25xHW_33MB", mk_ray, 25 * 240 * 320)

    # frustum-coherent variant: indices cluster within a 2-block band
    def mk_band(idx):
        base = jax.random.bits(jax.random.PRNGKey(4), (240, 320), jnp.uint32)
        center = (base ^ idx[0]) % jnp.uint32(256 ** 3 - 8192)
        offs = jnp.arange(25, dtype=jnp.int32)[:, None, None] * 300
        ii = center[None].astype(jnp.int32) + offs
        v = vol.reshape(-1)[ii]
        return idx + 1, jnp.sum(v).astype(jnp.float32)
    scan_time("raycast_band_25xHW_33MB", mk_band, 25 * 240 * 320)

    print(json.dumps(results))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_data/gather_scan_probe.json"),
              "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
