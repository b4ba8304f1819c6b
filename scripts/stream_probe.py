"""Split-stream gather probe at the REAL fine-scan shapes.

pallas_gather_probe.py measured 1x1M=14.9 vs 8x128k=8.3 ns/elem — but the
8 streams gathered from 8 SEPARATE 4MB tables, so the win could be (a)
independent-op overlap, (b) per-op index-count effects, or (c) the 1-4MB
table-size sweet spot seen in gather_scan_probe.json.  This probe
disambiguates AT THE SHIPPING SHAPES (the raycast's [32768, 512] bf16
tiled view, 33 MB; 14 x 19200 sample indices = the -z1 ss1.0 fine scan):

  shared_K:  K gather ops, disjoint index chunks, SAME table operand.
             Wins here => op splitting alone helps; wire a knob into
             _sample_volume.
  stacked_K: K gather ops, chunk j indexed into copy j of a [K, 32768,
             512] stacked materialized table.  Wins here but not
             shared_K => the engine needs distinct operands/buffers;
             costs a 33K MB/frame broadcast, still maybe net-positive.
  width_w:   control — does the fast zone reappear at other index
             widths from the same 33 MB table.
"""

from __future__ import annotations

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
    rng = np.random.default_rng(11)
    R = 64
    ROWS, WIDE = 32768, 512          # the 256^3 tiled view
    N_TOT = ROWS * WIDE
    K_S, NRAY = 14, 19200            # -z1 ss1.0 fine-scan shape
    M = K_S * NRAY

    table = jnp.asarray(rng.standard_normal((ROWS, WIDE)), jnp.bfloat16)
    flat = table.reshape(-1)

    def scan_time(name, make_step, n_elems):
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
        np.asarray(run(idx0))
        t0 = time.perf_counter()
        np.asarray(run(idx0 + 1))
        dt = (time.perf_counter() - t0) / R
        ns = dt / n_elems * 1e9
        results[name] = {"ms": round(dt * 1e3, 4),
                         "ns_per_elem": round(ns, 3)}
        print(f"# {name:28s} {dt*1e3:8.3f} ms  {ns:7.2f} ns/elem",
              file=sys.stderr)

    def indices(key, n, idx):
        base = jax.random.bits(jax.random.PRNGKey(key), (n,), jnp.uint32)
        return ((base ^ idx[0]) % jnp.uint32(N_TOT)).astype(jnp.int32)

    # ---- shared-table split ----
    for K in (1, 2, 4, 8):
        n_k = M // K

        def mk(idx, K=K, n_k=n_k):
            tot = jnp.float32(0)
            for j in range(K):
                ii = indices(j, n_k, idx)
                tot = tot + jnp.sum(flat[ii]).astype(jnp.float32)
            return idx + 1, tot
        scan_time(f"shared_{K}x{n_k//1000}k", mk, K * n_k)

    # ---- stacked-copies split ----
    for K in (2, 4, 8):
        n_k = M // K
        stacked = jnp.broadcast_to(flat, (K, N_TOT)) + 0  # materialize

        def mk(idx, K=K, n_k=n_k, stacked=stacked):
            tot = jnp.float32(0)
            for j in range(K):
                ii = indices(16 + j, n_k, idx)
                tot = tot + jnp.sum(stacked[j][ii]).astype(jnp.float32)
            return idx + 1, tot
        scan_time(f"stacked_{K}x{n_k//1000}k", mk, K * n_k)

    # ---- index-count sweep on the shared 33MB table ----
    for n in (1 << 16, 1 << 18, 1 << 20):
        def mk(idx, n=n):
            ii = indices(31, n, idx)
            return idx + 1, jnp.sum(flat[ii]).astype(jnp.float32)
        scan_time(f"count_{n >> 10}k", mk, n)

    # ---- f32 vs bf16 view at the scan shape ----
    flat32 = jnp.asarray(np.asarray(flat, np.float32))

    def mk32(idx):
        ii = indices(37, M, idx)
        return idx + 1, jnp.sum(flat32[ii])
    scan_time("f32_view_268k", mk32, M)

    print(json.dumps(results))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_data/stream_probe.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
