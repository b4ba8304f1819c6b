"""Round-3 descriptor-wall probes: (a) do independent gathers OVERLAP,
(b) can a Pallas kernel serve VMEM-resident brick rows faster than the
XLA gather engine's ~8-14 ns/descriptor.

Methodology: every measurement is wall clock over R repetitions inside
one lax.scan with a single scalar fetch (the only trustworthy timing on
this tunnel, see .claude/skills/verify/SKILL.md).  Carry-dependent index
perturbation defeats caching.

What each probe decides (STATUS gap 1 / VERDICT r2 item 2b):

* stream_K: one 1M-element gather vs K independent 1M/K gathers from
  SEPARATE tables, all consumed by one sum.  If the engine overlaps
  independent descriptor streams, K=2/4 shows <1x time and the raycast
  stages should be split into parallel streams.  If times are equal,
  the ~100 M desc/s issue rate is a chip-wide serial resource and the
  descriptor budget IS the frame's roofline.
* pallas_shuffle: pure per-lane dynamic_gather (take_along_axis axis=1
  on [S,128] tiles) element rate — the only HW per-lane gather.  This
  bounds any Pallas select stage.
* pallas_vmem_rows: random 8-aligned [8,512] slab loads from a
  VMEM-resident bf16 [6144,512] brick table, accumulated on the VPU.
  This bounds a VMEM-resident raycast kernel's row-fetch rate; compare
  against the XLA row-gather's 13.5-20 ns/row.  The fine scan needs
  ~6 rows per half-res ray (~115k rows/frame): the kernel path wins
  only if rows cost well under ~10 ns here.
* pallas_scan_mini: end-to-end miniature of a VMEM-resident fine scan:
  per [8,128] ray tile, fetch K=8 slabs by per-tile row id (scalar
  prefetch) and resolve per-sample values with roll + lane shuffles.
  Direct apples-to-apples against fine_direct at identical shapes.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    results = {}
    rng = np.random.default_rng(7)
    R = 64

    def scan_time(name, make_step, n_elems, extra=None):
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
        if extra:
            results[name].update(extra)
        print(f"# {name:32s} {dt*1e3:8.3f} ms  {ns:7.2f} ns/elem",
              file=sys.stderr)

    # ---------------- (a) stream overlap ----------------
    N = 1 << 20
    tables = [jnp.asarray(rng.standard_normal((1 << 20,)), jnp.float32)
              for _ in range(8)]

    for K in (1, 2, 4, 8):
        n_k = N // K

        def mk(idx, K=K, n_k=n_k):
            tot = jnp.float32(0)
            for j in range(K):
                base = jax.random.bits(jax.random.PRNGKey(j), (n_k,),
                                       jnp.uint32)
                ii = ((base ^ idx[0]) % jnp.uint32(1 << 20)).astype(jnp.int32)
                tot = tot + jnp.sum(tables[j][ii])
            return idx + 1, tot
        scan_time(f"stream_{K}x{n_k//1024}k", mk, N)

    # ---------------- (b) pallas lane-shuffle rate ----------------
    S = 256           # sublane rows per tile
    KREP = 64         # in-kernel repetitions

    def shuffle_kernel(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((S, 128), jnp.float32)
        src = src_ref[:]
        base = idx_ref[:]

        def body(i, acc):
            lane = (base + i) & 127
            acc = acc + jnp.take_along_axis(src, lane, axis=1)
            return acc
        acc = jax.lax.fori_loop(0, KREP, body, acc)
        out_ref[:] = acc

    @jax.jit
    def run_shuffle(src, idx):
        return pl.pallas_call(
            shuffle_kernel,
            out_shape=jax.ShapeDtypeStruct((S, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(src, idx)

    src = jnp.asarray(rng.standard_normal((S, 128)), jnp.float32)
    idxt = jnp.asarray(rng.integers(0, 128, (S, 128)), jnp.int32)

    def mk_shuf(idx):
        out = run_shuffle(src, idxt + idx[0].astype(jnp.int32))
        return idx + 1, jnp.sum(out)
    try:
        scan_time("pallas_shuffle_256x128x64", mk_shuf, S * 128 * KREP)
    except Exception as e:  # record lowering failures as data
        results["pallas_shuffle_256x128x64"] = {"error": str(e)[:300]}
        print(f"# pallas_shuffle FAILED: {e}", file=sys.stderr)

    # ---------------- (c) pallas VMEM-resident row slabs ----------------
    # 4-way unrolled independent accumulators so the measurement exposes
    # the slab-load ISSUE rate, not one dependency chain's latency
    CAP, WIDE = 6144, 512
    table16 = jnp.asarray(rng.standard_normal((CAP, WIDE)), jnp.bfloat16)
    N_ROWS = 2048     # slab fetches per call (SMEM row ids: 8 KB)

    def rows_kernel(rows_ref, table_ref, out_ref):
        def body(i, accs):
            a0, a1, a2, a3 = accs
            s = lambda j: table_ref[
                pl.ds(pl.multiple_of(rows_ref[4 * i + j], 8), 8), :
            ].astype(jnp.float32)
            return (a0 + s(0), a1 + s(1), a2 + s(2), a3 + s(3))
        z = jnp.zeros((8, WIDE), jnp.float32)
        a0, a1, a2, a3 = jax.lax.fori_loop(0, N_ROWS // 4, body,
                                           (z, z, z, z))
        out_ref[:] = a0 + a1 + a2 + a3

    @jax.jit
    def run_rows(rows, table):
        return pl.pallas_call(
            rows_kernel,
            out_shape=jax.ShapeDtypeStruct((8, WIDE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(rows, table)

    rows0 = jnp.asarray((rng.integers(0, CAP // 8, (N_ROWS,)) * 8),
                        jnp.int32)

    def mk_rows(idx):
        rr = (rows0 + (idx[0] & 7).astype(jnp.int32) * 8) % (CAP - 8)
        rr = (rr // 8) * 8
        out = run_rows(rr, table16)
        return idx + 1, jnp.sum(out)
    try:
        scan_time("pallas_vmem_rows_2048x8x512", mk_rows, N_ROWS,
                  extra={"note": "ns_per_elem==ns per 8x512 slab"})
    except Exception as e:
        results["pallas_vmem_rows_2048x8x512"] = {"error": str(e)[:300]}
        print(f"# pallas_vmem_rows FAILED: {e}", file=sys.stderr)

    # ---------------- (d) XLA fine-scan baseline at probe shapes -------
    K_S, NRAY = 14, 19200
    flat16 = table16.reshape(-1)

    def mk_fine(idx):
        base = jax.random.bits(jax.random.PRNGKey(9), (K_S, NRAY),
                               jnp.uint32)
        ii = ((base ^ idx[0]) % jnp.uint32(CAP * WIDE)).astype(jnp.int32)
        v = flat16[ii]
        return idx + 1, jnp.sum(v).astype(jnp.float32)
    scan_time("xla_fine_direct_14x19k", mk_fine, K_S * NRAY)

    print(json.dumps(results))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_data/pallas_gather_probe.json"),
              "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
