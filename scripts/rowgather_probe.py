"""On-chip probe: brick-ROW gathers + in-register selection vs per-sample
gathers, at the raycast's real shapes.

Question: the measured cost model says every random-gather *descriptor*
costs ~8-14 ns with row width nearly free (measured up to width 6).  If a
width-512 row (one full 8x8x8 brick from the tiled [B^3, 512] view) still
costs ~1 descriptor, the fine scan can fetch the ~6 bricks a ray window
crosses (115k descriptors) instead of its ~14 samples (269k descriptors)
and select samples in-register via an XLA-fused masked reduction (VPU
compute, no descriptors).  This probe measures both sides of that trade
INSIDE a lax.scan (the only trustworthy timing on this tunnel — see
.claude/skills/verify/SKILL.md).

Shapes mirror the 256^3 half-res raycast: 19200 rays (160x120), S=14
samples/ray, table [32768, 512] bf16 (33 MB).
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
    signal.alarm(3000)
    import jax
    import jax.numpy as jnp

    results = {}
    rng = np.random.default_rng(7)
    smoke = "--smoke" in sys.argv
    R = 2 if smoke else 64

    def scan_time(name, make_step, n_desc, n_samples):
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
        results[name] = {"ms": round(dt * 1e3, 4),
                         "ns_per_desc": round(dt / max(n_desc, 1) * 1e9, 2),
                         "ns_per_sample": round(dt / n_samples * 1e9, 2)}
        print(f"# {name:34s} {dt*1e3:8.3f} ms/step "
              f"{dt/max(n_desc,1)*1e9:7.2f} ns/desc "
              f"{dt/n_samples*1e9:7.2f} ns/sample", file=sys.stderr)

    NB = 512 if smoke else 32768        # bricks at 256^3
    table = jnp.asarray(rng.standard_normal((NB, 512)), jnp.bfloat16)
    flat = table.reshape(-1)
    RAYS = 192 if smoke else 19200
    S = 14

    # ---- 1. plain row-gather rate vs width ----
    NROWS = 1 << (10 if smoke else 17)
    for width, nrows in [(8, NROWS), (64, NROWS), (512, NROWS)]:
        tab = table.reshape(-1, width)
        n = tab.shape[0]

        def mk_rows(idx, tab=tab, n=n, nrows=nrows):
            base = jax.random.bits(jax.random.PRNGKey(0), (nrows,),
                                   jnp.uint32)
            ii = ((base ^ idx[0]) % jnp.uint32(n)).astype(jnp.int32)
            v = tab[ii]
            return idx + 1, jnp.sum(v, dtype=jnp.float32)
        scan_time(f"rows_w{width}_131k", mk_rows, nrows, nrows * width)

    # ---- 2. fine-scan baseline: S per-sample gathers ----
    def mk_direct(idx):
        base = jax.random.bits(jax.random.PRNGKey(1), (S, RAYS), jnp.uint32)
        ii = ((base ^ idx[0]) % jnp.uint32(NB * 512)).astype(jnp.int32)
        v = flat[ii]
        return idx + 1, jnp.sum(v, dtype=jnp.float32)
    scan_time("fine_direct_14x19k", mk_direct, S * RAYS, S * RAYS)

    # ---- 3. brick-rows + masked-reduce select ----
    def brick_select(idx, K, two_stage):
        kb = jax.random.bits(jax.random.PRNGKey(2), (RAYS, K), jnp.uint32)
        bidx = ((kb ^ idx[0]) % jnp.uint32(NB)).astype(jnp.int32)
        sb = jax.random.bits(jax.random.PRNGKey(3), (S, RAYS), jnp.uint32)
        kk = (sb % jnp.uint32(K)).astype(jnp.int32)        # brick slot
        ll = ((sb >> 8) % jnp.uint32(512)).astype(jnp.int32)  # lane
        rows = table[bidx]                                 # [RAYS, K, 512]
        if two_stage:
            # stage 1: pick the sample's brick row (K-way select at width
            # 512); stage 2: lane select via iota-compare reduce
            selk = (kk[..., None] == jnp.arange(K, dtype=jnp.int32))
            picked = jnp.sum(jnp.where(selk[..., None], rows[None], 0)
                             .astype(jnp.float32), axis=2)  # [S,RAYS,512]
            lane = jnp.arange(512, dtype=jnp.int32)
            sell = ll[..., None] == lane
            val = jnp.sum(jnp.where(sell, picked, 0.0), axis=-1)
        else:
            lane = jnp.arange(512, dtype=jnp.int32)
            karange = jnp.arange(K, dtype=jnp.int32)
            mask = (kk[..., None, None] == karange[:, None]) \
                & (ll[..., None, None] == lane)
            val = jnp.sum(jnp.where(mask, rows[None].astype(jnp.float32),
                                    0.0), axis=(-1, -2))
        return idx + 1, jnp.sum(val, dtype=jnp.float32)

    for K in (6, 8):
        scan_time(f"fine_brickrows_K{K}_2stage",
                  lambda i, K=K: brick_select(i, K, True), RAYS * K, S * RAYS)
    scan_time("fine_brickrows_K6_1pass",
              lambda i: brick_select(i, 6, False), RAYS * 6, S * RAYS)

    # ---- 4. selection via take_along from gathered rows (descriptor
    # cost of a second gather over a tiny per-ray table) ----
    def mk_takealong(idx):
        kb = jax.random.bits(jax.random.PRNGKey(4), (RAYS, 6), jnp.uint32)
        bidx = ((kb ^ idx[0]) % jnp.uint32(NB)).astype(jnp.int32)
        rows = table[bidx].reshape(RAYS, 6 * 512)
        sb = jax.random.bits(jax.random.PRNGKey(5), (RAYS, S), jnp.uint32)
        jj = (sb % jnp.uint32(6 * 512)).astype(jnp.int32)
        v = jnp.take_along_axis(rows, jj, axis=1)
        return idx + 1, jnp.sum(v, dtype=jnp.float32)
    scan_time("fine_rows_takealong", mk_takealong, RAYS * 6 + RAYS * S,
              S * RAYS)

    # ---- 5. refine/grad shape: full-res quads share bricks ----
    QUADS = RAYS               # 240x320 / 2x2
    SQ = 8                     # refine samples per quad (2 per pixel)

    def mk_refine_direct(idx):
        base = jax.random.bits(jax.random.PRNGKey(6), (SQ, QUADS),
                               jnp.uint32)
        ii = ((base ^ idx[0]) % jnp.uint32(NB * 512)).astype(jnp.int32)
        v = flat[ii]
        return idx + 1, jnp.sum(v, dtype=jnp.float32)
    scan_time("refine_direct_8x19k", mk_refine_direct, SQ * QUADS,
              SQ * QUADS)

    def mk_refine_quad(idx, K=2):
        kb = jax.random.bits(jax.random.PRNGKey(7), (QUADS, K), jnp.uint32)
        bidx = ((kb ^ idx[0]) % jnp.uint32(NB)).astype(jnp.int32)
        sb = jax.random.bits(jax.random.PRNGKey(8), (SQ, QUADS), jnp.uint32)
        kk = (sb % jnp.uint32(K)).astype(jnp.int32)
        ll = ((sb >> 8) % jnp.uint32(512)).astype(jnp.int32)
        rows = table[bidx]
        selk = (kk[..., None] == jnp.arange(K, dtype=jnp.int32))
        picked = jnp.sum(jnp.where(selk[..., None], rows[None], 0)
                         .astype(jnp.float32), axis=2)
        lane = jnp.arange(512, dtype=jnp.int32)
        val = jnp.sum(jnp.where(ll[..., None] == lane, picked, 0.0),
                      axis=-1)
        return idx + 1, jnp.sum(val, dtype=jnp.float32)
    scan_time("refine_quadrows_K2", mk_refine_quad, QUADS * 2, SQ * QUADS)

    print(json.dumps(results))
    if not smoke:
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "bench_data/rowgather_probe.json"),
                  "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
