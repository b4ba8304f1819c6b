"""Primitive-variant probe: find fast formulations for the three walls
measured by ablation_bench (volume gather 24ns/elem, scatter 43ns/elem,
batched one-hot einsum 1050ms).  Varied inputs per iteration, one final
host fetch per timing.
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

    S = 256
    H, W = 240, 320
    A = 344
    results = {}
    rng = np.random.default_rng(0)

    def timeit(name, fn, args_list, n=6):
        fn_j = jax.jit(fn)
        try:
            out = fn_j(*args_list[0])
            jax.block_until_ready(out)
        except Exception as e:
            print(f"# prim {name:34s} FAILED {type(e).__name__}",
                  file=sys.stderr)
            results[name] = -1.0
            return
        t0 = time.perf_counter()
        for i in range(n):
            out = fn_j(*args_list[i % len(args_list)])
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        dt = (time.perf_counter() - t0) / n * 1e3
        results[name] = round(dt, 3)
        print(f"# prim {name:34s} {dt:9.3f} ms", file=sys.stderr)

    # ============ batched one-hot resample variants ============
    v_bck = jnp.asarray(rng.standard_normal((S, S, S)), jnp.bfloat16)
    xs = [jnp.asarray(rng.uniform(0, S, (S, A)), jnp.float32)
          for _ in range(3)]

    def make_oh(xb):   # [k, A, S] one-hot
        return (jnp.floor(xs[0])[..., None] ==
                jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)

    # v1: original pathological form
    def v1(v, xb):
        oh = (jnp.floor(xb)[..., None] ==
              jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("kab,bck->kac", oh, v,
                          preferred_element_type=jnp.float32)
    timeit("einsum_kab_bck", v1, [(v_bck, x) for x in xs], n=2)

    # v2: pre-transpose V to [k, b, c], standard batched matmul
    def v2(v, xb):
        oh = (jnp.floor(xb)[..., None] ==
              jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        vk = jnp.transpose(v, (2, 0, 1))
        return jnp.einsum("kab,kbc->kac", oh, vk,
                          preferred_element_type=jnp.float32)
    timeit("einsum_kab_kbc", v2, [(v_bck, x) for x in xs])

    # v3: same but volume already stored [k, b, c]
    v_kbc = jnp.transpose(v_bck, (2, 0, 1)).copy()

    def v3(v, xb):
        oh = (jnp.floor(xb)[..., None] ==
              jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        return jnp.einsum("kab,kbc->kac", oh, v,
                          preferred_element_type=jnp.float32)
    timeit("einsum_prestored_kbc", v3, [(v_kbc, x) for x in xs])

    # v4: f32 accumulate dot_general explicit
    def v4(v, xb):
        oh = (jnp.floor(xb)[..., None] ==
              jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            oh, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    timeit("dotgen_batched", v4, [(v_kbc, x) for x in xs])

    # v5: two-sided pass (the full shear-warp slab: rows then cols)
    def v5(v, xb):
        oh = (jnp.floor(xb)[..., None] ==
              jnp.arange(S)[None, None, :]).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(
            oh, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        oh2 = oh[:, :S, :]   # reuse as a stand-in col one-hot [k, B=S, S]
        return jax.lax.dot_general(
            t1, oh2, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    timeit("two_pass_slab", v5, [(v_kbc, x) for x in xs])

    # ============ gather variants ============
    vol32 = jnp.asarray(rng.standard_normal((S, S, S)), jnp.float32)
    vol16 = vol32.astype(jnp.bfloat16)
    volflat = vol32.reshape(-1)
    idx3 = [jnp.asarray(rng.integers(0, S, (24, H, W, 3)), jnp.int32)
            for _ in range(3)]

    timeit("gather3d_f32",
           lambda v, i: v[i[..., 0], i[..., 1], i[..., 2]],
           [(vol32, i) for i in idx3])
    timeit("gather3d_bf16",
           lambda v, i: v[i[..., 0], i[..., 1], i[..., 2]],
           [(vol16, i) for i in idx3])

    def flatgather(v, i):
        lin = (i[..., 0] * S + i[..., 1]) * S + i[..., 2]
        return v[lin]
    timeit("gather1d_flat_f32", flatgather, [(volflat, i) for i in idx3])

    # take_along_axis on last axis (lane gather): rows share x,y
    idx_rows = [jnp.asarray(rng.integers(0, S, (76800, 2)), jnp.int32)
                for _ in range(3)]
    lane = [jnp.asarray(rng.integers(0, S, (76800, 8)), jnp.int32)
            for _ in range(3)]

    def rowgather(v, i, l):
        rows = v[i[:, 0], i[:, 1]]            # [N, S] fat rows
        return jnp.take_along_axis(rows, l, axis=1)
    timeit("fatrow_then_lane8", rowgather,
           list(zip([vol32] * 3, idx_rows, lane)))

    def rowgather_only(v, i):
        return v[i[:, 0], i[:, 1]]            # [N, S]
    timeit("fatrow_76k_only", rowgather_only,
           [(vol32, i) for i in idx_rows])

    # ============ scatter variants ============
    sidx = [jnp.asarray(rng.integers(0, 32, (230000, 3)), jnp.int32)
            for _ in range(3)]
    sidx_small = [i[:60000] for i in sidx]

    timeit("scatter3d_bool_max",
           lambda i: jnp.zeros((32, 32, 32), bool)
           .at[i[:, 0], i[:, 1], i[:, 2]].max(True),
           [(i,) for i in sidx])

    def scatter_flat(i):
        lin = (i[:, 0] * 32 + i[:, 1]) * 32 + i[:, 2]
        return jnp.zeros((32768,), jnp.int32).at[lin].add(
            1, mode="drop")
    timeit("scatter1d_add_i32", scatter_flat, [(i,) for i in sidx])

    def scatter_flat_set(i):
        lin = (i[:, 0] * 32 + i[:, 1]) * 32 + i[:, 2]
        return jnp.zeros((32768,), jnp.uint8).at[lin].set(1, mode="drop")
    timeit("scatter1d_set_u8", scatter_flat_set, [(i,) for i in sidx])
    timeit("scatter1d_set_u8_60k", scatter_flat_set,
           [(i,) for i in sidx_small])

    # segment-sorted indices (allocation marches are spatially coherent)
    ssort = [jnp.sort((i[:, 0] * 32 + i[:, 1]) * 32 + i[:, 2])
             for i in sidx]
    timeit("scatter1d_presorted",
           lambda l: jnp.zeros((32768,), jnp.uint8).at[l].set(1,
                                                             mode="drop"),
           [(l,) for l in ssort])

    # ============ association gather variants ============
    ref6 = jnp.asarray(rng.standard_normal((H, W, 6)), jnp.float32)
    aidx = [jnp.asarray(rng.integers(0, H * W, (H, W)), jnp.int32)
            for _ in range(3)]

    timeit("assoc_flat_rows",
           lambda r, i: r.reshape(-1, 6)[i],
           [(ref6, i) for i in aidx])

    # 2D coherent indices (association displacement is small and smooth)
    def coherent(i):
        base = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
        return jnp.clip(base + (i % 7) - 3, 0, H * W - 1)
    cidx = [coherent(i) for i in aidx]
    timeit("assoc_coherent_rows",
           lambda r, i: r.reshape(-1, 6)[i],
           [(ref6, i) for i in cidx])

    print(json.dumps(results))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "bench_data/prim_probe.json"), "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
