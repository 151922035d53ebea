#!/usr/bin/env python
"""Ablate the per-tile cost of the exact-KNN sweep's device program on real
TPU: where do the milliseconds go between the matmul roofline and the
measured ~2212 query-rows/s at 10M (docs/roadmap.md)?

Variants timed per [qb, tile] tile over a device-resident shard:
  matmul   — dot_general + row-min reduce (the XLA roofline: no top-k at all)
  kernel   — fused Pallas distance+bucket-argmin (ops/pallas_knn.py), winners
             reduced to a scalar (kernel cost alone)
  kernel+amk — kernel + approx_max_k(k) over the [qb, w] winners
  full     — kernel + amk + running-top-k concat/merge (what the sweep runs)
  full-xla — the XLA panel path (_panel_topk over the raw [qb, tile] panel)

Prints one JSON line: ms/tile and effective TFLOP/s for each variant.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2097152)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--qb", type=int, default=1024)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--tile", type=int, default=131072)
    ap.add_argument("--t-strip", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leann_tpu.ops.graph import _panel_topk
    from leann_tpu.ops.pallas_knn import panel_bucketmin_call

    qb, k, tile, t_strip, d = args.qb, args.k, args.tile, args.t_strip, args.dim
    rows = (args.rows // tile) * tile
    n_tiles = rows // tile
    n_strips = tile // t_strip

    rng = np.random.default_rng(0)
    emb = rng.standard_normal((rows, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    cshard = jnp.asarray(emb, jnp.bfloat16)
    cn = np.einsum("ij,ij->i", emb, emb, dtype=np.float32)
    cnorms = jnp.asarray(cn)
    qe = cshard[:qb]
    qn = cnorms[:qb]

    def meta(ti):
        return jnp.stack([ti * n_strips, jnp.int32(0), jnp.int32(rows),
                          jnp.int32(0)]).astype(jnp.int32)

    # NOTE: the variants differ in masking (the kernels exclude self ids
    # in-kernel; v_matmul and v_full_xla exclude nothing), so only the
    # wall-clock per tile is comparable — v_matmul is a pure-compute
    # roofline, not a like-for-like reduction.
    @jax.jit
    def v_matmul():
        def body(acc, ti):
            te = jax.lax.dynamic_slice(cshard, (ti * tile, 0), (tile, d))
            dots = jax.lax.dot_general(
                qe, te, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.minimum(acc, dots.min(axis=1)), None
        acc, _ = jax.lax.scan(body, jnp.full((qb,), np.inf, jnp.float32),
                              jnp.arange(n_tiles))
        return acc

    @jax.jit
    def v_kernel():
        def body(acc, ti):
            bv, bi = panel_bucketmin_call(meta(ti), qe, cshard,
                                          tile=tile, t_strip=t_strip)
            return jnp.minimum(acc, bv.min(axis=1) + bi[:, 0] * 0.0), None
        acc, _ = jax.lax.scan(body, jnp.full((qb,), np.inf, jnp.float32),
                              jnp.arange(n_tiles))
        return acc

    @jax.jit
    def v_kernel_amk():
        def body(acc, ti):
            bv, bi = panel_bucketmin_call(meta(ti), qe, cshard,
                                          tile=tile, t_strip=t_strip)
            nv, pos = jax.lax.approx_max_k(-bv, k, recall_target=0.99)
            ids = jnp.take_along_axis(bi, pos, axis=1)
            return jnp.minimum(acc, -nv[:, 0] + ids[:, 0] * 0.0), None
        acc, _ = jax.lax.scan(body, jnp.full((qb,), np.inf, jnp.float32),
                              jnp.arange(n_tiles))
        return acc

    @jax.jit
    def v_full():
        def body(carry, ti):
            rd, ri = carry
            bv, bi = panel_bucketmin_call(meta(ti), qe, cshard,
                                          tile=tile, t_strip=t_strip)
            nv, pos = jax.lax.approx_max_k(-bv, k, recall_target=0.99)
            ids = jnp.take_along_axis(bi, pos, axis=1)
            all_d = jnp.concatenate([rd, -nv], axis=1)
            all_i = jnp.concatenate([ri, ids], axis=1)
            neg, p2 = jax.lax.top_k(-all_d, k)
            return (-neg, jnp.take_along_axis(all_i, p2, axis=1)), None
        (rd, ri), _ = jax.lax.scan(
            body, (jnp.full((qb, k), np.inf, jnp.float32),
                   jnp.full((qb, k), -1, jnp.int32)), jnp.arange(n_tiles))
        return rd

    @jax.jit
    def v_full_xla():
        def body(carry, ti):
            rd, ri = carry
            te = jax.lax.dynamic_slice(cshard, (ti * tile, 0), (tile, d))
            tn = jax.lax.dynamic_slice(cnorms, (ti * tile,), (tile,))
            dots = jax.lax.dot_general(
                qe, te, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dmat = qn[:, None] + tn[None, :] - 2.0 * dots
            neg_t, pos_t = _panel_topk(-dmat, k, 0.99)
            ids_t = jnp.take_along_axis(
                ti * tile + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 1),
                pos_t, axis=1)
            all_d = jnp.concatenate([rd, -neg_t], axis=1)
            all_i = jnp.concatenate([ri, ids_t], axis=1)
            neg, p2 = jax.lax.top_k(-all_d, k)
            return (-neg, jnp.take_along_axis(all_i, p2, axis=1)), None
        (rd, ri), _ = jax.lax.scan(
            body, (jnp.full((qb, k), np.inf, jnp.float32),
                   jnp.full((qb, k), -1, jnp.int32)), jnp.arange(n_tiles))
        return rd

    flops_tile = 2.0 * qb * tile * d
    out = {"qb": qb, "tile": tile, "t_strip": t_strip, "n_tiles": n_tiles, "dim": d}
    for name, fn in [("matmul", v_matmul), ("kernel", v_kernel),
                     ("kernel+amk", v_kernel_amk), ("full", v_full),
                     ("full-xla", v_full_xla)]:
        t0 = time.time()
        r = fn()
        np.asarray(r)  # only real sync on axon
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(args.reps):
            t0 = time.time()
            np.asarray(fn())
            best = min(best, time.time() - t0)
        ms_tile = best * 1000 / n_tiles
        out[name] = {"ms_per_tile": round(ms_tile, 3),
                     "tflops": round(flops_tile / (ms_tile / 1000) / 1e12, 1),
                     "compile_s": round(compile_s, 1)}
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
