#!/usr/bin/env python
"""Per-hop cost profile of the fused beam-search loop (VERDICT r2 #6).

The north-star design question: is the per-hop `lax.sort` over [L+f]
(ops/beam_search.py _merge_pool) or the O(f^2) dedup
(ops/beam_search.py _dedup_mask) a bottleneck worth a Pallas
candidate-heap kernel, or is the loop bound by the traversal math
(ADC gathers / recompute matmuls) and memory traffic?

Method: each loop component is jitted standalone at the DPR-tier
operating point (N=2.1M, R=32, beam=16 -> f=512, L=complexity=1024,
M=32 PQ bytes) and timed with a hard device sync (np.asarray — the only
real sync on this tunneled image). A whole-hop composite and the real
end-to-end search (per-hop = total/steps) anchor the shares. Both the
single-query lane and the batched (B=64 vmapped) program are profiled —
the headline bench is batched.

Writes a markdown table to stdout; paste into docs/profile_fused_loop.md.

Usage:  python benchmarks/profile_fused_loop.py [--tier ~/.cache/leann_tpu_bench/dpr21m_r32]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from leann_tpu.ops.beam_search import _dedup_mask, _merge_pool  # noqa: E402


def timed(fn, *args, shared=(), iters=50, warmup=3, batch=1):
    """ms per call (batch lanes via vmap when batch>1). Big lookup tables go
    in ``shared`` — they must be EXPLICIT jit arguments (vmapped with
    in_axes=None): a closure-captured device array is baked into the program
    as a constant and shipped inside the axon remote-compile request, which
    rejects bodies past ~100 MB (HTTP 413)."""
    if batch > 1:
        fn = jax.vmap(fn, in_axes=(None,) * len(shared) + (0,) * len(args))
        args = [jnp.broadcast_to(a, (batch,) + a.shape) for a in args]
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*shared, *args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.time()
    for _ in range(iters):
        out = jfn(*shared, *args)
    jax.tree_util.tree_map(np.asarray, out)
    return (time.time() - t0) * 1000 / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_100_000)
    ap.add_argument("--r", type=int, default=32)
    ap.add_argument("--beam", type=int, default=16)
    ap.add_argument("--complexity", type=int, default=1024)
    ap.add_argument("--pq-m", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--tier", default=os.path.expanduser(
        "~/.cache/leann_tpu_bench/dpr21m_r32"))
    args = ap.parse_args()

    n, r, beam, l, m = args.n, args.r, args.beam, args.complexity, args.pq_m
    f = beam * r
    rng = np.random.default_rng(0)

    neighbors = jnp.asarray(rng.integers(0, n, size=(n, r)), jnp.int32)
    codes = jnp.asarray(rng.integers(0, 256, size=(n, m)), jnp.uint8)
    lut = jnp.asarray(rng.standard_normal((m, 256)), jnp.float32)
    visited = jnp.zeros(((n + 31) // 32,), jnp.uint32)
    sel_ids = jnp.asarray(rng.integers(0, n, size=(beam,)), jnp.int32)
    nbrs = jnp.asarray(rng.integers(0, n, size=(f,)), jnp.int32)
    valid = jnp.ones((f,), bool)
    pool_ids = jnp.asarray(rng.integers(0, n, size=(l,)), jnp.int32)
    pool_dist = jnp.sort(jnp.asarray(rng.standard_normal((l,)), jnp.float32))
    pool_flag = jnp.asarray(rng.integers(0, 2, size=(l,)), bool)
    new_ids = jnp.asarray(rng.integers(0, n, size=(f,)), jnp.int32)
    new_dist = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    new_skip = jnp.zeros((f,), bool)

    rows = []

    def add(name, fn, *a, shared=()):
        single = timed(fn, *a, shared=shared, iters=args.iters)
        batched = timed(fn, *a, shared=shared, iters=args.iters, batch=args.batch)
        rows.append((name, single, batched / args.batch))

    # 1. frontier select: top_k over the L-pool
    add("select (top_k over L)",
        lambda pd, pf: jax.lax.top_k(-jnp.where(pf, 1e30, pd), beam),
        pool_dist, pool_flag)
    # 2. neighbor-row gather from HBM: [beam] -> [beam*R]
    add("expand (HBM row gather)", lambda g_, s: g_[s].reshape(f), sel_ids,
        shared=(neighbors,))
    # 3. O(f^2) dedup
    add("dedup (f^2 pairwise)", lambda nb, v: _dedup_mask(nb, v), nbrs, valid)
    # 4. visited bitmap test+mark
    def vis(nb, v, vis_w):
        wi = nb >> 5
        bit = jnp.uint32(1) << (nb & 31).astype(jnp.uint32)
        is_new = ((vis_w[wi] & bit) == 0) & v
        return vis_w.at[wi].add(jnp.where(is_new, bit, jnp.uint32(0))), is_new
    add("visited bitmap", vis, nbrs, valid, visited)
    # 5. ADC distances: code gather [f, M] + LUT lookups
    def adc(codes_, nb):
        c = codes_[nb]
        return jnp.take_along_axis(
            lut, c.astype(jnp.int32).T, axis=1).sum(0)
    add("ADC (code gather + LUT)", adc, nbrs, shared=(codes,))
    # 6. pool merge: the lax.sort over [L + f]
    add("merge (lax.sort L+f)",
        lambda *a: _merge_pool(*a, l),
        pool_ids, pool_dist, pool_flag, new_ids, new_dist, new_skip)

    # whole-hop composite (everything chained, one jit)
    def hop(g_, codes_, pd, pf, vis_w):
        neg, pos = jax.lax.top_k(-jnp.where(pf, 1e30, pd), beam)
        sel = pool_ids[pos]
        nb = g_[sel].reshape(f)
        v = _dedup_mask(nb, nb >= 0)
        wi = nb >> 5
        bit = jnp.uint32(1) << (nb & 31).astype(jnp.uint32)
        is_new = ((vis_w[wi] & bit) == 0) & v
        vis_w = vis_w.at[wi].add(jnp.where(is_new, bit, jnp.uint32(0)))
        d = jnp.take_along_axis(lut, codes_[nb].astype(jnp.int32).T, axis=1).sum(0)
        return _merge_pool(pool_ids, pd, pf.at[pos].set(True),
                           jnp.where(is_new, nb, -1), d, ~is_new, l), vis_w
    add("WHOLE HOP (composite)", hop, pool_dist, pool_flag, visited,
        shared=(neighbors, codes))

    print(f"\nshapes: N={n} R={r} beam={beam} f={f} L={l} M={m} B={args.batch}")
    print("\n| component | single-lane ms/hop | batched ms/hop/lane |")
    print("|---|---|---|")
    comp = dict((nm, (s, b)) for nm, s, b in rows)
    whole_s, whole_b = comp["WHOLE HOP (composite)"][0], comp["WHOLE HOP (composite)"][1]
    for nm, s, b in rows:
        share = f" ({100 * b / whole_b:.0f}%)" if nm != "WHOLE HOP (composite)" else ""
        print(f"| {nm} | {s:.3f} | {b:.4f}{share} |")

    # anchor: the real end-to-end search on the cached DPR tier, if present
    meta = None
    if os.path.isdir(args.tier):
        metas = [x for x in os.listdir(args.tier) if x.endswith(".leann.meta.json")]
        if metas:
            meta = os.path.join(args.tier, sorted(metas)[-1])
    if meta:
        from leann_tpu import LeannSearcher
        from leann_tpu.ops.beam_search import beam_search_adaptive

        prefix = meta[: -len(".meta.json")]
        s = LeannSearcher(prefix)
        queries = json.load(open(os.path.join(args.tier, "queries.json")))
        be = s.backend
        cfg, enc_params = be._make_cfg(
            3, complexity=l, beam_width=beam, rerank_size=128, n_entries=256)
        qv = be.get_encoder().encode(queries)
        if be.metric == "cosine":
            qv = qv / np.maximum(np.linalg.norm(qv, axis=1, keepdims=True), 1e-12)
        g = be._graph_data()
        labels, dists, steps, n_exact = beam_search_adaptive(qv, g, cfg, enc_params)
        t0 = time.time()
        beam_search_adaptive(qv, g, cfg, enc_params)
        ms = (time.time() - t0) * 1000 / len(queries)
        hop_ms = ms / max(float(np.mean(steps)), 1.0)
        print(f"\nend-to-end batched (B={len(queries)}, cx={l}, {cfg.traversal}): "
              f"{ms:.2f} ms/q, steps mean {np.mean(steps):.0f} max {np.max(steps)}, "
              f"n_exact mean {np.mean(n_exact):.0f} -> {hop_ms:.4f} ms/hop/lane "
              f"(composite microbench accounts for "
              f"{100 * comp['WHOLE HOP (composite)'][1] / hop_ms:.0f}% of it; the "
              f"remainder is rerank + traversal-mode distance math)")
    else:
        print(f"\n(no cached tier at {args.tier}; end-to-end anchor skipped)")


if __name__ == "__main__":
    main()
