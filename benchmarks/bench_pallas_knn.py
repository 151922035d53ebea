#!/usr/bin/env python
"""Micro-benchmark: XLA panel path vs the fused Pallas bucket-argmin kernel
inside the exact-KNN sweep (ops/pallas_knn.py), on real TPU.

The sweep's unit of work is one (qchunk x corpus) dispatch of
_exact_knn_shard_device; at 10M rows the XLA path measured ~78 s per 131072-
row qchunk (~27 TFLOP/s — panel HBM round-trips). This script times both
panel impls on a device-resident synthetic shard and checks candidate
agreement, so the kernel can be promoted to the scale builds only with
measured numbers.

Usage: python benchmarks/bench_pallas_knn.py [--rows 2097152] [--qchunk 32768]
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
    ap.add_argument("--rows", type=int, default=2097152)  # 1.6 GB bf16 at 384
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--qchunk", type=int, default=32768)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--tile", type=int, default=131072)
    ap.add_argument("--t-strip", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from leann_tpu.ops.graph import _exact_knn_shard_device

    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)

    rng = np.random.default_rng(0)
    rows = (args.rows // args.tile) * args.tile
    emb = rng.standard_normal((rows, args.dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    cshard = jnp.asarray(emb, jnp.bfloat16)
    cnorms = jnp.asarray(np.einsum("ij,ij->i", emb, emb, dtype=np.float32))
    dummy_q = jnp.zeros((1, args.dim), jnp.bfloat16)
    dummy_n = jnp.zeros((1,), jnp.float32)

    qb = 1024
    nqb = args.qchunk // qb
    run_d = jnp.full((args.qchunk, args.k), 3.4e38, jnp.float32)
    run_i = jnp.full((args.qchunk, args.k), -1, jnp.int32)

    results = {}
    pairs = args.qchunk * rows
    for panel in ("xla", "pallas"):
        kw = dict(k=args.k, qb=qb, tile=args.tile, n_qblocks=nqb,
                  approx_recall=0.99, q_in_shard=True, panel=panel,
                  t_strip=args.t_strip)
        t0 = time.time()
        rd, ri = _exact_knn_shard_device(
            cshard, cnorms, dummy_q, dummy_n, run_d, run_i,
            jnp.int32(0), jnp.int32(0), jnp.int32(rows), **kw)
        ri_h = np.asarray(ri)  # the only real sync on axon
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            rd, ri = _exact_knn_shard_device(
                cshard, cnorms, dummy_q, dummy_n, run_d, run_i,
                jnp.int32(0), jnp.int32(0), jnp.int32(rows), **kw)
            np.asarray(rd)
            times.append(time.time() - t0)
        best = min(times)
        results[panel] = {"compile_s": round(compile_s, 1),
                          "dispatch_s": round(best, 3),
                          "tflops": round(pairs * args.dim * 2 / best / 1e12, 1),
                          "ids": ri_h}
        print(f"{panel}: {results[panel]['dispatch_s']}s/dispatch "
              f"({results[panel]['tflops']} TFLOP/s) compile {compile_s:.0f}s",
              flush=True)

    a, b = results["xla"]["ids"], results["pallas"]["ids"]
    ov = np.mean([len(set(x.tolist()) & set(y.tolist())) for x, y in
                  zip(a[:2048], b[:2048])]) / args.k
    print(json.dumps({
        "rows": rows, "qchunk": args.qchunk, "k": args.k,
        "xla_dispatch_s": results["xla"]["dispatch_s"],
        "pallas_dispatch_s": results["pallas"]["dispatch_s"],
        "speedup": round(results["xla"]["dispatch_s"] / results["pallas"]["dispatch_s"], 2),
        "xla_tflops": results["xla"]["tflops"],
        "pallas_tflops": results["pallas"]["tflops"],
        "candidate_overlap": round(float(ov), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
