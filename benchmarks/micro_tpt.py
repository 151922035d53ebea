#!/usr/bin/env python
"""Embedding-throughput microbenchmark.

Parity with the reference's benchmarks/micro_tpt.py:15-120 (which sweeps
fp16/int8/int4 + CUDA graphs on torch): here we sweep batch size, sequence
length, and compute dtype for the jitted JAX encoder and report tokens/s.
The jit itself plays the CUDA-graphs role (one captured program, replayed).
"""

import argparse
import time

import numpy as np

from bench_common import load_corpus  # noqa: F401  (repo path side effect)

import jax
import jax.numpy as jnp

from leann_tpu.embeddings.encoder import encode_tokens, get_encoder


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="hash-minilm")
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 128, 512])
    ap.add_argument("--seq-lens", type=int, nargs="+", default=[64, 128, 256])
    ap.add_argument("--dtypes", nargs="+", default=["bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    from dataclasses import replace

    for dtype in args.dtypes:
        enc = get_encoder(args.model)
        cfg = replace(enc.cfg, compute_dtype=dtype)
        for t in args.seq_lens:
            for b in args.batches:
                ids = jnp.asarray(rng.integers(4, cfg.vocab_size, size=(b, t)), jnp.int32)
                mask = jnp.ones((b, t), jnp.int32)
                fn = jax.jit(lambda p, i, m: encode_tokens(p, i, m, cfg))
                # NOTE: device->host copy is the only reliable sync on some
                # TPU transports (block_until_ready can return early); we
                # pipeline iters and copy the final result once.
                np.asarray(fn(enc.params, ids, mask))
                t0 = time.time()
                for _ in range(args.iters):
                    out = fn(enc.params, ids, mask)
                np.asarray(out)
                dt = (time.time() - t0) / args.iters
                print(f"dtype={dtype:9s} B={b:4d} T={t:4d}: {b * t / dt / 1e3:9.1f} Ktok/s "
                      f"({dt * 1000:7.2f} ms/batch)")


if __name__ == "__main__":
    main()
