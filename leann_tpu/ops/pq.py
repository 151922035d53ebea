"""Product quantization: train / encode / ADC lookup tables — all jitted.

TPU-native replacement for the PQ machinery the reference gets from its
faiss/DiskANN C++ forks (`pq_pruning_ratio` steering in hnsw_backend.py:220,
`_pq_pivots.bin`/`_pq_compressed.bin` in diskann_backend.py:151-208):
compact uint8 codes live in HBM and steer graph traversal; exact recomputed
embeddings rerank.

Layout: D is split into M subspaces of ds dims; each subspace has K=256
centroids. Codes are ``u8[N, M]``; codebooks ``f32[M, K, ds]``. Training is
Lloyd's k-means vmapped across subspaces (one batched distance matmul per
iteration — MXU-friendly).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np


def choose_m(dim: int, target_m: int = 0) -> int:
    """Pick a subspace count that divides dim (prefer ~dim/8, i.e. ds=8)."""
    if target_m and dim % target_m == 0:
        return target_m
    for m in (dim // 8, dim // 4, dim // 16, dim // 2):
        if m and dim % m == 0:
            return m
    return 1


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _kmeans_subspace(x: jnp.ndarray, init: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """x [S, ds], init [K, ds] -> centroids [K, ds]. Dead centroids keep their
    previous position (harmless: nothing maps to them)."""

    def step(c, _):
        d = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * jnp.dot(x, c.T, preferred_element_type=jnp.float32)
            + jnp.sum(c * c, axis=1)[None, :]
        )
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, c.shape[0], dtype=jnp.float32)  # [S, K]
        counts = jnp.sum(one_hot, axis=0)  # [K]
        sums = jnp.dot(one_hot.T, x, preferred_element_type=jnp.float32)  # [K, ds]
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c)
        return new_c, None

    c, _ = jax.lax.scan(step, init, None, length=n_iters)
    return c


def train_pq(
    x: np.ndarray, m: int = 0, k: int = 256, n_iters: int = 10, sample: int = 65536, seed: int = 0
) -> np.ndarray:
    """Train codebooks on (a sample of) x [N, D] -> f32[M, K, ds]."""
    n, d = x.shape
    m = choose_m(d, m)
    ds = d // m
    rng = np.random.default_rng(seed)
    if n > sample:
        x = x[rng.choice(n, sample, replace=False)]
    xs = jnp.asarray(x.reshape(-1, m, ds).transpose(1, 0, 2))  # [M, S, ds]
    k_eff = min(k, xs.shape[1])
    init_idx = rng.choice(xs.shape[1], k_eff, replace=False)
    init = xs[:, init_idx, :]  # [M, K, ds]
    cb = jax.vmap(lambda xx, ii: _kmeans_subspace(xx, ii, n_iters))(xs, init)
    if k_eff < k:  # pad to fixed K so codes stay u8-addressable
        pad = jnp.tile(cb[:, :1, :], (1, k - k_eff, 1)) + 1e6
        cb = jnp.concatenate([cb, pad], axis=1)
    return np.asarray(cb)


@jax.jit
def encode_pq(x: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """x [B, D], codebooks [M, K, ds] -> codes u8[B, M]."""
    m, k, ds = codebooks.shape
    xs = x.reshape(x.shape[0], m, ds).transpose(1, 0, 2)  # [M, B, ds]

    def sub(xm, cm):
        d = (
            jnp.sum(xm * xm, axis=1, keepdims=True)
            - 2.0 * jnp.dot(xm, cm.T, preferred_element_type=jnp.float32)
            + jnp.sum(cm * cm, axis=1)[None, :]
        )
        return jnp.argmin(d, axis=1)

    codes = jax.vmap(sub)(xs, codebooks)  # [M, B]
    return codes.T.astype(jnp.uint8)


def encode_pq_blocked(x: np.ndarray, codebooks: np.ndarray, block: int = 16384) -> np.ndarray:
    cb = jnp.asarray(codebooks)
    out = np.empty((x.shape[0], codebooks.shape[0]), dtype=np.uint8)
    for s in range(0, x.shape[0], block):
        out[s : s + block] = np.asarray(encode_pq(jnp.asarray(x[s : s + block]), cb))
    return out


def adc_lut(q: jnp.ndarray, codebooks: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Per-query ADC table: q [D] -> lut f32[M, K] such that
    dist(q, x) ≈ sum_m lut[m, code[x, m]] (lower = closer)."""
    m, k, ds = codebooks.shape
    qs = q.reshape(m, 1, ds)
    if metric in ("mips", "cosine"):
        return -jnp.sum(qs * codebooks, axis=-1)  # [M, K]
    return jnp.sum(jnp.square(qs - codebooks), axis=-1)


def adc_distances(codes: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """codes i32/u8 [C, M], lut [M, K] -> approx distances [C] f32."""
    m, k = lut.shape
    flat = lut.reshape(-1)  # [M*K]
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) * k
    idx = codes.astype(jnp.int32) + offs  # [C, M]
    return jnp.sum(flat[idx], axis=1)
