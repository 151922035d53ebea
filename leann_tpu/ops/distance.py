"""Distance + top-k primitives (XLA path).

The brute-force exact search is a single MXU matmul + top-k per query batch —
the TPU-native replacement for a faiss flat index (reference
benchmarks/compare_faiss_vs_leann.py baseline). Distances follow the
reference's three metrics (hnsw_backend.py:83-89): ``l2`` (squared L2),
``mips`` (negative inner product), ``cosine`` (negative cosine; inputs are
pre-normalized by the caller so it reduces to mips).

All functions are pure and jittable; shapes must be padded by callers
(pad rows score ``+inf`` via the ``valid_n`` argument).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.float32(3.4e38)


def pairwise_distances(q: jnp.ndarray, e: jnp.ndarray, metric: str) -> jnp.ndarray:
    """q [B, D], e [N, D] -> distances [B, N] (lower = closer) in f32.

    The matmul runs in bf16 on the MXU with f32 accumulation.
    """
    qb = q.astype(jnp.bfloat16)
    eb = e.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        qb, eb, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [B, N]
    if metric in ("mips", "cosine"):
        return -dots
    if metric == "l2":
        qn = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1, keepdims=True)  # [B,1]
        en = jnp.sum(jnp.square(e.astype(jnp.float32)), axis=-1)  # [N]
        return qn + en[None, :] - 2.0 * dots
    raise ValueError(f"unknown metric {metric!r}")


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def flat_search(e: jnp.ndarray, q: jnp.ndarray, valid_n: jnp.ndarray, k: int, metric: str):
    """Exact search: -> (labels [B, k] i32, distances [B, k] f32).

    ``valid_n`` masks out padding rows at the tail of ``e``.
    """
    d = pairwise_distances(q, e, metric)
    n = e.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    d = jnp.where(col < valid_n, d, INF)
    neg_top, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32), -neg_top


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def flat_search_packed(e: jnp.ndarray, q: jnp.ndarray, valid_n: jnp.ndarray, k: int, metric: str):
    """:func:`flat_search` returning one packed i32[B, 2k] buffer so labels and
    distances cross the host<->device boundary in a single transfer."""
    from .beam_search import pack_results

    labels, dists = flat_search(e, q, valid_n, k, metric)
    return pack_results(labels, dists)
