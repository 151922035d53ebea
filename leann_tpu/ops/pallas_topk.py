"""Pallas fused distance + top-k kernel (flat exact search).

The XLA path (ops/distance.py) materializes the full [B, N] distance matrix
in HBM before top_k reads it back — 2x N-proportional HBM traffic. This
kernel streams corpus tiles through VMEM and maintains the running top-k
in VMEM scratch across sequential grid steps, so HBM sees each corpus row
exactly once (the "transfer distances instead of embeddings" idea from the
reference's ZMQ protocol — docs/features.md:13 — taken to its logical end:
transfer *nothing* but the final k ids/scores).

Selection is K rounds of masked row-max (statically unrolled): neither
lax.top_k nor lax.sort lowers in Mosaic, and for k ≤ 64 the VPU cost of
k passes over [B, TILE+k] is small next to the MXU matmul per tile.

Scores are "higher = better" internally; public API returns distances
(lower = better) to match ops/distance.flat_search.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -3.4e38  # plain float: jnp scalars would be captured as consts


def _kernel(valid_n_ref, q_ref, e_ref, en_ref, vals_ref, idx_ref, acc_v, acc_i, *, k: int, tile: int, metric: str):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_v[:] = jnp.full(acc_v.shape, NEG_INF, jnp.float32)
        acc_i[:] = jnp.full(acc_i.shape, -1, jnp.int32)

    q = q_ref[:]  # [B, D] f32
    e = e_ref[:]  # [TILE, D] bf16
    dots = jax.lax.dot_general(
        q.astype(jnp.bfloat16), e, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, TILE]
    if metric == "l2":
        # norms come in pre-computed at f32 (bf16 squares lose too much)
        qn = jnp.sum(jnp.square(q), axis=1, keepdims=True)
        score = -(qn + en_ref[:] - 2.0 * dots)  # -(squared l2)
    else:  # mips / cosine
        score = dots
    b = score.shape[0]
    ids = t * tile + jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
    score = jnp.where(ids < valid_n_ref[0], score, NEG_INF)

    # selection gate: most tiles can't beat the running k-th best, so the
    # K-round selection runs only when this tile actually contains a candidate
    need = jnp.any(jnp.max(score, axis=1) > jnp.min(acc_v[:], axis=1))

    @pl.when(need)
    def _():
        mv = jnp.concatenate([acc_v[:], score], axis=1)  # [B, K+TILE]
        mi = jnp.concatenate([acc_i[:], ids], axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, mv.shape, 1)
        for kk in range(k):  # static unroll: K rounds of masked row-max
            m = jnp.max(mv, axis=1)
            am = jnp.argmax(mv, axis=1)
            acc_v[:, kk] = m
            sel_i = jnp.sum(jnp.where(col == am[:, None], mi, 0), axis=1)
            acc_i[:, kk] = sel_i
            mv = jnp.where(col == am[:, None], NEG_INF, mv)

    @pl.when(t == nt - 1)
    def _():
        vals_ref[:] = acc_v[:]
        idx_ref[:] = acc_i[:]


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile", "interpret"))
def pallas_flat_search(
    e: jnp.ndarray,  # [N, D] (N multiple of tile)
    q: jnp.ndarray,  # [B, D]
    valid_n: jnp.ndarray,  # scalar i32
    k: int,
    metric: str,
    tile: int = 512,
    interpret: bool = False,
    en: "jnp.ndarray | None" = None,  # [1, N] f32 squared row norms (l2 only)
):
    """-> (labels i32[B, k], distances f32[B, k]) — parity with flat_search."""
    n, d = e.shape
    b = q.shape[0]
    assert n % tile == 0, f"N={n} must be padded to a multiple of tile={tile}"
    grid = (n // tile,)
    kernel = functools.partial(_kernel, k=k, tile=tile, metric=metric)
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, d), lambda t, vn: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), lambda t, vn: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda t, vn: (0, t), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((b, k), lambda t, vn: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b, k), lambda t, vn: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((b, k), jnp.float32),
                pltpu.VMEM((b, k), jnp.int32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ),
        interpret=interpret,
    )(
        jnp.atleast_1d(valid_n).astype(jnp.int32),
        q.astype(jnp.float32),
        e.astype(jnp.bfloat16),
        en if en is not None else jnp.sum(jnp.square(e.astype(jnp.float32)), axis=1)[None, :],
    )
    if metric == "l2":
        dists = -vals  # scores were negative squared-l2
    else:
        dists = -vals  # mips/cosine distance = -dot
    return idx, dists


@functools.partial(jax.jit, static_argnames=("k", "metric", "tile"))
def pallas_flat_search_packed(e, q, valid_n, k, metric, tile=512, en=None):
    """:func:`pallas_flat_search` returning one packed i32[B, 2k] buffer
    (single device->host transfer; see ops/beam_search.pack_results)."""
    from .beam_search import pack_results

    idx, dists = pallas_flat_search(e, q, valid_n, k, metric, tile=tile, en=en)
    return pack_results(idx, dists)


def supported_on_backend() -> bool:
    import jax

    return jax.default_backend() not in ("cpu",)
