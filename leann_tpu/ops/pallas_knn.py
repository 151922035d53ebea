"""Fused distance + bucket-argmin Pallas kernel for the exact-KNN sweeps.

The XLA panel path in ops/graph.py (``_exact_knn_shard_device``) computes a
[qb, tile] f32 distance panel with one dot_general and reduces it with
``approx_max_k``. Measured on the v5e (2026-08-19, qb=1024 tile=131072 d=384):
the matmul alone runs at ~27 TFLOP/s because the 512 MB panel round-trips
through HBM, and approx_max_k adds ~4.9 ms — 8.7 ms/panel, 10x off the MXU
speed-of-light. At 10M rows that is a 78 s query-chunk and a ~1.7 h sweep;
the reference never faces this shape (its KNN is sequential CPU inserts,
hnsw_backend.py:83-89).

This kernel keeps the panel in VMEM: each grid step matmuls a [qb, T] strip
and folds it into 128 lane-buckets via a running elementwise argmin (bucket
``b`` of strip ``s`` holds columns ``{s*T + a*128 + b}``) — the only HBM
traffic is the corpus strip itself plus a [qb, 128] winner row per step. A
final ``approx_max_k`` over the [qb, (tile/t_strip)*128] winners (t_strip/128
= 8x narrower than the raw panel at the default strip) picks the per-tile
top-k outside the kernel.

Approximation: a column can only be selected if it wins its 128-wide stride
bucket within its strip (t_strip/128 competitors per bucket). For a candidate
ranked r among N corpus rows the loss probability is < (t_strip/128 - 1) *
r / N — at 10M rows, r <= 64, t_strip = 1024 that is ~4.5e-5 per entry,
noise against the sweep's 0.99 approx_max_k target. Candidate generation
feeding the alpha-prune tolerates far worse (the prune sees c = 2R
candidates and keeps R).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = float("inf")  # plain float: a jnp scalar would be a captured constant in the kernel

# lane width of the bucket fold — one VPU register row, and the minimum
# efficient trailing dim on TPU
_LANES = 128


def _kernel(meta_ref, q_ref, c_ref, ov_ref, oi_ref):
    """One 128-column *slab* of a strip: distances + running bucket min.

    The grid is 2-D — (strip s, slab a) with the slab loop INNERMOST — and
    the output block index depends only on ``s``, so Mosaic keeps the
    [qb, 128] winner blocks resident in VMEM across the inner slab loop and
    flushes them to HBM once per strip. Every value this kernel touches is
    [qb, 128] or [128, D]: earlier single-grid designs that materialised the
    [qb, t_strip] panel in-kernel (directly, or sliced out of a VMEM scratch
    ref) made Mosaic's register allocator spill ~128 MB of stack — a compile
    OOM on real TPU at ANY qb (measured 2026-08-20: 130.5 M / 127.2 M
    against the 16 M scoped-vmem limit at qb=256).

    Distances omit the per-query-row squared norm (a per-row CONSTANT: it
    moves neither the bucket min nor any later within-row top-k; the caller
    adds it back outside the kernel, which also keeps awkward [qb, 1]
    operand blocks out of Mosaic).

    Column norms are computed IN-KERNEL from the bf16 slab (f32 accumulate)
    rather than streamed as an f32 input: a [1, T] norm block violates
    Mosaic's (8, 128) block-divisibility rule, and the recompute is one VPU
    reduction against an MXU-bound step. The ~1e-3 relative difference vs
    host-f32 norms is noise for candidate generation (the sweep's own
    approx_max_k target is 0.99).

    meta (SMEM i32[4]): [block_off, col_start, col_end_real, q_start]
      block_off     — first strip of this call, in units of t_strip rows
      col_start     — global id of cshard row 0 (column shard offset)
      col_end_real  — col_start + number of real (un-padded) shard rows
      q_start       — global id of query row 0 of this block
    """
    qb, d = q_ref.shape
    s = pl.program_id(0)
    a = pl.program_id(1)
    t = pl.num_programs(1) * _LANES  # t_strip
    col0 = meta_ref[1] + (meta_ref[0] + s) * t + a * _LANES

    dots = jax.lax.dot_general(
        q_ref[:], c_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [qb, 128]
    c32 = c_ref[:].astype(jnp.float32)
    cn = jnp.sum(c32 * c32, axis=1)  # [128] slab column squared norms
    sl = cn[None, :] - 2.0 * dots    # squared l2 minus the |q|^2 row constant
    ids = col0 + jax.lax.broadcasted_iota(jnp.int32, (qb, _LANES), 1)
    q_ids = meta_ref[3] + jax.lax.broadcasted_iota(jnp.int32, (qb, _LANES), 0)
    sl = jnp.where((ids >= meta_ref[2]) | (ids == q_ids), INF, sl)

    @pl.when(a == 0)
    def _init():
        ov_ref[:] = sl
        oi_ref[:] = ids

    @pl.when(a != 0)
    def _fold():
        bv = ov_ref[:]
        upd = sl < bv
        ov_ref[:] = jnp.where(upd, sl, bv)
        oi_ref[:] = jnp.where(upd, ids, oi_ref[:])


def panel_bucketmin_call(
    meta: jnp.ndarray,     # i32 [4]: [block_off, col_start, col_end_real, q_start]
    qe: jnp.ndarray,       # bf16 [qb, D] query rows
    cshard: jnp.ndarray,   # bf16 [M, D] device-resident column slab (M % t_strip == 0)
    tile: int = 131072,    # columns covered per call
    t_strip: int = 1024,   # columns per grid step (VMEM strip)
    interpret: bool = False,
):
    """Raw pallas_call form — safe to invoke inside an enclosing jit / scan
    (all of ``meta`` may be traced). -> (vals f32 [qb, w], ids i32 [qb, w])
    with w = (tile//t_strip)*128: per-bucket winners of the [qb, tile]
    distance panel starting at strip ``meta[0]``. Values OMIT the per-row
    |q|² constant (see _kernel) — add ``qn[:, None]`` for true squared L2.
    Column norms come from the strip itself in-kernel (see _kernel). Feed to
    approx_max_k / top_k for the per-tile top-k (t_strip/128-fold narrower
    than the raw panel, which itself never leaves VMEM)."""
    qb, d = qe.shape
    assert tile % t_strip == 0 and t_strip % _LANES == 0
    n_steps = tile // t_strip
    n_slab = t_strip // _LANES
    w = n_steps * _LANES  # 128 winners per strip -> t_strip/128-fold narrowing
    # 2-d grid, slab innermost: the output block index ignores ``a``, so the
    # winner blocks persist in VMEM across the inner loop (consecutive-step
    # revisiting) and each corpus slab is read from HBM exactly once
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_steps, n_slab),
        in_specs=[
            pl.BlockSpec((qb, d), lambda s, a, m: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES, d),
                         lambda s, a, m: ((m[0] + s) * n_slab + a, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, _LANES), lambda s, a, m: (0, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, _LANES), lambda s, a, m: (0, s), memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((qb, w), jnp.float32),
            jax.ShapeDtypeStruct((qb, w), jnp.int32),
        ],
        # Mosaic multiplies the per-step stack by its software-pipeline
        # depth; the default 16 MB scoped-vmem budget overflows at qb=256
        # (16.93 M measured) even though nothing in the kernel exceeds
        # [qb, 128] f32. v5e VMEM is 128 MB; a standalone kernel dispatch
        # can claim most of it.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=interpret,
    )(meta, qe, cshard)


@functools.partial(
    jax.jit, static_argnames=("tile", "t_strip", "interpret"),
)
def panel_bucketmin(
    qe: jnp.ndarray,       # bf16 [qb, D] query rows
    qn: jnp.ndarray,       # f32 [qb] query squared norms
    cshard: jnp.ndarray,   # bf16 [M, D] device-resident column slab (M % tile == 0)
    block_off: jnp.ndarray,   # i32 — first strip, in units of t_strip rows
    col_start: jnp.ndarray,   # i32 — global id of cshard row 0
    col_end_real: jnp.ndarray,  # i32 — col_start + real rows in shard
    q_start: jnp.ndarray,     # i32 — global id of qe row 0
    tile: int = 131072,
    t_strip: int = 1024,
    interpret: bool = False,
):
    """Standalone jitted wrapper of :func:`panel_bucketmin_call` (benchmarks
    and tests; the KNN sweeps call the raw form inside their own scans)."""
    meta = jnp.stack([block_off.astype(jnp.int32), col_start.astype(jnp.int32),
                      col_end_real.astype(jnp.int32), q_start.astype(jnp.int32)])
    bv, bi = panel_bucketmin_call(meta, qe, cshard,
                                  tile=tile, t_strip=t_strip, interpret=interpret)
    return bv + qn[:, None].astype(jnp.float32), bi


def pick_t_strip(tile: int, cap: int = 1024) -> int:
    """Largest multiple of 128 that divides ``tile`` (capped at ``cap``);
    0 when tile is not 128-aligned — caller falls back to the XLA panel."""
    if tile % _LANES:
        return 0
    s = (min(cap, tile) // _LANES) * _LANES
    while s > _LANES and tile % s:
        s -= _LANES
    return s


def panel_bucketmin_ref(qe, qn, cshard, block_off, col_start,
                        col_end_real, q_start, tile=131072, t_strip=1024):
    """Pure-jnp mirror of the kernel's bucket semantics (CPU path / tests).
    Column norms from the bf16 slab, matching the kernel's in-kernel norms."""
    qb = qe.shape[0]
    c0 = block_off * t_strip
    cs = jax.lax.dynamic_slice_in_dim(cshard, c0, tile, 0)
    c32 = cs.astype(jnp.float32)
    cn = jnp.sum(c32 * c32, axis=1)
    dots = jax.lax.dot_general(qe, cs, dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dmat = qn[:, None] + cn[None, :] - 2.0 * dots
    ids = col_start + c0 + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 1)
    q_ids = q_start + jnp.arange(qb, dtype=jnp.int32)
    dmat = jnp.where((ids >= col_end_real) | (ids == q_ids[:, None]), INF, dmat)
    # same bucket partition: within each t_strip, lane b of slab a = col a*128+b
    n_steps = tile // t_strip
    n_slab = t_strip // _LANES
    dm = dmat.reshape(qb, n_steps, n_slab, _LANES)
    im = ids.reshape(qb, n_steps, n_slab, _LANES)
    a = jnp.argmin(dm, axis=2)
    bv = jnp.take_along_axis(dm, a[:, :, None, :], axis=2)[:, :, 0, :]
    bi = jnp.take_along_axis(im, a[:, :, None, :], axis=2)[:, :, 0, :]
    return bv.reshape(qb, -1), bi.reshape(qb, -1)
