"""Sharded graph construction over a device mesh — the build-side SPMD path.

The single-device build (ops/graph.py) holds the whole embedding matrix in
one HBM: at 60M x 384 f32 that is ~92 GB, far beyond one chip. This module
shards the matrix over the ``gp`` mesh axis and builds the same
KNN -> alpha-prune graph with ring collectives, so build capacity scales
with the mesh exactly like search capacity does (parallel/sharded_search.py).

Replaces what the reference delegates to faiss/DiskANN C++ with host-RAM
budgeting (reference diskann_backend.py:93-127) — there is no multi-machine
build in the reference at all (SURVEY.md §2.5).

Algorithm (all inside ``shard_map`` over ``gp``):

* **ring_knn** — systolic exact k-NN: each device keeps its row shard as
  local queries and a rotating tile buffer; at ring step t it scores its
  queries against the shard originally owned by rank ``(me - t) % ndev``,
  merges tile-local top-k into the running top-k (same two-stage exact
  merge as ops/graph._exact_knn_device), then ``ppermute``s the tile one
  rank forward. ndev steps visit the full corpus; peak memory per device is
  one [qb, S] distance panel + two [S, D] bf16 buffers.
* **ring_gather** — candidate embeddings for the prune phase live on
  arbitrary shards; the same rotation fills an explicit [B, D] gather in
  ndev steps with only local dynamic-gathers (no all-to-all materialized).
* **sharded_build_graph** — ring_knn -> per-shard alpha-prune
  (ops/graph.robust_prune_explicit semantics) on ring-gathered candidate
  embeddings -> host-side reverse-edge fill (i32 graph is small: 60M x 32
  is 7.7 GB host RAM).

Validated against the single-device build on a virtual CPU mesh
(tests/test_sharded_build.py); the traversal side consumes the result
identically to a single-device graph.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.graph import _fill_reverse_edges, _pad_rows
from ..ops.beam_search import INF

logger = logging.getLogger(__name__)


def _ring_perm(ndev: int):
    return [(i, (i + 1) % ndev) for i in range(ndev)]


def _merge_topk(run_d, run_i, tile_d, tile_i, k: int):
    """Exact merge of running top-k with tile-local top-k candidates."""
    all_d = jnp.concatenate([run_d, tile_d], axis=1)
    all_i = jnp.concatenate([run_i, tile_i], axis=1)
    neg, pos = jax.lax.top_k(-all_d, k)
    return -neg, jnp.take_along_axis(all_i, pos, axis=1)


def _knn_local(esh, n_real, k: int, qb: int, ndev: int, axis: str):
    """Per-device body: local shard rows vs the whole corpus via ring."""
    s, d = esh.shape
    me = jax.lax.axis_index(axis)
    ebf = esh.astype(jnp.bfloat16)
    norms = jnp.sum(jnp.square(esh), axis=1)  # f32 [S]
    n_qblocks = s // qb

    def ring(carry, t):
        tile, tile_n, run_d, run_i = carry
        owner = (me - t) % ndev  # shard the tile started on
        base = owner * s

        def q_block(qcarry, qi):
            rd, ri = qcarry
            qs = qi * qb
            qe = jax.lax.dynamic_slice(ebf, (qs, 0), (qb, d))
            qn = jax.lax.dynamic_slice(norms, (qs,), (qb,))
            q_gid = me * s + qs + jnp.arange(qb, dtype=jnp.int32)
            dots = jax.lax.dot_general(
                qe, tile, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dmat = qn[:, None] + tile_n[None, :] - 2.0 * dots  # [qb, S]
            ids = base + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 1)
            bad = (ids >= n_real) | (ids == q_gid[:, None])  # padding + self
            dmat = jnp.where(bad, INF, dmat)
            neg_t, pos_t = jax.lax.top_k(-dmat, k)
            ids_t = jnp.take_along_axis(ids, pos_t, axis=1)
            nd = jax.lax.dynamic_slice(rd, (qs, 0), (qb, k))
            ni = jax.lax.dynamic_slice(ri, (qs, 0), (qb, k))
            md, mi = _merge_topk(nd, ni, -neg_t, ids_t, k)
            rd = jax.lax.dynamic_update_slice(rd, md, (qs, 0))
            ri = jax.lax.dynamic_update_slice(ri, mi, (qs, 0))
            return (rd, ri), None

        (run_d, run_i), _ = jax.lax.scan(q_block, (run_d, run_i), jnp.arange(n_qblocks))
        tile = jax.lax.ppermute(tile, axis, _ring_perm(ndev))
        tile_n = jax.lax.ppermute(tile_n, axis, _ring_perm(ndev))
        return (tile, tile_n, run_d, run_i), None

    init = (ebf, norms, jnp.full((s, k), INF), jnp.full((s, k), -1, jnp.int32))
    (_, _, run_d, run_i), _ = jax.lax.scan(ring, init, jnp.arange(ndev))
    run_i = jnp.where(run_d < INF, run_i, -1)
    return run_i, run_d


def ring_knn(emb: np.ndarray, k: int, mesh: Mesh, qb: int = 256) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN (squared L2, self excluded) with the corpus sharded over
    ``mesh``'s ``gp`` axis -> (ids i32[N, k], dists f32[N, k])."""
    ndev = int(mesh.shape["gp"])
    n = emb.shape[0]
    s = ((n + ndev - 1) // ndev + qb - 1) // qb * qb  # rows per shard, qb-divisible
    emb_p = _pad_rows(np.ascontiguousarray(emb, np.float32), s * ndev)
    row = NamedSharding(mesh, P("gp", None))
    emb_d = jax.device_put(emb_p, row)

    @functools.partial(jax.jit, static_argnames=())
    def run(e, n_real):
        body = shard_map(
            lambda esh, nr: _knn_local(esh, nr[0], k, qb, ndev, "gp"),
            mesh=mesh, in_specs=(P("gp", None), P()), out_specs=(P("gp", None), P("gp", None)),
            check_vma=False,
        )
        return body(e, n_real)

    ids, dists = run(emb_d, jnp.asarray([n], jnp.int32))
    return np.asarray(ids)[:n], np.asarray(dists)[:n]


def _gather_local(esh, ids, ndev: int, axis: str):
    """ids i32[B] (global, -1 allowed) -> emb bf16[B, D] via ring rotation."""
    s, d = esh.shape
    me = jax.lax.axis_index(axis)
    out = jnp.zeros((ids.shape[0], d), jnp.bfloat16)

    def ring(carry, t):
        tile, acc = carry
        owner = (me - t) % ndev
        local = ids - owner * s
        owned = (local >= 0) & (local < s) & (ids >= 0)
        vals = tile[jnp.clip(local, 0, s - 1)]
        acc = jnp.where(owned[:, None], vals, acc)
        tile = jax.lax.ppermute(tile, axis, _ring_perm(ndev))
        return (tile, acc), None

    (_, out), _ = jax.lax.scan(ring, (esh.astype(jnp.bfloat16), out), jnp.arange(ndev))
    return out


def _prune_local(esh, cand, n_real, r: int, alpha: float, keep_closest: int,
                 block: int, ndev: int, axis: str):
    """Per-device alpha-prune of local rows over ring-gathered candidates."""
    s, d = esh.shape
    c = cand.shape[1]
    me = jax.lax.axis_index(axis)
    ebf = esh.astype(jnp.bfloat16)
    n_blocks = s // block

    def blk(carry, bi):
        qs = bi * block
        cid = jax.lax.dynamic_slice(cand, (qs, 0), (block, c))
        pe = jax.lax.dynamic_slice(ebf, (qs, 0), (block, d))
        ce = _gather_local(esh, cid.reshape(-1), ndev, axis).reshape(block, c, d)
        pn = jnp.sum(jnp.square(pe.astype(jnp.float32)), axis=1)
        cn = jnp.sum(jnp.square(ce.astype(jnp.float32)), axis=-1)
        dots = jnp.einsum("bd,bcd->bc", pe, ce, preferred_element_type=jnp.float32)
        d_pc = jnp.where(cid >= 0, pn[:, None] + cn - 2.0 * dots, INF)
        cc = jnp.einsum("bcd,bed->bce", ce, ce, preferred_element_type=jnp.float32)
        d_cc = cn[:, :, None] + cn[:, None, :] - 2.0 * cc

        def step(sc, t):
            alive, dpc = sc
            j = jnp.argmin(jnp.where(alive, dpc, INF), axis=1)
            ok = jnp.take_along_axis(alive, j[:, None], axis=1)[:, 0] & (
                jnp.take_along_axis(dpc, j[:, None], axis=1)[:, 0] < INF
            )
            sel = jnp.where(ok, jnp.take_along_axis(cid, j[:, None], axis=1)[:, 0], -1)
            d_jx = jnp.take_along_axis(d_cc, j[:, None, None], axis=1)[:, 0, :]
            occl = alpha * d_jx <= dpc
            alive = jnp.where(t >= keep_closest, alive & ~occl, alive)
            alive = alive.at[jnp.arange(block), j].set(False)
            return (alive, dpc), sel

        (_, _), sels = jax.lax.scan(step, (cid >= 0, d_pc), jnp.arange(r))
        return carry, sels.T  # [block, R]

    _, out = jax.lax.scan(blk, None, jnp.arange(n_blocks))
    return out.reshape(s, r)


def sharded_build_graph(
    emb: np.ndarray, mesh: Mesh, r: int = 32, candidate_factor: int = 2,
    alpha: float = 1.2, keep_closest: int = -1, qb: int = 256, prune_block: int = 64,
) -> Tuple[np.ndarray, int]:
    """Mesh-sharded build -> (neighbors i32[N, R], medoid). Same contract as
    ops/graph.build_graph; the embedding matrix never exists on one device."""
    n, d = emb.shape
    ndev = int(mesh.shape["gp"])
    r = min(r, max(n - 1, 1))
    c = min(r * candidate_factor, max(n - 1, 1))
    if keep_closest < 0:
        keep_closest = r // 4

    t0 = time.time()
    knn_ids, _ = ring_knn(emb, c, mesh, qb=qb)
    logger.info("sharded build knn phase: %.1fs", time.time() - t0)

    t0 = time.time()
    blk = max(8, min(prune_block, 256))
    s = ((n + ndev - 1) // ndev + blk - 1) // blk * blk
    emb_p = _pad_rows(np.ascontiguousarray(emb, np.float32), s * ndev)
    cand_p = _pad_rows(knn_ids.astype(np.int32), s * ndev, fill=-1)
    row = NamedSharding(mesh, P("gp", None))
    emb_d = jax.device_put(emb_p, row)
    cand_d = jax.device_put(cand_p, row)

    @jax.jit
    def run(e, cd, n_real):
        body = shard_map(
            lambda esh, csh, nr: _prune_local(esh, csh, nr[0], r, float(alpha),
                                              keep_closest, blk, ndev, "gp"),
            mesh=mesh, in_specs=(P("gp", None), P("gp", None), P()),
            out_specs=P("gp", None), check_vma=False,
        )
        return body(e, cd, n_real)

    neighbors = np.asarray(run(emb_d, cand_d, jnp.asarray([n], jnp.int32)))[:n]
    logger.info("sharded build prune phase: %.1fs", time.time() - t0)

    out = _fill_reverse_edges(neighbors, np.random.default_rng(0))
    # medoid: distance to the global mean (host reduce over shards is fine —
    # [N, 1] distances are tiny next to [N, D])
    mean = emb.mean(axis=0, keepdims=True)
    medoid = int(np.argmin(((emb - mean) ** 2).sum(axis=1)))
    logger.info("sharded graph built: N=%d R=%d over %d devices (avg_deg=%.1f)",
                n, r, ndev, (out >= 0).mean() * r)
    return out, medoid
