"""Graph construction: batched exact k-NN + NN-descent + Vamana-style pruning.

TPU-native replacement for the reference's sequential C++ builders
(faiss ``IndexHNSWFlat.add`` — hnsw_backend.py:83-89 — and DiskANN's
``build_disk_float_index`` — diskann_backend.py:254-268). Sequential
point-by-point insertion is hostile to the MXU; instead the whole graph is
built in a few *batched* phases, each one jitted program:

  1. candidate k-NN — exact (blocked distance matmuls + running top-k, one
     scanned dispatch) for small corpora, NN-descent for large ones. The
     NN-descent round is a SINGLE device program per iteration: reverse-edge
     sampling (lexicographic sort + segmented rank + scatter), 2-hop gather,
     random escapes, per-row sort-dedup, and a `lax.scan` over node blocks
     doing the gather→einsum→top-k join. Only a scalar convergence counter
     crosses back to the host each round (the axon tunnel charges ~50 ms per
     dispatch, so per-block host syncs are the enemy).
  2. α-robust-prune (Vamana/DiskANN style), a `lax.scan` over node blocks —
     keeps a diverse degree-R out-neighborhood, which preserves hub
     reachability the way the reference's high-degree-preserving CSR
     conversion does (convert_to_csr.py:487-548)
  3. reverse-edge augmentation with degree cap (vectorized host pass)

Graph layout is fixed-degree ``i32[N, R]`` padded with -1 — the TPU-friendly
equivalent of the reference's CSR (SURVEY.md §7 design delta 2): every gather
is rectangular, so frontier expansion is a single dynamic-gather.

Diversity pruning uses (squared) L2 geometry; for cosine the vectors are
pre-normalized so this is monotone in cosine distance. (MIPS corpora are
handled via the same proxy; spherical augmentation is a later refinement.)
"""

from __future__ import annotations

import functools
import json
import logging
import os
import time
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _rss_gb() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20

INF = jnp.float32(3.4e38)
# Beyond this, build_graph switches to NN-descent. The exact O(N²·D) pass is
# pure streaming MXU work (~8 s at N=100K, 156 s at N=1M, k=64 on v5e with
# approx panel screening + two-stage merge) and beats NN-descent on both
# wall-clock and quality well into the millions: measured at 2.1M, six
# descent rounds cost 2200 s and left the join 60% unconverged (recall@3
# 0.58), while exact extrapolates to ~690 s. Descent owns the regime where
# N² stops being payable (~10 min/M² rows).
EXACT_KNN_MAX_N = 4 << 20

# Above this bf16 footprint the α-prune stops keeping the corpus matrix
# device-resident and instead decodes candidate embeddings on-chip from
# device-resident PQ codes (u8 [N, M]); at 60M x 384 the bf16 matrix is 46 GB
# vs 16 GB of v5e HBM, while M=64 codes are 3.8 GB. ~10 GB default leaves
# headroom for per-dispatch buffers + XLA workspace on a 16 GB chip.
PRUNE_EBF_MAX_BYTES = int(os.environ.get("LEANN_PRUNE_EBF_MAX_BYTES", str(10 << 30)))

# Per-array threshold above which spill-KNN scratch (the expanded [n*probe, k]
# candidate ids/dists) spills to disk-backed memmaps instead of anonymous RAM:
# at 60M x 2 probes x k=48 those are ~23 GB EACH, which together with the f16
# corpus matrix (46 GB) would overrun a 125 GB host. The merge pass is already
# blockwise, so page cache absorbs the access pattern.
SPILL_MEMMAP_BYTES = int(os.environ.get("LEANN_SPILL_MEMMAP_BYTES", str(8 << 30)))


def _prune_pq_m(d: int) -> int:
    """Divisor of ``d`` giving a subspace width in [3, 16], closest to 6;
    0 when none exists (caller zero-pads columns). choose_m (ops/pq.py) only
    probes d/8, d/4, d/16, d/2 and returns 1 for dims like 385 — fatal for
    the prune, where one global 256-point codebook occludes everything."""
    best, best_gap = 0, 99
    for m in range(1, d + 1):
        if d % m:
            continue
        ds = d // m
        if 3 <= ds <= 16 and abs(ds - 6) < best_gap:
            best, best_gap = m, abs(ds - 6)
    return best


def _big_empty(shape, dtype, scratch_dir: str, name: str):
    """np.empty, or a disk-backed w+ memmap when the array is huge and a
    scratch dir is available (see SPILL_MEMMAP_BYTES)."""
    nbytes = int(np.prod(shape)) * np.dtype(dtype).itemsize
    if scratch_dir and nbytes > SPILL_MEMMAP_BYTES:
        os.makedirs(scratch_dir, exist_ok=True)
        path = os.path.join(scratch_dir, name)
        logger.info("spill scratch -> %s (%.1f GB)", path, nbytes / 2**30)
        return np.lib.format.open_memmap(path, mode="w+", dtype=dtype, shape=tuple(shape))
    return np.empty(shape, dtype)


def _pad_rows(x: np.ndarray, np_total: int, fill=0) -> np.ndarray:
    if x.shape[0] == np_total:
        return x
    pad = np.full((np_total - x.shape[0],) + x.shape[1:], fill, x.dtype)
    return np.concatenate([x, pad])


def _bucket_rows(n: int, block: int) -> int:
    """Smallest block-multiple of {1, 1.25, 1.5, 1.75} x 2^i >= n. Bounds the
    number of distinct compiled programs across corpus sizes (axon compiles
    the big scan programs in minutes; padded compute is ~1% per extra row
    block) while wasting at most 25% padded rows."""
    if n <= block:
        return block
    v = block
    while v < n:
        for frac in (1.0, 1.25, 1.5, 1.75):
            cand = int(v * frac)
            cand = ((cand + block - 1) // block) * block
            if cand >= n:
                return cand
        v *= 2
    return v


# ---------------------------------------------------------------------------
# Exact k-NN (small corpora): one dispatch, scan over query blocks x tiles
# ---------------------------------------------------------------------------


def _panel_topk(neg_d: jnp.ndarray, k: int, approx_recall: float):
    """Top-k of -distance panels. lax.top_k over a [qb, 128K] panel costs
    ~140 ms and dominates the whole O(N²) pass (matmuls are ~1%);
    approx_max_k uses the TPU PartialReduce unit and is ~an order faster —
    0.99 recall is irrelevant noise for *candidate generation* feeding the
    α-prune. The exact path is two-stage: TPU top_k lowers to a row sort
    whose cost grows superlinearly in row width, so per-segment top-k over
    1024-wide rows + an exact merge of the segment winners is several
    times cheaper than one sort of the full panel and returns bit-equal
    results (every global top-k entry is in its segment's top-k)."""
    if approx_recall < 1.0:
        return jax.lax.approx_max_k(neg_d, k, recall_target=approx_recall)
    qb_, w = neg_d.shape
    seg = 1024
    if w <= 2 * seg or w % seg:
        return jax.lax.top_k(neg_d, k)
    n_seg = w // seg
    kseg = min(k, seg)
    sv, si = jax.lax.top_k(neg_d.reshape(qb_, n_seg, seg), kseg)
    si = si + jax.lax.broadcasted_iota(jnp.int32, si.shape, 1) * seg
    fv, fp = jax.lax.top_k(sv.reshape(qb_, n_seg * kseg), k)
    return fv, jnp.take_along_axis(si.reshape(qb_, n_seg * kseg), fp, axis=1)


def _knn_panel_impl() -> str:
    """Panel implementation for the exact-KNN sweeps: "xla" (dot_general +
    approx_max_k over the full [qb, tile] panel) or "pallas" (fused VMEM
    distance + bucket-argmin kernel — the raw panel never touches HBM, see
    ops/pallas_knn.py). "pallas_interpret" runs the kernel in interpret mode
    (CPU tests).

    The compiled (non-interpret) kernel faulted the shared TPU worker on its
    first real execution (docs/roadmap.md round-4 adjudication); until that
    is root-caused in a declared hardware-debug window it must not be one
    env-var typo away from crashing a live worker mid-build — request it
    explicitly as ``pallas_unsafe`` (ADVICE r4)."""
    v = os.environ.get("LEANN_KNN_PANEL", "xla")
    if v == "pallas":
        import jax as _jax

        if any(d.platform != "cpu" for d in _jax.devices()):
            raise RuntimeError(
                "LEANN_KNN_PANEL=pallas is gated on real TPU: the compiled "
                "kernel faulted the shared worker on first execution "
                "(docs/roadmap.md). Set LEANN_KNN_PANEL=pallas_unsafe to "
                "acknowledge the risk, or use pallas_interpret on CPU.")
    if v == "pallas_unsafe":
        return "pallas"
    return v


def _panel_winners(panel: str, qe, qn, cshard, ti, tile: int,
                   t_strip: int, col_start, col_end_real, q_start0,
                   k: int, approx_recall: float):
    """Pallas path of one [qb, tile] panel: fold to [qb, tile//128] bucket
    winners in VMEM, then top-k the winner row. Drop-in for the XLA
    dot_general + mask + _panel_topk body (identical output contract)."""
    from .pallas_knn import panel_bucketmin_call

    meta = jnp.stack([
        (ti * (tile // t_strip)).astype(jnp.int32),
        jnp.asarray(col_start, jnp.int32),
        jnp.asarray(col_end_real, jnp.int32),
        jnp.asarray(q_start0, jnp.int32),
    ])
    bv, bi = panel_bucketmin_call(
        meta, qe, cshard, tile=tile, t_strip=t_strip,
        interpret=(panel == "pallas_interpret"))
    # the kernel omits the |q|^2 per-row constant (ranking-neutral); restore
    # it so the merged running distances stay true squared L2
    bv = bv + qn[:, None].astype(jnp.float32)
    neg_t, pos_t = _panel_topk(-bv, k, approx_recall)
    return neg_t, jnp.take_along_axis(bi, pos_t, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "qb", "tile", "n_qblocks", "approx_recall", "panel", "t_strip"))
def _exact_knn_device(emb: jnp.ndarray, n_real: jnp.ndarray, q_start: jnp.ndarray,
                      k: int, qb: int, tile: int, n_qblocks: int,
                      approx_recall: float = 1.0, panel: str = "xla",
                      t_strip: int = 1024):
    """KNN for ``n_qblocks * qb`` query rows starting at ``q_start`` against
    the whole (padded) corpus. Chunked by the caller: a single dispatch
    covering all of N² runs for minutes at N=500K+, long enough to trip the
    tunneled-TPU watchdog (observed worker crash mid-build)."""
    np_total, d = emb.shape
    ebf = emb.astype(jnp.bfloat16)
    # f32 accumulation regardless of input dtype (f16 host matrices at scale
    # would otherwise accumulate norms in f16); no-op convert for f32 inputs
    norms = jnp.sum(jnp.square(emb.astype(jnp.float32)), axis=1)  # f32 [Np]
    n_tiles = np_total // tile

    def panel_topk(neg_d, k):
        return _panel_topk(neg_d, k, approx_recall)

    def q_block(carry, qi):
        qs = q_start + qi * qb
        qe = jax.lax.dynamic_slice(ebf, (qs, 0), (qb, d))
        qn = jax.lax.dynamic_slice(norms, (qs,), (qb,))
        q_ids = qs + jnp.arange(qb, dtype=jnp.int32)

        def t_body(tc, ti):
            run_d, run_i = tc
            if panel != "xla":
                neg_t, ids_t = _panel_winners(
                    panel, qe, qn, ebf, ti, tile, t_strip,
                    jnp.int32(0), n_real, qs, k, approx_recall)
                all_d = jnp.concatenate([run_d, -neg_t], axis=1)
                all_i = jnp.concatenate([run_i, ids_t], axis=1)
                neg, pos = jax.lax.top_k(-all_d, k)
                return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None
            ts = ti * tile
            te = jax.lax.dynamic_slice(ebf, (ts, 0), (tile, d))
            tn = jax.lax.dynamic_slice(norms, (ts,), (tile,))
            dots = jax.lax.dot_general(
                qe, te, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dmat = qn[:, None] + tn[None, :] - 2.0 * dots  # [qb, tile] squared l2
            ids = ts + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 1)
            bad = (ids >= n_real) | (ids == q_ids[:, None])  # pad + self
            dmat = jnp.where(bad, INF, dmat)
            neg_t, pos_t = panel_topk(-dmat, k)  # tile-local survivors first
            ids_t = jnp.take_along_axis(ids, pos_t, axis=1)
            all_d = jnp.concatenate([run_d, -neg_t], axis=1)
            all_i = jnp.concatenate([run_i, ids_t], axis=1)
            neg, pos = jax.lax.top_k(-all_d, k)  # [qb, 2k] merge stays exact
            return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

        init = (jnp.full((qb, k), INF), jnp.full((qb, k), -1, jnp.int32))
        (rd, ri), _ = jax.lax.scan(t_body, init, jnp.arange(n_tiles))
        ri = jnp.where(rd < INF, ri, -1)
        return carry, (ri, rd)

    _, (ids, dists) = jax.lax.scan(q_block, None, jnp.arange(n_qblocks))
    return ids.reshape(n_qblocks * qb, k), dists.reshape(n_qblocks * qb, k)


# Above this, the knn candidate phase screens each panel with approx_max_k
# (recall 0.99) before the exact 2k-merge; below, behavior is bit-exact.
APPROX_KNN_MIN_N = 200_000


def exact_knn(
    emb: np.ndarray, k: int, query_block: int = 1024, tile: int = 131072,
    approx_recall: "float | None" = None, rows_per_dispatch: int = 131072,
) -> Tuple[np.ndarray, np.ndarray]:
    """(Near-)exact k-NN (squared L2) of every row against the corpus, self
    excluded -> (ids i32[N, k], dists f32[N, k]). Blocked so HBM holds only
    [query_block, tile] distance panels; chunked into ≤``rows_per_dispatch``
    query rows per device dispatch so no single program runs long enough to
    trip the tunnel watchdog."""
    n, _ = emb.shape
    qb = max(8, min(query_block, 1024))
    tile = max(qb, (min(tile, ((n + qb - 1) // qb) * qb) // qb) * qb)
    np_total = _bucket_rows(n, tile)
    if approx_recall is None:
        approx_recall = 0.99 if n >= APPROX_KNN_MIN_N else 1.0
    panel, t_strip = _knn_panel_impl(), 1024
    if panel != "xla":
        from .pallas_knn import pick_t_strip

        t_strip = pick_t_strip(tile)
        if not t_strip:  # tile not 128-aligned — kernel can't strip it
            panel, t_strip = "xla", 1024
    emb_d = jnp.asarray(_pad_rows(emb, np_total))
    # bound each dispatch to ~2e10 query×corpus pairs (~15 s on v5e) so the
    # tunnel watchdog never sees a minutes-long program
    pair_cap_rows = max(qb, int(2e10 / max(np_total, 1)))
    rows_per_dispatch = max(qb, (min(rows_per_dispatch, pair_cap_rows) // qb) * qb)
    out_i = np.empty((np_total, k), np.int32)
    out_d = np.empty((np_total, k), np.float32)
    for qs in range(0, np_total, rows_per_dispatch):
        nb = min(rows_per_dispatch, np_total - qs) // qb
        ids, dists = _exact_knn_device(
            emb_d, jnp.int32(n), jnp.int32(qs), k, qb, tile, n_qblocks=nb,
            approx_recall=float(approx_recall), panel=panel, t_strip=t_strip,
        )
        out_i[qs : qs + nb * qb] = np.asarray(ids)
        out_d[qs : qs + nb * qb] = np.asarray(dists)
    return out_i[:n], out_d[:n]


# ---------------------------------------------------------------------------
# Column-sharded exact k-NN (beyond-HBM corpora): brute force on the MXU
# ---------------------------------------------------------------------------

# Per-shard bf16 budget for the column-resident corpus slab. ~7 GB leaves a
# 16 GB chip room for the [qb, tile] distance panel, the streamed query
# chunk, and XLA workspace. At 384-d this is ~9.5M columns per shard: one
# shard covers the whole 4.2M-10M band, 20M takes two, 60M seven.
EXACT_SHARD_BYTES = int(os.environ.get("LEANN_EXACT_SHARD_BYTES", str(7 << 30)))

# Intra-shard checkpoint cadence for exact_knn_sharded (seconds). One shard's
# query sweep spans hours at 10M+; the running top-k memmaps are flushed and
# the qchunk watermark recorded this often so a wedge resumes mid-shard.
QCKPT_SECS = float(os.environ.get("LEANN_EXACT_QCKPT_SECS", "300"))

# Query rows per sharded-KNN dispatch. 32K rows x ~10M columns is a ~20 s
# device program — long enough to amortize the tunnel round-trip, short
# enough not to look wedged to the remote worker (the small-N exact path
# documents ~15 s as the safe program length; 131072 rows measured 78 s/
# dispatch at 10M and the worker crashed mid-sweep more than once).
EXACT_QCHUNK = int(os.environ.get("LEANN_EXACT_QCHUNK", str(32768)))


@functools.partial(
    jax.jit,
    static_argnames=("k", "qb", "tile", "n_qblocks", "approx_recall", "q_in_shard",
                     "panel", "t_strip"),
)
def _exact_knn_shard_device(
    cshard: jnp.ndarray,   # bf16 [M, D] column slab (M a multiple of tile)
    cnorms: jnp.ndarray,   # f32 [M]
    qrows: jnp.ndarray,    # bf16 [n_qblocks*qb, D] (dummy [1, D] if q_in_shard)
    qnorms: jnp.ndarray,   # f32 [n_qblocks*qb]     (dummy [1]    if q_in_shard)
    run_d: jnp.ndarray,    # f32 [n_qblocks*qb, k] running best (INF-initialised)
    run_i: jnp.ndarray,    # i32 [n_qblocks*qb, k] running ids (global, -1 pads)
    q_start: jnp.ndarray,  # scalar i32 — global id of the first query row
    col_start: jnp.ndarray,   # scalar i32 — global id of the shard's first column
    n_real_cols: jnp.ndarray,  # scalar i32 — real (un-padded) columns in shard
    k: int, qb: int, tile: int, n_qblocks: int,
    approx_recall: float, q_in_shard: bool,
    panel: str = "xla", t_strip: int = 1024,
):
    """One (query-chunk × column-shard) pass: fold the shard's distances into
    the chunk's running top-k. The caller sweeps shards, feeding each chunk's
    state back in — after the last shard the state IS the exact global top-k.
    ``q_in_shard``: the query rows live inside ``cshard`` (always true when
    one shard holds the whole corpus) — slice them on device instead of
    uploading a second copy of every row."""
    d = cshard.shape[1]
    n_tiles = cshard.shape[0] // tile
    cbf = cshard.astype(jnp.bfloat16) if panel != "xla" else cshard

    def q_block(carry, qi):
        qs = qi * qb
        if q_in_shard:
            qe = jax.lax.dynamic_slice(cshard, (q_start + qs - col_start, 0), (qb, d))
            qn = jax.lax.dynamic_slice(cnorms, (q_start + qs - col_start,), (qb,))
        else:
            qe = jax.lax.dynamic_slice(qrows, (qs, 0), (qb, d))
            qn = jax.lax.dynamic_slice(qnorms, (qs,), (qb,))
        q_ids = q_start + qs + jnp.arange(qb, dtype=jnp.int32)
        rd0 = jax.lax.dynamic_slice(run_d, (qs, 0), (qb, k))
        ri0 = jax.lax.dynamic_slice(run_i, (qs, 0), (qb, k))

        def t_body(tc, ti):
            rd, ri = tc
            if panel != "xla":
                neg_t, ids_t = _panel_winners(
                    panel, qe.astype(cbf.dtype), qn, cbf, ti, tile,
                    t_strip, col_start, col_start + n_real_cols,
                    q_start + qs, k, approx_recall)
                all_d = jnp.concatenate([rd, -neg_t], axis=1)
                all_i = jnp.concatenate([ri, ids_t], axis=1)
                neg, pos = jax.lax.top_k(-all_d, k)
                return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None
            ts = ti * tile
            te = jax.lax.dynamic_slice(cshard, (ts, 0), (tile, d))
            tn = jax.lax.dynamic_slice(cnorms, (ts,), (tile,))
            dots = jax.lax.dot_general(
                qe, te, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dmat = qn[:, None] + tn[None, :] - 2.0 * dots  # [qb, tile] squared l2
            ids = col_start + ts + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 1)
            bad = (ids >= col_start + n_real_cols) | (ids == q_ids[:, None])
            dmat = jnp.where(bad, INF, dmat)
            neg_t, pos_t = _panel_topk(-dmat, k, approx_recall)
            ids_t = jnp.take_along_axis(ids, pos_t, axis=1)
            all_d = jnp.concatenate([rd, -neg_t], axis=1)
            all_i = jnp.concatenate([ri, ids_t], axis=1)
            neg, pos = jax.lax.top_k(-all_d, k)  # [qb, 2k] merge stays exact
            return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

        (rd, ri), _ = jax.lax.scan(t_body, (rd0, ri0), jnp.arange(n_tiles))
        return carry, (rd, ri)

    _, (rd, ri) = jax.lax.scan(q_block, None, jnp.arange(n_qblocks))
    return rd.reshape(n_qblocks * qb, k), ri.reshape(n_qblocks * qb, k)


def exact_knn_sharded(
    emb: np.ndarray, k: int, query_block: int = 1024, tile: int = 131072,
    qchunk: "int | None" = None, shard_bytes: "int | None" = None,
    approx_recall: "float | None" = None, checkpoint_dir: str = "",
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN for corpora whose bf16 matrix exceeds HBM: the matrix stays
    in host RAM; the device holds one bf16 *column shard* at a time while
    query chunks stream through, each carrying its running top-k state
    (ids+dists, merged on device). After the last shard the state is the
    exact global answer -> (ids i32[N, k], dists f32[N, k]).

    TPU-first replacement for approximate candidate generation at 10M-60M:
    brute force is ~N²·D·2 bf16 FLOPs — 7.7e16 at 10M×384, under 15 minutes
    of MXU time — while the window/cluster heuristic this replaces measured
    13% candidate recall at 10M (neighbors at ~45° co-assign rarely under
    65K fine-grained clusters with 2 probes). The reference never faces the
    choice: its HNSW inserts sequentially on CPU (hnsw_backend.py:83-89).

    ``checkpoint_dir``: the running state is flushed after every completed
    shard and a killed run resumes at the first unfinished shard (the state
    arrays double as the resume artifact)."""
    n, d = emb.shape
    qb = max(8, min(query_block, 1024))
    shard_bytes = shard_bytes or EXACT_SHARD_BYTES
    tile = max(qb, (min(tile, _bucket_rows(n, qb)) // qb) * qb)
    rows_per_shard = max(tile, (int(shard_bytes // (2 * d)) // tile) * tile)
    n_shards = (n + rows_per_shard - 1) // rows_per_shard
    qchunk = max(qb, ((qchunk or EXACT_QCHUNK) // qb) * qb)
    np_total = _bucket_rows(n, qb)
    if approx_recall is None:
        approx_recall = 0.99 if n >= APPROX_KNN_MIN_N else 1.0
    panel, t_strip = _knn_panel_impl(), 1024
    if panel != "xla":
        from .pallas_knn import pick_t_strip

        t_strip = pick_t_strip(tile)
        if not t_strip:
            panel, t_strip = "xla", 1024
        else:
            logger.info("exact_knn_sharded: pallas panel kernel, t_strip=%d", t_strip)

    # running state, host-resident between shards (memmapped when huge)
    sd_path = os.path.join(checkpoint_dir, "exknn_state_d.npy") if checkpoint_dir else ""
    si_path = os.path.join(checkpoint_dir, "exknn_state_i.npy") if checkpoint_dir else ""
    meta_path = os.path.join(checkpoint_dir, "exknn_state.json") if checkpoint_dir else ""
    key = _ckpt_key(emb, f"k{k}ex") if checkpoint_dir else ""
    shard_done = 0
    q_resume = 0  # completed qchunks within shard `shard_done` (mid-shard resume)
    run_d = run_i = None
    if checkpoint_dir and os.path.exists(meta_path):
        try:
            m = json.loads(open(meta_path).read())
            m_sh, m_q = m.get("shards_done", 0), m.get("qchunks_done", 0)
            # shard/qchunk geometry must match or the resume offsets are
            # meaningless (older metas omit the fields; same-config assumed)
            geom_ok = (m.get("rows_per_shard", rows_per_shard) == rows_per_shard
                       and m.get("qchunk", qchunk) == qchunk)
            if m.get("key") == key and geom_ok and (m_sh > 0 or m_q > 0) and m_sh <= n_shards:
                run_d = np.lib.format.open_memmap(sd_path, mode="r+")
                run_i = np.lib.format.open_memmap(si_path, mode="r+")
                if run_d.shape == (np_total, k) and run_i.shape == (np_total, k):
                    shard_done, q_resume = m_sh, m_q
                    logger.info("exact_knn_sharded: resumed at shard %d/%d qchunk %d",
                                shard_done, n_shards, q_resume)
                    # the crashed run may have flushed PARTIAL updates for
                    # shard `shard_done` beyond the last checkpointed qchunk;
                    # re-merging the same ids would duplicate them in the
                    # top-k (the device merge does not dedup). Purge that
                    # shard's ids from the not-yet-durable rows (the first
                    # q_resume qchunks are durable and keep their merges) and
                    # re-sort each row so the re-sweep starts clean.
                    if shard_done < n_shards:
                        cs_p = shard_done * rows_per_shard
                        ce_p = min(cs_p + rows_per_shard, n)
                        blk_p = 1 << 20
                        for s_p in range(q_resume * qchunk, np_total, blk_p):
                            di = np.asarray(run_d[s_p : s_p + blk_p])
                            ii = np.asarray(run_i[s_p : s_p + blk_p])
                            stale = (ii >= cs_p) & (ii < ce_p)
                            if stale.any():
                                di[stale] = float(INF)
                                ii[stale] = -1
                                o = np.argsort(di, axis=1, kind="stable")
                                run_d[s_p : s_p + blk_p] = np.take_along_axis(di, o, 1)
                                run_i[s_p : s_p + blk_p] = np.take_along_axis(ii, o, 1)
                else:
                    run_d = run_i = None
        except Exception as e:  # corrupt partial state from a killed run
            logger.warning("ignoring unreadable exknn state: %s", e)
            run_d = run_i = None
    if run_d is None:
        q_resume = 0
    if run_d is None:
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)
            run_d = np.lib.format.open_memmap(sd_path, mode="w+", dtype=np.float32, shape=(np_total, k))
            run_i = np.lib.format.open_memmap(si_path, mode="w+", dtype=np.int32, shape=(np_total, k))
        else:
            run_d = np.empty((np_total, k), np.float32)
            run_i = np.empty((np_total, k), np.int32)
        run_d[:] = float(INF)
        run_i[:] = -1

    # heartbeat logs between here and the first progress line: state init
    # (8 GB memmap fill at 20M), the f16->bf16 slab cast, and the multi-GB
    # tunnel upload together take tens of minutes at 20M+ — without them the
    # supervisor's log-stall watchdog reads healthy prep as a wedge
    logger.info("exact_knn_sharded: state ready (%d rows, %d shards of %d)",
                np_total, n_shards, rows_per_shard)
    t_all = time.time()
    for sh in range(shard_done, n_shards):
        cs, ce = sh * rows_per_shard, min((sh + 1) * rows_per_shard, n)
        m_pad = _bucket_rows(ce - cs, tile)
        cshard_h = np.zeros((m_pad, d), dtype=jnp.bfloat16)
        cshard_h[: ce - cs] = emb[cs:ce]
        logger.info("exact_knn_sharded: shard %d/%d uploading %.1f GB slab",
                    sh + 1, n_shards, m_pad * d * 2 / 1e9)
        cshard = jnp.asarray(cshard_h)
        del cshard_h
        cn = np.zeros(m_pad, np.float32)
        cn[: ce - cs] = np.einsum("ij,ij->i", emb[cs:ce], emb[cs:ce], dtype=np.float32)
        cnorms = jnp.asarray(cn)
        logger.info("exact_knn_sharded: shard %d/%d slab resident", sh + 1, n_shards)
        dummy_q = jnp.zeros((1, d), jnp.bfloat16)
        dummy_n = jnp.zeros((1,), jnp.float32)
        t0 = time.time()
        t_ckpt = time.time()

        # depth-1 dispatch pipeline: chunk i+1 is enqueued (uploads + program)
        # BEFORE chunk i's results are synced, so the host merge/upload gap
        # hides under device compute (np.asarray is the only real sync on
        # this platform; dispatches and transfers queue). Chunks partition
        # the query rows, so chunk i+1's state slice never depends on chunk
        # i's writeback. Depth stays 1: at most ~2 programs queued keeps the
        # tunnel watchdog happy (long queues look like wedged dispatches).
        pending = None  # (ci, qs, qe_, rd, ri) not yet written back

        def drain(p):
            nonlocal t_ckpt
            pci, pqs, pqe, prd, pri = p
            run_d[pqs:pqe] = np.asarray(prd)
            run_i[pqs:pqe] = np.asarray(pri)
            if pci % 16 == 15:
                logger.info("exact_knn_sharded: shard %d/%d rows %d/%d (%.0fs)",
                            sh + 1, n_shards, pqe, np_total, time.time() - t0)
            # intra-shard durability: a single shard spans hours at 10M+ and
            # the tunneled TPU worker wedges mid-phase; every few minutes the
            # completed (written-back) qchunks become the resume point
            if checkpoint_dir and time.time() - t_ckpt > QCKPT_SECS:
                run_d.flush(); run_i.flush()
                tmp = meta_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({"key": key, "shards_done": sh, "qchunks_done": pci + 1,
                               "rows_per_shard": rows_per_shard, "qchunk": qchunk}, f)
                os.replace(tmp, meta_path)
                t_ckpt = time.time()

        for ci, qs in enumerate(range(0, np_total, qchunk)):
            if sh == shard_done and ci < q_resume:
                continue  # durable from the checkpoint; re-merging would dup
            qe_ = min(qs + qchunk, np_total)
            nqb = (qe_ - qs) // qb
            # device-side query slice is only safe when every row of the chunk
            # exists inside the uploaded slab (incl. its zero padding)
            q_in = qs >= cs and qe_ <= cs + m_pad
            if q_in:
                qrows, qnorms = dummy_q, dummy_n
            else:
                qh = np.zeros((qe_ - qs, d), dtype=jnp.bfloat16)
                real = max(0, min(n, qe_) - qs)
                qh[:real] = emb[qs : qs + real]
                qrows = jnp.asarray(qh)
                qn_h = np.zeros(qe_ - qs, np.float32)
                qn_h[:real] = np.einsum("ij,ij->i", emb[qs : qs + real], emb[qs : qs + real], dtype=np.float32)
                qnorms = jnp.asarray(qn_h)
            rd, ri = _exact_knn_shard_device(
                cshard, cnorms, qrows, qnorms,
                jnp.asarray(run_d[qs:qe_]), jnp.asarray(run_i[qs:qe_]),
                jnp.int32(qs), jnp.int32(cs), jnp.int32(ce - cs),
                k=k, qb=qb, tile=tile, n_qblocks=nqb,
                approx_recall=float(approx_recall), q_in_shard=bool(q_in),
                panel=panel, t_strip=t_strip,
            )
            if pending is not None:
                drain(pending)
            pending = (ci, qs, qe_, rd, ri)
        if pending is not None:
            drain(pending)
        del cshard, cnorms
        if checkpoint_dir:
            run_d.flush(); run_i.flush()
            tmp = meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"key": key, "shards_done": sh + 1, "qchunks_done": 0,
                           "rows_per_shard": rows_per_shard, "qchunk": qchunk}, f)
            os.replace(tmp, meta_path)
        logger.info("exact_knn_sharded: shard %d/%d done in %.1fs (host rss %.1f GB)",
                    sh + 1, n_shards, time.time() - t0, _rss_gb())
    logger.info("exact_knn_sharded: %d shards, %.1fs total", n_shards, time.time() - t_all)
    out_i = np.asarray(run_i[:n])
    out_d = np.asarray(run_d[:n])
    out_i[out_d >= float(INF)] = -1
    if checkpoint_dir:
        for p in (sd_path, si_path, meta_path):
            try:
                os.remove(p)
            except OSError:
                pass
    return out_i, out_d


def exact_knn_rows(
    emb: np.ndarray, rows: np.ndarray, k: int, *,
    shard_bytes: "int | None" = None, tile: int = 131072,
    include_self: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact k-NN for a SUBSET of rows against the whole corpus — the sampled
    oracle that makes approximate candidate generators (nn_descent, spill)
    validatable at any scale: O(S·N·D) instead of the full pass's O(N²·D)
    (2048 rows at 60M × 384 is ~9.4e15 bf16 FLOPs, well under a minute of
    MXU time). Column shards stream through HBM exactly like
    :func:`exact_knn_sharded`; the S query rows stay device-resident carrying
    their running top-k. -> (ids i32[S, k], dists f32[S, k]) ascending; the
    row itself is excluded unless ``include_self``."""
    n, d = emb.shape
    rows = np.asarray(rows)
    s_n = int(rows.shape[0])
    kk = k if include_self else k + 1
    qb = int(min(1024, max(8, 1 << (max(s_n, 2) - 1).bit_length())))
    sp = _bucket_rows(s_n, qb)
    b32 = np.asarray(emb[rows], dtype=np.float32)
    qh = np.zeros((sp, d), dtype=jnp.bfloat16)
    qh[:s_n] = b32
    qn_h = np.zeros(sp, np.float32)
    qn_h[:s_n] = np.einsum("ij,ij->i", b32, b32)
    qrows, qnorms = jnp.asarray(qh), jnp.asarray(qn_h)
    run_d = jnp.full((sp, kk), INF, jnp.float32)
    run_i = jnp.full((sp, kk), -1, jnp.int32)

    shard_bytes = shard_bytes or EXACT_SHARD_BYTES
    tile = max(qb, (min(tile, _bucket_rows(n, qb)) // qb) * qb)
    rows_per_shard = max(tile, (int(shard_bytes // (2 * d)) // tile) * tile)
    for cs in range(0, n, rows_per_shard):
        ce = min(cs + rows_per_shard, n)
        m_pad = _bucket_rows(ce - cs, tile)
        cshard_h = np.zeros((m_pad, d), dtype=jnp.bfloat16)
        cshard_h[: ce - cs] = emb[cs:ce]
        cn = np.zeros(m_pad, np.float32)
        blk = 1 << 20
        for s in range(cs, ce, blk):
            cb = np.asarray(emb[s : min(s + blk, ce)], dtype=np.float32)
            cn[s - cs : s - cs + cb.shape[0]] = np.einsum("ij,ij->i", cb, cb)
        # q_start = n + 1 keeps the kernel's contiguous-id self-exclusion
        # inert (sampled rows are not contiguous); self is dropped below
        run_d, run_i = _exact_knn_shard_device(
            jnp.asarray(cshard_h), jnp.asarray(cn), qrows, qnorms, run_d, run_i,
            jnp.int32(n + 1), jnp.int32(cs), jnp.int32(ce - cs),
            k=kk, qb=qb, tile=tile, n_qblocks=sp // qb,
            approx_recall=1.0, q_in_shard=False, panel="xla", t_strip=1024,
        )
        logger.info("exact_knn_rows: shard rows %d-%d merged", cs, ce)
    out_d = np.array(run_d)[:s_n]  # np.array: jnp buffers are read-only views
    out_i = np.array(run_i)[:s_n]
    out_i[out_d >= float(INF)] = -1
    if not include_self:
        # stable sort on the self mask keeps ascending order while pushing
        # the row's own id (if present) past the kept k columns
        mask = out_i == rows[:, None].astype(np.int32)
        order = np.argsort(mask, axis=1, kind="stable")
        out_i = np.take_along_axis(out_i, order, 1)[:, :k]
        out_d = np.take_along_axis(out_d, order, 1)[:, :k]
    return out_i, out_d


# ---------------------------------------------------------------------------
# Cluster-bootstrapped init for NN-descent (large corpora)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_iters", "block"))
def _kmeans_full(x: jnp.ndarray, init: jnp.ndarray, n_valid: jnp.ndarray,
                 n_iters: int, block: int = 4096) -> jnp.ndarray:
    """Lloyd's k-means: x [S, D] (S a multiple of ``block``; rows >= n_valid
    are padding), init [K, D] -> [K, D].

    Assignments are computed per ``block`` inside a scan and accumulated with
    ``segment_sum`` — a materialized [S, K] one_hot matrix is ~17 GB at
    S=K=65536 (per Lloyd iteration), beyond single-chip HBM at exactly the
    scale where cluster bootstrap runs (n > EXACT_KNN_MAX_N). Peak here is the
    transient [block, K] distance tile. Padding rows are routed to an extra
    segment K and dropped."""
    s_total, d = x.shape
    k = init.shape[0]

    def step(c, _):
        cn = jnp.sum(c * c, axis=1)
        cbf = c.astype(jnp.bfloat16)

        def blk(carry, bi):
            xb = jax.lax.dynamic_slice(x, (bi * block, 0), (block, d))
            dots = jnp.dot(xb.astype(jnp.bfloat16), cbf.T, preferred_element_type=jnp.float32)
            a = jnp.argmin(cn[None, :] - 2.0 * dots, axis=1).astype(jnp.int32)
            rows = bi * block + jax.lax.iota(jnp.int32, block)
            return carry, jnp.where(rows < n_valid, a, k)

        _, a = jax.lax.scan(blk, None, jnp.arange(s_total // block))
        a = a.reshape(s_total)
        sums = jax.ops.segment_sum(x, a, num_segments=k + 1)[:k]
        counts = jax.ops.segment_sum(jnp.ones((s_total,), jnp.float32), a, num_segments=k + 1)[:k]
        return jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), c), None

    c, _ = jax.lax.scan(step, init, None, length=n_iters)
    return c


@functools.partial(jax.jit, static_argnames=("block",))
def _assign_clusters(emb: jnp.ndarray, cent: jnp.ndarray, block: int) -> jnp.ndarray:
    """emb [Np, D], cent [K, D] -> nearest-centroid id i32[Np] (blocked scan)."""
    np_total, d = emb.shape
    cn = jnp.sum(jnp.square(cent), axis=1)
    cbf = cent.astype(jnp.bfloat16)

    def blk(carry, bi):
        pe = jax.lax.dynamic_slice(emb, (bi * block, 0), (block, d))
        dots = jnp.dot(pe.astype(jnp.bfloat16), cbf.T, preferred_element_type=jnp.float32)
        return carry, jnp.argmin(cn[None, :] - 2.0 * dots, axis=1).astype(jnp.int32)

    _, out = jax.lax.scan(blk, None, jnp.arange(np_total // block))
    return out.reshape(np_total)


@functools.partial(jax.jit, static_argnames=("block", "p"))
def _assign_clusters_topk(emb: jnp.ndarray, cent: jnp.ndarray, block: int, p: int) -> jnp.ndarray:
    """emb [Np, D], cent [K, D] -> p nearest centroid ids i32[Np, p]."""
    np_total, d = emb.shape
    cn = jnp.sum(jnp.square(cent), axis=1)
    cbf = cent.astype(jnp.bfloat16)

    def blk(carry, bi):
        pe = jax.lax.dynamic_slice(emb, (bi * block, 0), (block, d))
        dots = jnp.dot(pe.astype(jnp.bfloat16), cbf.T, preferred_element_type=jnp.float32)
        _, top = jax.lax.top_k(-(cn[None, :] - 2.0 * dots), p)
        return carry, top.astype(jnp.int32)

    _, out = jax.lax.scan(blk, None, jnp.arange(np_total // block))
    return out.reshape(np_total, p)


@functools.partial(jax.jit, static_argnames=("k", "window"))
def _window_knn_device(ebf: jnp.ndarray, norms: jnp.ndarray, n_real: jnp.ndarray,
                       k: int, window: int):
    """Exact k-NN *within* consecutive row windows -> global ids i32[Np, k].
    Rows must already be ordered so windows are meaningful (cluster-sorted)."""
    np_total, d = ebf.shape

    def blk(carry, wi):
        s = wi * window
        we = jax.lax.dynamic_slice(ebf, (s, 0), (window, d))
        wn = jax.lax.dynamic_slice(norms, (s,), (window,))
        dots = jax.lax.dot_general(
            we, we, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dmat = wn[:, None] + wn[None, :] - 2.0 * dots
        ids = s + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 1)
        row_ids = s + jax.lax.broadcasted_iota(jnp.int32, dmat.shape, 0)
        bad = (ids >= n_real) | (ids == row_ids)
        dmat = jnp.where(bad, INF, dmat)
        neg, pos = jax.lax.top_k(-dmat, k)
        out_ids = jnp.where(-neg < INF, jnp.take_along_axis(ids, pos, axis=1), -1)
        return carry, (out_ids, -neg)

    _, (ids, dists) = jax.lax.scan(blk, None, jnp.arange(np_total // window))
    return ids.reshape(np_total, k), dists.reshape(np_total, k)


def cluster_window_init(
    emb: np.ndarray, k: int, window: int = 2048, seed: int = 0,
    points_per_cluster: int = 64, kmeans_sample: int = 65536, kmeans_iters: int = 8,
    n_probe: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """IVF-style k-NN init: spherical-ish k-means -> sort rows by cluster ->
    exact k-NN inside fixed windows of the sorted order.

    Random-init NN-descent mixes catastrophically slowly on clustered corpora
    (true-1NN candidate recall 0.33 after 16 rounds at N=100K); seeding each
    node with exact neighbors from its own cluster turns descent into a
    boundary-repair pass. All phases are batched matmuls.

    ``n_probe > 1`` (spill): each row enters the windows of its ``n_probe``
    nearest clusters, and its candidate lists are merged/deduped afterwards —
    boundary nodes see both sides of their cluster split, which is what a
    single-assignment window structurally misses. Cost scales linearly in
    n_probe; this is the 10M+ build path where exact KNN (O(N^2)) is out of
    reach. -> (ids, dists), both [N, k], dists = squared L2 (INF invalid)."""
    n, d = emb.shape
    rng = np.random.default_rng(seed)
    n_clusters = max(8, min(n // points_per_cluster, 65536))
    # the sample must be able to populate the clusters (>= 8 pts/cluster);
    # pow2 floor keeps the compiled kmeans shapes bucketed. f32: see
    # spill_knn_streamed (f16 inputs must not reach the k-means carry)
    s_target = min(n, max(kmeans_sample, 8 * n_clusters))
    s_count = 1 << (max(s_target, 2).bit_length() - 1)
    sample = np.asarray(emb[rng.choice(n, min(s_count, n), replace=False)], np.float32)
    init_c = sample[rng.choice(sample.shape[0], n_clusters, replace=False)]
    km_block = 4096
    s_pad = _bucket_rows(sample.shape[0], km_block)
    cent = _kmeans_full(jnp.asarray(_pad_rows(sample, s_pad)), jnp.asarray(init_c),
                        jnp.int32(sample.shape[0]), kmeans_iters, block=km_block)

    block = 8192
    np_total = _bucket_rows(n, block)
    emb_p = jnp.asarray(_pad_rows(emb, np_total))
    if n_probe <= 1:
        assign = np.asarray(_assign_clusters(emb_p, cent, block))[:n]
        order = np.argsort(assign, kind="stable").astype(np.int64)
        exp_orig = order  # each row appears once
    else:
        a2 = np.asarray(_assign_clusters_topk(emb_p, cent, block, n_probe))[:n]
        exp_cluster = a2.reshape(-1)  # row-major: probes of node i at i*p+j
        exp_node = np.repeat(np.arange(n, dtype=np.int64), n_probe)
        order = np.argsort(exp_cluster, kind="stable")
        exp_orig = exp_node[order]  # [n*p] original node per expanded row

    del emb_p  # frees the assign-phase device copy before the window pass

    ne = exp_orig.shape[0]
    np_w = _bucket_rows(ne, window)
    # Chunked window pass: windows are self-contained, so the sorted
    # (n_probe-expanded) matrix streams through the device one bf16 slice at
    # a time. Materialising it whole OOM'd HBM at scale — at 10M x 2 probes
    # the expanded copy alone is 15.4 GB (plus the still-live assign copy),
    # measured as a ResourceExhausted in the 2.1M validation run next to a
    # resident build slab (2026-08-20).
    slice_rows = max(window, ((1 << 21) // window) * window)
    ids_w = np.empty((ne, k), np.int32)
    dists_w = np.empty((ne, k), np.float32)
    for s in range(0, np_w, slice_rows):
        e = min(s + slice_rows, np_w)
        n_sl = min(e, ne) - s  # real rows in this slice
        if n_sl <= 0:
            break
        block_h = np.zeros((e - s, d), np.float32)
        block_h[:n_sl] = emb[exp_orig[s : s + n_sl]]
        i_sl, d_sl = _window_knn_device(
            jnp.asarray(block_h, jnp.bfloat16),
            jnp.asarray(np.einsum("ij,ij->i", block_h, block_h, dtype=np.float32)),
            jnp.int32(n_sl), k, window,
        )
        i_sl = np.asarray(i_sl)[:n_sl]
        ids_w[s : s + n_sl] = np.where(i_sl >= 0, i_sl + s, -1)
        dists_w[s : s + n_sl] = np.asarray(d_sl)[:n_sl]
    # map window-order ids back to original labels
    ids = np.where(ids_w >= 0, exp_orig[np.clip(ids_w, 0, ne - 1)], -1).astype(np.int32)

    if n_probe <= 1:
        out_ids = np.full((n, k), -1, np.int32)
        out_d = np.full((n, k), np.float32(3.4e38), np.float32)
        out_ids[exp_orig] = ids
        out_d[exp_orig] = dists_w
        return out_ids, out_d

    return _merge_spill_lists(ids, dists_w, exp_orig, n, n_probe, k)


def _merge_spill_lists(ids: np.ndarray, dists: np.ndarray, exp_orig: np.ndarray,
                       n: int, n_probe: int, k: int,
                       row_block: int = 1 << 20,
                       scratch_dir: str = "") -> Tuple[np.ndarray, np.ndarray]:
    """Merge each node's ``n_probe`` window-KNN candidate lists -> top-k
    dedup'd. ids/dists are [n*n_probe, k] in expanded-row order; exp_orig maps
    expanded rows to original node ids.

    Processed in ``row_block`` node blocks: the unblocked version materializes
    ~10 int64/[n, n_probe*k] temporaries (argsort returns intp), which at 10M
    nodes peaked >60 GB and OOM-killed the build — blocking caps the
    transient at a few GB regardless of n."""
    inf = np.float32(3.4e38)
    pos_by_node = np.argsort(exp_orig, kind="stable").reshape(n, n_probe)
    out_ids = _big_empty((n, k), np.int32, scratch_dir, "spill_out_ids.npy")
    out_d = _big_empty((n, k), np.float32, scratch_dir, "spill_out_d.npy")
    for s in range(0, n, row_block):
        e = min(s + row_block, n)
        pos = pos_by_node[s:e]
        ids_cat = ids[pos].reshape(e - s, n_probe * k)
        d_cat = dists[pos].reshape(e - s, n_probe * k).astype(np.float32)
        own = np.arange(s, e, dtype=np.int32)[:, None]
        self_or_pad = (ids_cat == own) | (ids_cat < 0)
        d_cat = np.where(self_or_pad, inf, d_cat)
        ids_cat = np.where(self_or_pad, -1, ids_cat)
        # dedup: group by id keeping the best distance first, kill repeats,
        # then resort by distance (three stable argsorts, all vectorized)
        o1 = np.argsort(d_cat, axis=1, kind="stable")
        ids1 = np.take_along_axis(ids_cat, o1, 1)
        d1 = np.take_along_axis(d_cat, o1, 1)
        o2 = np.argsort(ids1, axis=1, kind="stable")
        ids2 = np.take_along_axis(ids1, o2, 1)
        d2 = np.take_along_axis(d1, o2, 1)
        dup = np.zeros_like(ids2, dtype=bool)
        dup[:, 1:] = (ids2[:, 1:] == ids2[:, :-1]) & (ids2[:, 1:] >= 0)
        d2[dup] = inf
        ids2[dup] = -1
        o3 = np.argsort(d2, axis=1, kind="stable")
        bi = np.take_along_axis(ids2, o3, 1)[:, :k]
        bd = np.take_along_axis(d2, o3, 1)[:, :k]
        bi[bd >= inf] = -1
        out_ids[s:e] = bi
        out_d[s:e] = bd
    return out_ids, out_d


def spill_knn_streamed(
    emb: np.ndarray, k: int, window: int = 2048, n_probe: int = 2, seed: int = 0,
    points_per_cluster: int = 64, kmeans_sample: int = 65536, kmeans_iters: int = 8,
    chunk_rows: int = 1 << 19, scratch_dir: str = "",
) -> Tuple[np.ndarray, np.ndarray]:
    """``cluster_window_init`` for corpora that don't fit on-device: the
    embedding matrix stays in HOST RAM; the device sees one bf16 chunk at a
    time (assignment and window-KNN are both chunk-local by construction).
    This is the 10M+ candidate pass — at that scale even the bf16 matrix is
    ~half of HBM, and the f32 one doesn't fit at all.

    -> (ids i32[N, k], dists f32[N, k]) exactly like cluster_window_init."""
    n, d = emb.shape
    assert chunk_rows % window == 0
    rng = np.random.default_rng(seed)
    n_clusters = max(8, min(n // points_per_cluster, 65536))
    s_target = min(n, max(kmeans_sample, 8 * n_clusters))
    s_count = 1 << (max(s_target, 2).bit_length() - 1)
    # f32 sample: f16 host matrices would otherwise carry f16 centroids into
    # the k-means scan (carry dtype mismatch) and accumulate means in f16
    sample = np.asarray(emb[np.sort(rng.choice(n, min(s_count, n), replace=False))], np.float32)
    init_c = sample[rng.choice(sample.shape[0], n_clusters, replace=False)]
    km_block = 4096
    s_pad = _bucket_rows(sample.shape[0], km_block)
    cent = _kmeans_full(jnp.asarray(_pad_rows(sample, s_pad)), jnp.asarray(init_c),
                        jnp.int32(sample.shape[0]), kmeans_iters, block=km_block)

    # ---- top-p assignment, one fixed-shape dispatch per chunk -------------
    t0 = time.time()
    assign = np.empty((n, n_probe), np.int32)
    for ci, s in enumerate(range(0, n, chunk_rows)):
        e = min(s + chunk_rows, n)
        chunk = _pad_rows(np.asarray(emb[s:e], dtype=jnp.bfloat16), chunk_rows)
        assign[s:e] = np.asarray(
            _assign_clusters_topk(jnp.asarray(chunk), cent, min(8192, chunk_rows), n_probe)
        )[: e - s]
        if ci % 8 == 7:  # liveness for the multi-hour-run stall watchdog
            logger.info("spill_knn assign: %d/%d rows (%.0fs)", e, n, time.time() - t0)
    logger.info("spill_knn assign: %.1fs", time.time() - t0)

    # ---- expanded cluster order (host) ------------------------------------
    exp_cluster = assign.reshape(-1)
    exp_node = np.repeat(np.arange(n, dtype=np.int64), n_probe)
    order = np.argsort(exp_cluster, kind="stable")
    exp_orig = exp_node[order]
    del exp_cluster, exp_node, order
    ne = exp_orig.shape[0]

    # ---- window-KNN, streamed chunk by chunk ------------------------------
    t0 = time.time()
    ids = _big_empty((ne, k), np.int32, scratch_dir, "spill_exp_ids.npy")
    dists = _big_empty((ne, k), np.float32, scratch_dir, "spill_exp_d.npy")
    for ci, s in enumerate(range(0, ne, chunk_rows)):
        if ci % 8 == 7:
            logger.info("spill_knn window: %d/%d rows (%.0fs)", s, ne, time.time() - t0)
        e = min(s + chunk_rows, ne)
        rows = _pad_rows(np.asarray(emb[exp_orig[s:e]], dtype=jnp.bfloat16), chunk_rows)
        rows = jnp.asarray(rows)
        norms = jnp.sum(jnp.square(rows.astype(jnp.float32)), axis=1)
        ids_c, dists_c = _window_knn_device(rows, norms, jnp.int32(e - s), k, window)
        ids_c = np.asarray(ids_c)[: e - s]
        dists[s:e] = np.asarray(dists_c)[: e - s]
        # chunk-local ids -> global expanded positions -> original node ids
        ids[s:e] = np.where(
            ids_c >= 0, exp_orig[np.clip(ids_c, 0, e - s - 1) + s], -1
        ).astype(np.int32)
    logger.info("spill_knn window pass: %.1fs (%d chunks)",
                time.time() - t0, (ne + chunk_rows - 1) // chunk_rows)

    out = _merge_spill_lists(ids, dists, exp_orig, n, n_probe, k, scratch_dir=scratch_dir)
    if isinstance(ids, np.memmap):  # scratch expanded lists are dead post-merge
        for f in ("spill_exp_ids.npy", "spill_exp_d.npy"):
            try:
                os.remove(os.path.join(scratch_dir, f))
            except OSError:
                pass
        del ids, dists
    return out


# ---------------------------------------------------------------------------
# NN-descent (large corpora): one device program per iteration
# ---------------------------------------------------------------------------


def _reverse_edges_device(nbrs: jnp.ndarray, key: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Sampled reverse edges on device: up to ``cap`` in-edges per node.

    Each edge (i→j) throws its source at a random slot of row j; colliding
    writes lose (last-write-wins scatter). For a node with m in-edges the
    expected distinct count is cap·(1−(1−1/cap)^m) ≈ 0.63·cap at m=cap —
    plenty for NN-descent, which only needs a stochastic *sample* of the
    in-neighborhood each round. Chosen over the exact sort+segmented-rank
    formulation because XLA's large 1-D sort is catastrophically slow to
    compile on this platform (41 s at N=10K, >10 min at 50K), while a single
    scatter compiles flat."""
    np_total, k = nbrs.shape
    src = jax.lax.broadcasted_iota(jnp.int32, (np_total, k), 0).ravel()
    dst = nbrs.ravel()
    slot = jax.random.randint(key, dst.shape, 0, cap, dtype=jnp.int32)
    dst_safe = jnp.where(dst >= 0, dst, jnp.int32(np_total))  # OOB → dropped
    out = jnp.full((np_total, cap), -1, jnp.int32)
    return out.at[dst_safe, slot].set(src, mode="drop")


@functools.partial(
    jax.jit, static_argnames=("k", "k2", "h", "n_rand", "block", "n_blocks")
)
def _nn_descent_iter(
    ebf: jnp.ndarray,       # bf16 [Np, D]
    norms: jnp.ndarray,     # f32 [Np]
    nbrs: jnp.ndarray,      # i32 [Np, k], -1 pads
    rev: jnp.ndarray,       # i32 [Np, k] sampled reverse edges (own dispatch)
    old_dists: jnp.ndarray, # f32 [Np or chunk, k] sorted ascending (INF on first round)
    n_real: jnp.ndarray,    # scalar i32
    row_start: jnp.ndarray, # scalar i32 — first row of this dispatch chunk
    od_base: jnp.ndarray,   # scalar i32 — global row of old_dists[0] (0 = full array)
    key: jnp.ndarray,
    k: int,
    k2: int,
    h: int,
    n_rand: int,
    block: int,
    n_blocks: int,
):
    """One NN-descent round as one device program.

    Everything proportional to N runs inside the fixed-shape `lax.scan` body
    (candidate assembly, dedup row-sort, gather→einsum→top-k join), so the
    compiled program is independent of corpus size: on this platform compile
    time scales brutally with the size of *global* ops (a full-corpus 1-D
    sort took 41 s to compile at N=10K and >10 min at 50K), while scan
    bodies compile once."""
    np_total, d = ebf.shape
    _, k_hop1, k_hop2, k_rand = jax.random.split(key, 4)

    # 2-hop seeds: the h//2 CLOSEST neighbor columns (rows are sorted by
    # distance — closest-first join is what makes NN-descent converge on
    # clustered data) plus h//2 random columns for exploration; reverse-edge
    # seeds stay random (reverse rows are unsorted).
    n_close = max(1, h // 2)
    cols1 = jnp.concatenate([
        jnp.arange(n_close, dtype=jnp.int32),
        jax.random.permutation(k_hop1, k - n_close)[: h - n_close] + n_close,
    ])
    cols2 = jax.random.permutation(k_hop2, k)[:h]

    def blk(carry, bi):
        s = row_start + bi * block
        nb = jax.lax.dynamic_slice(nbrs, (s, 0), (block, k))
        rv = jax.lax.dynamic_slice(rev, (s, 0), (block, k))
        od = jax.lax.dynamic_slice(old_dists, (s - od_base, 0), (block, k))
        pe = jax.lax.dynamic_slice(ebf, (s, 0), (block, d))
        pn = jax.lax.dynamic_slice(norms, (s,), (block,))
        hop_seed = jnp.concatenate(
            [jnp.take(nb, cols1, axis=1), jnp.take(rv, cols2, axis=1)], axis=1
        )  # [B, 2h]
        seed_safe = jnp.clip(hop_seed, 0, np_total - 1)
        # full NN-descent local join needs BOTH directions through each seed:
        # forward (seed's neighbors) and reverse (nodes listing the seed) —
        # forward-only mixing converges measurably slower
        two = jnp.concatenate(
            [nbrs[seed_safe, :k2], rev[seed_safe, :k2]], axis=1
        ).reshape(block, 4 * h * k2)
        two = jnp.where(jnp.repeat(hop_seed < 0, 2 * k2, axis=1), -1, two)
        # random escapes for corpora with weak cluster structure (folded on
        # the global block index so dispatch chunks don't repeat patterns)
        rand = jax.random.randint(
            jax.random.fold_in(k_rand, s // block), (block, n_rand), 0,
            jnp.maximum(n_real, 1), dtype=jnp.int32,
        )
        cand = jnp.concatenate([nb, rv, two, rand], axis=1)  # [B, C]
        row_ids = s + jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
        # pad rows (>= n_real, zero embeddings) must never become candidates:
        # their zero vectors look closer than real neighbors and crowd them out
        cand = jnp.where((cand == row_ids) | (cand >= n_real), -1, cand)
        # dedup: candidate order is irrelevant to top-k — sort rows, blank
        # repeats (duplicates would waste top-k slots and corrupt the output)
        cand = jnp.sort(cand, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((block, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
        )
        cid = jnp.where(dup, -1, cand)

        cemb = ebf[jnp.clip(cid, 0, np_total - 1)]  # [B, C, D]
        dots = jnp.einsum("bd,bcd->bc", pe, cemb, preferred_element_type=jnp.float32)
        dist = pn[:, None] + norms[jnp.clip(cid, 0, np_total - 1)] - 2.0 * dots
        dist = jnp.where(cid >= 0, dist, INF)
        neg, pos = jax.lax.top_k(-dist, k)
        ids_b = jnp.take_along_axis(cid, pos, axis=1)
        ids_b = jnp.where(-neg < INF, ids_b, -1)
        # pad rows stay neighborless so they never emit reverse edges
        real = (row_ids[:, :1] < n_real)
        ids_b = jnp.where(real, ids_b, -1)
        # progress: slots whose (sorted) distance improved by >0.1% relative.
        # top_k returns sorted rows, so this is sort-free; the threshold keeps
        # tie-noise churn (abundant in clustered corpora) out of the signal.
        chg = jnp.sum((-neg < od * (1.0 - 1e-3)) & real)
        return carry + chg, (ids_b, -neg)

    changed, (ids, dists) = jax.lax.scan(
        blk, jnp.int32(0), jnp.arange(n_blocks)
    )
    return ids.reshape(n_blocks * block, k), dists.reshape(n_blocks * block, k), changed


def nn_descent(
    emb: np.ndarray,
    k: int,
    n_iters: int = 16,
    block: int = 2048,
    seed: int = 0,
    min_update_frac: float = 0.03,
    bootstrap: str = "cluster",  # cluster | random
    checkpoint_dir: str = "",
) -> Tuple[np.ndarray, np.ndarray]:
    """Approximate k-NN graph by NN-descent — O(N·C·D) per iteration instead
    of the exact O(N²·D), with every distance batch an MXU einsum and every
    iteration ONE device dispatch (+1 scalar readback for convergence).
    Candidates per round: current neighbors + sampled reverse edges + sampled
    closest-first 2-hop + random escapes. ``bootstrap="cluster"`` seeds rows
    with exact within-cluster neighbors (cluster_window_init) so descent only
    repairs cluster boundaries — random init needs ~10x the rounds on
    clustered corpora and still converges worse.
    ``checkpoint_dir``: persist (nbrs, dists, iter, prev_changed) after a
    completed round (rate-limited to one write per QCKPT_SECS — at 60M each
    state pair is ~30 GB of IO) and resume from the last persisted round on
    re-run. The per-round RNG is ``fold_in(base_key, it)``, so a resumed run
    replays the same candidate stream the killed run would have seen.

    -> (ids i32[N, k], dists f32[N, k])."""
    n, d = emb.shape
    h = min(k, max(4, 512 // max(k, 1)))   # 2-hop seed columns
    k2 = min(k, 32)                         # neighbors gathered per seed
    n_rand = max(4, k // 4)
    # cap the block so the [block, C, D] bf16 gather stays ~256 MB
    c_est = 2 * k + 4 * h * k2 + n_rand
    mem_cap = max(64, int((256 << 20) / max(c_est * d * 2, 1)))
    block = max(8, (min(block, mem_cap) // 8) * 8)  # sublane-aligned
    np_total = _bucket_rows(n, block)

    # intra-phase resume (ADVICE r3): a worker wedge mid-descent at 60M
    # scale restarts from the last persisted round, not from the bootstrap
    nd_key = ""
    start_it, prev_changed0 = 0, None
    nd_i_path = nd_d_path = nd_meta_path = ""
    nbrs0 = dists0 = None
    if checkpoint_dir:
        import json as _json

        os.makedirs(checkpoint_dir, exist_ok=True)
        nd_key = _ckpt_key(emb, f"k{k}nd_{bootstrap}_s{seed}")
        nd_i_path = os.path.join(checkpoint_dir, "nd_state_i.npy")
        nd_d_path = os.path.join(checkpoint_dir, "nd_state_d.npy")
        nd_meta_path = os.path.join(checkpoint_dir, "nd_state.json")
        if os.path.exists(nd_meta_path):
            try:
                m = _json.load(open(nd_meta_path))
            except Exception:
                m = {}
            if m.get("key") == nd_key and os.path.exists(nd_i_path) \
                    and os.path.exists(nd_d_path):
                nbrs0 = np.load(nd_i_path)
                dists0 = np.load(nd_d_path)
                start_it = int(m.get("iter", 0))
                prev_changed0 = m.get("prev_changed")
                logger.info("nn_descent: resumed at iter %d from %s",
                            start_it, nd_meta_path)

    rng = np.random.default_rng(seed)
    if nbrs0 is not None:
        pass  # resumed state above
    elif bootstrap == "cluster" and n > 4096:
        t0 = time.time()
        # 2-probe spill: boundary nodes see both sides of their cluster split
        # (measured init recall@10 0.61 -> 0.90 on a clustered corpus), so
        # descent starts from repair-only territory
        nbrs0, dists0 = cluster_window_init(emb, k, seed=seed, n_probe=2)
        logger.info("nn_descent cluster init: %.1fs", time.time() - t0)
        if checkpoint_dir:
            # the bootstrap is the longest un-checkpointed stretch (~1-2 h at
            # 10M); persist it as the iter-0 state so a worker wedge during
            # the first round resumes here instead of re-clustering
            import json as _json

            np.save(nd_i_path + ".tmp.npy", nbrs0)
            np.save(nd_d_path + ".tmp.npy", dists0)
            os.replace(nd_i_path + ".tmp.npy", nd_i_path)
            os.replace(nd_d_path + ".tmp.npy", nd_d_path)
            tmp = nd_meta_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"key": nd_key, "iter": 0, "prev_changed": None}, f)
            os.replace(tmp, nd_meta_path)
    else:
        nbrs0 = rng.integers(0, n - 1, size=(n, k)).astype(np.int32)
        nbrs0 = np.where(nbrs0 >= np.arange(n)[:, None], nbrs0 + 1, nbrs0)  # no self
        dists0 = np.full((n, k), np.float32(3.4e38), np.float32)
    # device-state budget: the resident set is ebf (2 B/elem) + nbrs/rev/
    # dists (12 B per slot) + the on-device chunk accumulation of the next
    # round's ids+dists (8 B per slot) — 21.5 GB at 10M×384/k=64 against the
    # v5e's 16 GB HBM. Above the budget, dists and the round outputs live
    # HOST-side: old_dists streams in per dispatch (the iter only ever reads
    # its own rows), outputs are pulled home per chunk, and nbrs is
    # re-uploaded once per round after the old copy is deleted — device peak
    # drops to ebf + nbrs + rev (~13.6 GB at 10M).
    est_dev = np_total * d * 2 + np_total * k * 20
    budget = float(os.environ.get("LEANN_DESCENT_HBM_BUDGET", 12.5e9))
    host_state = est_dev > budget
    if host_state:
        logger.info("nn_descent: host-resident state (est %.1f GB device > "
                    "budget %.1f GB)", est_dev / 1e9, budget / 1e9)
    nbrs_h = _pad_rows(np.asarray(nbrs0, np.int32), np_total, fill=-1)
    dists_h = _pad_rows(np.asarray(dists0, np.float32), np_total,
                        fill=np.float32(3.4e38))
    nbrs = jnp.asarray(nbrs_h)
    # host-side bf16 cast + norms: uploading a padded f32/f16 copy only to
    # cast it on device doubles the HBM high-water (15.4 GB transient at
    # 10M × 384 f16) — near-HBM corpora need the slab to arrive bf16
    ebf_h = np.zeros((np_total, d), dtype=jnp.bfloat16)
    norms_h = np.zeros(np_total, np.float32)
    for s in range(0, n, 1 << 20):
        b32 = np.asarray(emb[s : s + (1 << 20)], dtype=np.float32)
        ebf_h[s : s + b32.shape[0]] = b32
        norms_h[s : s + b32.shape[0]] = np.einsum("ij,ij->i", b32, b32)
    ebf = jnp.asarray(ebf_h)
    del ebf_h
    norms = jnp.asarray(norms_h)
    dists = None if host_state else jnp.asarray(dists_h)
    base_key = jax.random.key(seed)
    rev_jit = jax.jit(_reverse_edges_device, static_argnames=("cap",))
    # chunk each round's row sweep so no dispatch outlives the tunnel watchdog
    rows_per_dispatch = max(block, (131072 // block) * block)
    prev_changed = prev_changed0
    t_ckpt = time.time()
    for it in range(start_it, n_iters):
        t0 = time.time()
        rev_key, it_key = jax.random.split(jax.random.fold_in(base_key, it))
        rev = rev_jit(nbrs, rev_key, cap=k)
        if host_state:
            changed = 0
            for s in range(0, np_total, rows_per_dispatch):
                rows = min(rows_per_dispatch, np_total - s)
                od_c = jnp.asarray(dists_h[s : s + rows])
                ids_c, d_c, chg = _nn_descent_iter(
                    ebf, norms, nbrs, rev, od_c, jnp.int32(n), jnp.int32(s),
                    jnp.int32(s), it_key,
                    k=k, k2=k2, h=h, n_rand=n_rand, block=block,
                    n_blocks=rows // block,
                )
                # pull each chunk home immediately (the per-chunk sync is the
                # point: nothing proportional to N accumulates on device);
                # the device nbrs stays the OLD round's until the swap below
                nbrs_h[s : s + rows] = np.asarray(ids_c)
                dists_h[s : s + rows] = np.asarray(d_c)
                changed += int(np.asarray(chg))
            # swap: delete the old device nbrs/rev BEFORE uploading the new
            # round's nbrs so two [Np, k] copies never coexist in HBM
            nbrs.delete()
            rev.delete()
            nbrs = jnp.asarray(nbrs_h)
        else:
            id_chunks, d_chunks, chgs = [], [], []
            for s in range(0, np_total, rows_per_dispatch):
                nb_blocks = min(rows_per_dispatch, np_total - s) // block
                ids_c, d_c, chg = _nn_descent_iter(
                    ebf, norms, nbrs, rev, dists, jnp.int32(n), jnp.int32(s),
                    jnp.int32(0), it_key,
                    k=k, k2=k2, h=h, n_rand=n_rand, block=block, n_blocks=nb_blocks,
                )
                id_chunks.append(ids_c)
                d_chunks.append(d_c)
                chgs.append(chg)
            # chunk outputs stay on device; one scalar sync per round
            nbrs = id_chunks[0] if len(id_chunks) == 1 else jnp.concatenate(id_chunks)
            dists = d_chunks[0] if len(d_chunks) == 1 else jnp.concatenate(d_chunks)
            changed = int(np.asarray(jnp.stack(chgs).sum()))
        logger.info(
            "nn_descent iter %d: %.3f%% slots improved (%.2fs)",
            it, 100 * changed / (n * k), time.time() - t0,
        )
        if checkpoint_dir and time.time() - t_ckpt > QCKPT_SECS:
            import json as _json

            np.save(nd_i_path + ".tmp.npy",
                    nbrs_h if host_state else np.asarray(nbrs))
            np.save(nd_d_path + ".tmp.npy",
                    dists_h if host_state else np.asarray(dists))
            os.replace(nd_i_path + ".tmp.npy", nd_i_path)
            os.replace(nd_d_path + ".tmp.npy", nd_d_path)
            tmp = nd_meta_path + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"key": nd_key, "iter": it + 1,
                            "prev_changed": changed}, f)
            os.replace(tmp, nd_meta_path)
            t_ckpt = time.time()
        # stop when the join has both PEAKED and dropped below the floor:
        # on clustered corpora the improvement fraction *rises* through a
        # connectivity phase transition (measured at 2.1M: 4.7% -> 61% over
        # 6 rounds) before collapsing, so a bare threshold would quit while
        # the cascade is still building
        if changed < min_update_frac * n * k and (
            prev_changed is None or changed < prev_changed
        ):
            break
        prev_changed = changed
    if checkpoint_dir:  # done — the caller persists ckpt_knn.npy next
        for p in (nd_i_path, nd_d_path, nd_meta_path):
            try:
                os.remove(p)
            except OSError:
                pass
    if host_state:
        return nbrs_h[:n], dists_h[:n]
    return np.asarray(nbrs)[:n], np.asarray(dists)[:n]


# ---------------------------------------------------------------------------
# Vamana robust prune: one dispatch, scan over node blocks
# ---------------------------------------------------------------------------


def _prune_select(cid, d_pc, d_cc, r: int, alpha: float, keep_closest: int):
    """Greedy α-occlusion selection shared by every prune kernel.

    cid i32[B, C] (-1 invalid), d_pc f32[B, C] node→candidate distances,
    d_cc f32[B, C, C] candidate↔candidate distances -> selected ids i32[B, R].
    The first ``keep_closest`` picks skip the occlusion rule (docstring of
    :func:`_robust_prune_device`)."""
    b = cid.shape[0]

    def step(sc, t):
        alive, dpc = sc
        j = jnp.argmin(jnp.where(alive, dpc, INF), axis=1)  # [B]
        ok = jnp.take_along_axis(alive, j[:, None], axis=1)[:, 0] & (
            jnp.take_along_axis(dpc, j[:, None], axis=1)[:, 0] < INF
        )
        sel = jnp.where(ok, jnp.take_along_axis(cid, j[:, None], axis=1)[:, 0], -1)
        # occlusion: drop x with alpha * d(c, x) <= d(p, x)
        d_jx = jnp.take_along_axis(d_cc, j[:, None, None], axis=1)[:, 0, :]
        occl = alpha * d_jx <= dpc
        alive = jnp.where(t >= keep_closest, alive & ~occl, alive)
        alive = alive.at[jnp.arange(b), j].set(False)
        return (alive, dpc), sel

    (_, _), sels = jax.lax.scan(step, (cid >= 0, d_pc), jnp.arange(r))
    return sels.T  # [B, R]


@functools.partial(jax.jit, static_argnames=("r", "alpha", "keep_closest", "block", "n_blocks"))
def _robust_prune_device(
    ebf: jnp.ndarray,      # bf16 [Np, D]
    norms: jnp.ndarray,    # f32 [Np]
    cand: jnp.ndarray,     # i32 [n_blocks*block, C] — THIS dispatch's rows only
    row_start: jnp.ndarray,  # scalar i32 — first row of this dispatch chunk
    r: int,
    alpha: float,
    keep_closest: int,
    block: int,
    n_blocks: int,
):
    """Vamana robust prune -> selected ids i32[Np, R].

    The first ``keep_closest`` picks skip the occlusion rule: tightly clustered
    corpora (near-duplicate chunks) otherwise lose their nearest neighbors to
    diversity pruning, which measurably hurts top-k recall — keeping the
    closest quarter restores it while α-pruning still supplies long-range
    edges (the reference's high-degree/hub-preservation concern,
    convert_to_csr.py:487-548, solved TPU-style)."""
    np_total, d = ebf.shape
    c = cand.shape[1]

    def blk(carry, bi):
        s = row_start + bi * block
        # cand holds only this dispatch's rows (uploaded per dispatch,
        # ~24 MB each): keeping the full [Np, C] candidate matrix device-
        # resident costs 3-4 GB of HBM at 16M+ rows — HBM the bf16 matrix
        # needs. cid values themselves index the full ebf.
        cid = jax.lax.dynamic_slice(cand, (bi * block, 0), (block, c))
        pe = jax.lax.dynamic_slice(ebf, (s, 0), (block, d))
        pn = jax.lax.dynamic_slice(norms, (s,), (block,))
        safe = jnp.clip(cid, 0, np_total - 1)
        cemb = ebf[safe]  # [B, C, D]
        cn = norms[safe]
        dots = jnp.einsum("bd,bcd->bc", pe, cemb, preferred_element_type=jnp.float32)
        d_pc = pn[:, None] + cn - 2.0 * dots
        d_pc = jnp.where(cid >= 0, d_pc, INF)
        cc_dots = jnp.einsum(
            "bcd,bed->bce", cemb, cemb, preferred_element_type=jnp.float32
        )
        d_cc = cn[:, :, None] + cn[:, None, :] - 2.0 * cc_dots  # [B, C, C]
        return carry, _prune_select(cid, d_pc, d_cc, r, alpha, keep_closest)

    _, out = jax.lax.scan(blk, None, jnp.arange(n_blocks))
    return out.reshape(n_blocks * block, r)


@functools.partial(jax.jit, static_argnames=("r", "alpha", "keep_closest", "block", "n_blocks"))
def _robust_prune_pq_device(
    codes: jnp.ndarray,      # u8 [Np, M] — whole corpus, device-resident
    codebooks: jnp.ndarray,  # f32 [M, 256, ds] (plain PQ, M*ds = D)
    pe: jnp.ndarray,         # bf16 [n_blocks*block, D] — exact rows, THIS dispatch
    cand: jnp.ndarray,       # i32 [n_blocks*block, C] — THIS dispatch's rows
    r: int,
    alpha: float,
    keep_closest: int,
    block: int,
    n_blocks: int,
):
    """Beyond-HBM α-prune: candidate embeddings decode on-chip from PQ codes.

    At 20M+ x 384 even the bf16 corpus matrix outgrows a single chip's HBM
    (15 GB at 20M, 46 GB at 60M vs 16 GB on v5e), but u8 codes at ds=6 are
    12.8x smaller — so the corpus stays on device as codes, the dispatch's own
    rows arrive exact (uploaded per dispatch, ~100 MB), and each scan block
    reconstructs its [B, C, D] candidate tensor from per-subspace table
    gathers. Node→candidate distances mix exact (node side) with quantized
    (candidate side); candidate↔candidate occlusion is quantized both sides —
    the same asymmetric-distance trade DiskANN's beyond-RAM build makes with
    its PQ-screened prune (reference diskann_backend.py build path, PQ pivots
    feeding the Vamana pass)."""
    np_total = codes.shape[0]
    m, k256, ds = codebooks.shape
    d = m * ds
    c = cand.shape[1]
    cbf = codebooks.astype(jnp.bfloat16)  # tables live in VMEM per gather

    from .pq import decode_pq

    def blk(carry, bi):
        cid = jax.lax.dynamic_slice(cand, (bi * block, 0), (block, c))
        p = jax.lax.dynamic_slice(pe, (bi * block, 0), (block, d))
        pn = jnp.sum(jnp.square(p.astype(jnp.float32)), axis=1)
        safe = jnp.clip(cid, 0, np_total - 1)
        ccodes = codes[safe]  # [B, C, M]
        cemb = decode_pq(cbf, ccodes)  # bf16 [B, C, D] via per-subspace gathers
        cn = jnp.sum(jnp.square(cemb.astype(jnp.float32)), axis=2)
        dots = jnp.einsum("bd,bcd->bc", p, cemb, preferred_element_type=jnp.float32)
        d_pc = jnp.where(cid >= 0, pn[:, None] + cn - 2.0 * dots, INF)
        cc_dots = jnp.einsum(
            "bcd,bed->bce", cemb, cemb, preferred_element_type=jnp.float32
        )
        d_cc = cn[:, :, None] + cn[:, None, :] - 2.0 * cc_dots
        return carry, _prune_select(cid, d_pc, d_cc, r, alpha, keep_closest)

    _, out = jax.lax.scan(blk, None, jnp.arange(n_blocks))
    return out.reshape(n_blocks * block, r)


@functools.partial(jax.jit, static_argnames=("r", "alpha", "keep_closest"))
def robust_prune_explicit(
    p_emb: jnp.ndarray,    # f32 [B, D] node embeddings
    cand_ids: jnp.ndarray, # i32 [B, C] (-1 = invalid)
    cand_emb: jnp.ndarray, # f32 [B, C, D]
    r: int,
    alpha: float,
    keep_closest: int,
):
    """Vamana robust prune over explicit candidate embeddings -> i32[B, R].

    Incremental-insert variant of `_robust_prune_device`: candidates come
    from a beam search over the live index (whose embeddings may only exist
    transiently, recomputed from tokens), so the caller passes the gathered
    [B, C, D] block instead of corpus-table indices."""
    b, c, d = cand_emb.shape
    pe = p_emb.astype(jnp.bfloat16)
    ce = cand_emb.astype(jnp.bfloat16)
    pn = jnp.sum(jnp.square(p_emb), axis=1)
    cn = jnp.sum(jnp.square(cand_emb), axis=-1)
    dots = jnp.einsum("bd,bcd->bc", pe, ce, preferred_element_type=jnp.float32)
    d_pc = jnp.where(cand_ids >= 0, pn[:, None] + cn - 2.0 * dots, INF)
    cc = jnp.einsum("bcd,bed->bce", ce, ce, preferred_element_type=jnp.float32)
    d_cc = cn[:, :, None] + cn[:, None, :] - 2.0 * cc
    return _prune_select(cand_ids, d_pc, d_cc, r, alpha, keep_closest)


# ---------------------------------------------------------------------------
# Host passes: reverse-edge fill (post-prune) and medoid
# ---------------------------------------------------------------------------


def _trim_host(label: str = "") -> None:
    """Return freed numpy buffers to the OS at phase boundaries. glibc keeps
    multi-GB arenas resident after the KNN/prune phases' churn of short-lived
    giant arrays; on a 125 GB host running 20M+ builds that retained slack is
    the difference between finishing and rc=137."""
    import ctypes
    import gc

    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:  # non-glibc: nothing to trim, gc alone is the best we have
        pass
    if label:
        logger.info("host trim after %s: rss %.1f GB", label, _rss_gb())


def _reverse_sample(nbrs: np.ndarray, cap: int, rng: np.random.Generator,
                    dst_ranges: int = 16) -> np.ndarray:
    """Sampled reverse edges: for each node up to ``cap`` nodes that list it.
    Vectorized host pass over the edge list, partitioned into ``dst_ranges``
    destination-id bands so the per-band int64 sort scratch stays ~E/16 —
    one global rng.permutation + argsort over the 1.9G-edge list at 60M×R32
    is ~90 GB of int64 temporaries, which is what OOM-killed the first 20M
    build right after its prune phase. Per-dst sampling semantics are
    unchanged: every dst group lives wholly inside one band."""
    n, k = nbrs.shape
    out = np.full((n, cap), -1, np.int32)
    if n == 0:
        return out
    dst_flat = np.ascontiguousarray(nbrs, dtype=np.int32).reshape(-1)
    bounds = np.linspace(0, n, min(dst_ranges, n) + 1).astype(np.int64)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi <= lo:
            continue
        idx = np.flatnonzero((dst_flat >= lo) & (dst_flat < hi))  # drops -1 too
        if idx.size == 0:
            continue
        dst_b = dst_flat[idx]
        src_b = (idx // k).astype(np.int32)
        del idx
        # random priority per edge decides which in-edges survive the cap
        order = rng.permutation(dst_b.size)
        dst_b, src_b = dst_b[order], src_b[order]
        del order
        sort_i = np.argsort(dst_b, kind="stable")
        dst_b, src_b = dst_b[sort_i], src_b[sort_i]
        del sort_i
        # rank within each dst group
        first = np.r_[True, dst_b[1:] != dst_b[:-1]]
        group_start = np.maximum.accumulate(np.where(first, np.arange(dst_b.size), 0))
        rank = np.arange(dst_b.size) - group_start
        sel = rank < cap
        out[dst_b[sel], rank[sel]] = src_b[sel]
    return out


def _fill_reverse_edges(neighbors: np.ndarray, rng: np.random.Generator,
                        block: int = 1 << 20) -> np.ndarray:
    """Fill pruned (-1) slots with sampled in-edges — vectorized host pass
    (python loops don't scale to millions of nodes). Out-edges keep priority;
    reverse edges pack into the remaining slots. Row-blocked and int32-clean:
    the original whole-matrix pass promoted to int64 via the self-loop
    np.where and held ~6 [N, 2R] temporaries at once (~55 GB at 20M×R32)."""
    n, r = neighbors.shape
    rev = _reverse_sample(neighbors, r, rng)
    out = np.empty((n, r), np.int32)
    col = np.arange(2 * r, dtype=np.int32)[None, :]
    for s in range(0, n, block):
        e = min(n, s + block)
        cand = np.empty((e - s, 2 * r), np.int32)
        cand[:, :r] = neighbors[s:e]
        cand[:, r:] = rev[s:e]
        cand[cand == np.arange(s, e, dtype=np.int32)[:, None]] = -1  # self-loops
        # dedup keeping the first (leftmost) occurrence
        srt_i = np.argsort(cand, axis=1, kind="stable")
        srt = np.take_along_axis(cand, srt_i, axis=1)
        dup_sorted = np.concatenate(
            [np.zeros((e - s, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)], axis=1)
        dup = np.empty_like(dup_sorted)
        np.put_along_axis(dup, srt_i, dup_sorted, axis=1)
        cand[dup] = -1
        # left-compact valid entries, preserving column order
        key = np.where(cand < 0, np.int32(1 << 30), col)
        order = np.argsort(key, axis=1, kind="stable")
        out[s:e] = np.take_along_axis(cand, order, axis=1)[:, :r]
    return out


def compute_medoid(emb: np.ndarray) -> int:
    if emb.shape[0] > EXACT_KNN_MAX_N:
        # host blocked pass: shipping [N, D] f32 to the device twice costs
        # ~30 GB of tunnel transfer at 10M rows for a trivial reduction
        mean = emb.mean(axis=0, dtype=np.float64).astype(np.float32)
        best_d, best_i = np.inf, 0
        for s in range(0, emb.shape[0], 1 << 20):
            d = ((emb[s : s + (1 << 20)] - mean) ** 2).sum(axis=1)
            i = int(d.argmin())
            if d[i] < best_d:
                best_d, best_i = float(d[i]), s + i
        return best_i
    e = jnp.asarray(emb).astype(jnp.float32)  # f16 inputs: f32 accumulation
    mean = jnp.mean(e, axis=0, keepdims=True)
    d = jnp.sum(jnp.square(e - mean), axis=1)
    return int(jnp.argmin(d))


# ---------------------------------------------------------------------------
# Top-level build
# ---------------------------------------------------------------------------


def _ckpt_key(emb: np.ndarray, extra: str) -> str:
    """Cheap content key for build checkpoints: shape/dtype + a blake2b of a
    ~4K-row stride sample plus head/tail blocks (hashing the full 15 GB
    matrix at 20M would cost more than the phase it guards on a 1-core
    host). NOT a full content hash: a corpus edited only in rows off the
    stride matches the old key — pass a fresh checkpoint_dir after partial
    re-embeddings."""
    import hashlib

    step = max(1, emb.shape[0] // 4096)
    h = hashlib.blake2b(digest_size=8)
    for part in (emb[::step], emb[:256], emb[-256:]):
        h.update(np.ascontiguousarray(part).tobytes())
    return f"{emb.shape[0]}x{emb.shape[1]}_{emb.dtype}_{h.hexdigest()}_{extra}"


def _ckpt_load(path: str, key: str):
    """-> read-only memmap | None. The key rides in a sidecar .json; a stale
    or foreign artifact (different corpus / params) is ignored, never
    trusted. mmap: a resumed 60M KNN array is ~15 GB — page cache, not RSS."""
    import json
    import os as _os

    if not (_os.path.exists(path) and _os.path.exists(path + ".json")):
        return None
    try:
        if json.load(open(path + ".json"))["key"] != key:
            return None
        return np.load(path, mmap_mode="r")
    except Exception as e:  # corrupt partial write from a killed run
        logger.warning("ignoring unreadable checkpoint %s: %s", path, e)
        return None


def _ckpt_save(path: str, key: str, arr: np.ndarray) -> None:
    """Crash-ordering: the old key sidecar is removed FIRST, the new one is
    written LAST (both atomically) — a kill at any point leaves either no
    sidecar (artifact ignored) or a fully consistent pair, never an old key
    naming a new array. A memmap already living in the checkpoint dir (spill
    scratch output) is renamed into place instead of being copied (15 GB of
    avoided IO at 60M; the open mapping survives the rename)."""
    import json

    try:
        os.remove(path + ".json")
    except OSError:
        pass
    fname = getattr(arr, "filename", None)
    if isinstance(arr, np.memmap) and fname and \
            os.path.dirname(os.path.abspath(fname)) == os.path.dirname(os.path.abspath(path)):
        arr.flush()
        if os.path.abspath(fname) != os.path.abspath(path):
            os.replace(fname, path)
    else:
        tmp = path + ".tmp.npy"
        np.save(tmp, arr)
        os.replace(tmp, path)
    tmpj = path + ".json.tmp"
    with open(tmpj, "w") as f:
        json.dump({"key": key}, f)
    os.replace(tmpj, path + ".json")


def _augment_reverse_candidates(
    knn_ids: np.ndarray, rev_c: int, src_k: int = 16, block: int = 1 << 16,
) -> np.ndarray:
    """Append up to ``rev_c`` REVERSE-edge candidates per row before the
    α-prune: node j gains every i that lists j among its ``src_k`` closest
    forward candidates (deduped against j's own forward list, -1 padded).

    Vamana inserts edges bidirectionally during build (reference DiskANN fork
    build path, SURVEY.md §2.3) — the batched prune here otherwise only ever
    sees each node's *outgoing* KNN list, so a node in a dense region is
    invisible to the sparse nodes that need an edge *into* it. Pure host op
    over the [N, C] candidate array: one stable argsort of N*src_k edges
    (~20 s / 1.3 GB indices at 10M, src_k=16) — negligible next to the prune
    phase it feeds."""
    n, c = knn_ids.shape
    src_k = min(src_k, c)
    dst = np.ascontiguousarray(knn_ids[:, :src_k]).ravel()
    src = np.repeat(np.arange(n, dtype=np.int32), src_k)
    valid = dst >= 0
    dst, src = dst[valid], src[valid]
    order = np.argsort(dst, kind="stable")  # groups edges by target node
    dst, src = dst[order], src[order]
    counts = np.bincount(dst, minlength=n)
    starts = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # position of each edge within its target's group; closest-first order is
    # preserved per source by the stable sort
    pos = np.arange(dst.shape[0], dtype=np.int64) - starts[dst]
    sel = pos < rev_c
    rev = np.full((n, rev_c), -1, np.int32)
    rev[dst[sel], pos[sel]] = src[sel]
    del dst, src, order, counts, starts, pos, sel
    for s in range(0, n, block):  # drop rev entries already in the fwd list
        e = min(s + block, n)
        dup = (rev[s:e, :, None] == knn_ids[s:e, None, :]).any(-1)
        blk_rev = rev[s:e]
        blk_rev[dup] = -1
        rev[s:e] = blk_rev
    return np.concatenate([np.asarray(knn_ids), rev], axis=1)


def build_graph(
    emb: np.ndarray,
    r: int = 32,
    candidate_factor: int = 2,
    alpha: float = 1.2,
    keep_closest: int = -1,  # -1 = auto (r // 4)
    query_block: int = 1024,
    prune_block: int = 512,
    checkpoint_dir: str = "",
    reverse_candidates: int = 0,
) -> Tuple[np.ndarray, int]:
    """Build a fixed-degree navigable graph. -> (neighbors i32[N, R], medoid).

    knn(C=r*candidate_factor) → α-prune to ≤R (keeping the closest
    ``keep_closest`` unconditionally) → reverse-edge fill to R.

    ``reverse_candidates > 0`` additionally feeds the prune up to that many
    reverse-KNN candidates per node (:func:`_augment_reverse_candidates`) —
    the bidirectional-edge quality lever for spill-KNN builds (10M+), where
    forward window candidates alone under-connect cluster boundaries.

    ``checkpoint_dir``: persist each phase's output (KNN candidates, pruned
    neighbors) keyed on a corpus-content hash + phase params, and resume from
    them on re-run. Multi-hour 10M+ builds over the tunneled TPU die to worker
    wedges/watchdogs; a killed build restarts at the last finished phase
    instead of hour zero. (The reference has no mid-build resume — its indexes
    are the only checkpoint, SURVEY.md §5.)
    """
    n, d = emb.shape
    r = min(r, max(n - 1, 1))
    c = min(r * candidate_factor, max(n - 1, 1))
    # pin the candidate-list width independent of R (LEANN_KNN_CANDIDATES):
    # the KNN phase cost and its checkpoint key depend on c alone, so a
    # degree sweep (e.g. re-prune the 10M tier at R=48) can reuse a saved
    # ckpt_knn.npy instead of paying the multi-hour candidate pass again
    c_env = int(os.environ.get("LEANN_KNN_CANDIDATES", "0") or 0)
    if c_env > 0:
        if c_env < r:
            # a width below R would silently build a graph whose candidate
            # lists are narrower than the requested degree (ADVICE r4)
            logger.warning("LEANN_KNN_CANDIDATES=%d < graph degree R=%d; "
                           "clamping to R", c_env, r)
        c = min(max(c_env, r), max(n - 1, 1))
    if keep_closest < 0:
        keep_closest = r // 4
    rc_tag = f"_rc{reverse_candidates}" if reverse_candidates > 0 else ""
    # beyond-HBM candidate pass: sharded exact by default; "spill" opts back
    # into the window/cluster heuristic (13% candidate recall at 10M — kept
    # only as an escape hatch for corpora too big to afford O(N²))
    knn_mode = os.environ.get("LEANN_KNN_MODE", "exact") if n > EXACT_KNN_MAX_N else "small"
    knn_path = prune_path = key = None
    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        key = _ckpt_key(
            emb, {"exact": f"c{c}ex", "descent": f"c{c}nd"}.get(knn_mode, f"c{c}"))
        knn_path = os.path.join(checkpoint_dir, "ckpt_knn.npy")
        prune_path = os.path.join(checkpoint_dir, "ckpt_pruned.npy")
        done = _ckpt_load(prune_path, f"{key}_r{r}_a{alpha}_kc{keep_closest}{rc_tag}")
        if done is not None:
            logger.info("build_graph: resumed pruned graph from %s", prune_path)
            out = _fill_reverse_edges(done, np.random.default_rng(0))
            return out, compute_medoid(emb)

    t0 = time.time()
    knn_ids = _ckpt_load(knn_path, key) if knn_path else None
    knn_resumed = knn_ids is not None
    if knn_resumed:
        logger.info("build_graph: resumed knn candidates from %s", knn_path)
    elif knn_mode == "spill":
        # window/cluster heuristic: streams the host-resident corpus through
        # fixed-shape chunk dispatches. Cheap but approximate — candidate
        # recall measured 13% at 10M (fine-grained k-means + 2 probes misses
        # neighbors at ~45°); prefer the exact sharded pass below
        knn_ids, _ = spill_knn_streamed(emb, c, scratch_dir=checkpoint_dir)
    elif knn_mode == "descent":
        # approximate candidates when even the sharded exact pass is too
        # slow (its cost is O(N²·D); descent is O(N·C·D) per round): cluster-
        # bootstrapped NN-descent. Needs the full bf16 matrix in HBM
        # (~46 GB at 60M — pod-sized); validate candidate recall with
        # benchmarks/validate_descent.py (sampled exact oracle) before
        # trusting a new scale
        knn_ids, _ = nn_descent(emb, c, checkpoint_dir=checkpoint_dir or "")
    elif n > EXACT_KNN_MAX_N:
        # single-chip HBM can't hold the matrix, but O(N²) brute force on the
        # MXU is still the fastest *and* exact option well past 10M — the
        # column-sharded pass streams query chunks + running top-k state
        # through one device-resident bf16 slab at a time
        knn_ids, _ = exact_knn_sharded(emb, c, checkpoint_dir=checkpoint_dir or "")
    else:
        knn_ids, _ = exact_knn(emb, c, query_block=query_block)
    if knn_path and not knn_resumed:
        _ckpt_save(knn_path, key, knn_ids)  # renames a scratch memmap in place
        for f in ("spill_out_ids.npy", "spill_out_d.npy"):  # dead post-save
            try:
                os.remove(os.path.join(checkpoint_dir, f))
            except OSError:
                pass
    logger.info("build_graph knn phase: %.1fs (host rss %.1f GB)", time.time() - t0, _rss_gb())
    if n > EXACT_KNN_MAX_N:
        _trim_host("knn")

    if reverse_candidates > 0 and n > 1:
        t0 = time.time()
        knn_ids = _augment_reverse_candidates(knn_ids, reverse_candidates)
        logger.info("reverse-candidate augment: +%d slots, %.1fs (host rss %.1f GB)",
                    reverse_candidates, time.time() - t0, _rss_gb())
    cw = knn_ids.shape[1]  # candidate width the prune actually sees

    t0 = time.time()
    # keep the [block, C, C] occlusion tensor bounded
    blk = max(8, (min(prune_block, int((256 << 20) / max(cw * cw * 4, 1))) // 8) * 8)
    np_total = _bucket_rows(n, blk)
    cand_h = _pad_rows(knn_ids, np_total, fill=-1)  # host-resident; sliced per dispatch
    del knn_ids  # cand_h is a padded copy when bucketing grew the row count
    # chunk dispatches (~128K rows each) so none outlives the tunnel watchdog
    rows_per_dispatch = max(blk, (131072 // blk) * blk)
    neighbors = np.empty((np_total, r), np.int32)
    d_emb = emb.shape[1]
    pq_mode = np_total * d_emb * 2 > PRUNE_EBF_MAX_BYTES
    # every step below this line dispatches to the device; the 20M kill-loop
    # of round 4 came from >40 min of silent compile+encode here tripping the
    # run_scale.sh log-stall watchdog, so log each stage as it starts
    logger.info("prune: %d rows (padded %d), blk=%d, cw=%d, pq_mode=%s (%.1fs)",
                n, np_total, blk, cw, pq_mode, time.time() - t0)

    if pq_mode:
        # beyond-HBM prune: corpus lives on device as PQ codes; each
        # dispatch uploads its own exact rows (bf16) and candidate ids
        from .pq import _bucket_sample, encode_pq, train_pq

        # subspace width near 6 for decode fidelity. Dims with no divisor in
        # the usable band (e.g. the mips-augmented D+1 = 385 → bands exist;
        # truly prime dims don't) zero-pad columns instead — padded centroids
        # train to ~0, so padded dims contribute 0 to every dot product and
        # the distances are unchanged. choose_m alone silently degenerates to
        # M=1 (one 256-point codebook for the whole corpus) on such dims.
        m = _prune_pq_m(d_emb)
        d_pq = d_emb if m else ((d_emb + 5) // 6) * 6
        m = m or d_pq // 6
        codes_ckpt = os.path.join(checkpoint_dir, "ckpt_prune_codes.npy") if checkpoint_dir else ""
        codes_key = f"{key}_prunepq_m{m}"
        codes_h = _ckpt_load(codes_ckpt, codes_key) if codes_ckpt else None
        cb = _ckpt_load(codes_ckpt + ".cb.npy", codes_key) if codes_ckpt else None
        codes_d = None
        if codes_h is not None and cb is not None and codes_h.shape[0] >= np_total:
            logger.info("prune pq: resumed %d codes from %s", codes_h.shape[0], codes_ckpt)
            cb_d = jnp.asarray(np.asarray(cb))
            codes_d = jnp.asarray(np.ascontiguousarray(codes_h[:np_total]))
        if codes_d is None:
            samp = np.asarray(_bucket_sample(emb, 65536, np.random.default_rng(0)), np.float32)
            logger.info("prune pq: sampled %d rows for codebook training (%.1fs)",
                        samp.shape[0], time.time() - t0)
            if d_pq != d_emb:
                samp = np.pad(samp, ((0, 0), (0, d_pq - d_emb)))
            cb = train_pq(samp, m=m, n_iters=8, sample=samp.shape[0])
            logger.info("prune pq: codebooks trained M=%d ds=%d (%.1fs)", m, d_pq // m,
                        time.time() - t0)
            cb_d = jnp.asarray(cb)
            codes_h = np.zeros((np_total, m), np.uint8)
            enc_blk = 1 << 16
            # f16 host matrices upload in their native width (encode_pq widens
            # on device) — the tunnel is ~17 MB/s and transfer dominates here
            up_dt = np.float16 if (emb.dtype == np.float16 and d_pq == d_emb) else np.float32
            for ei, s in enumerate(range(0, n, enc_blk)):
                rows_u = np.asarray(emb[s : s + enc_blk], up_dt)
                if d_pq != d_emb:
                    rows_u = np.pad(rows_u, ((0, 0), (0, d_pq - d_emb)))
                codes_h[s : s + rows_u.shape[0]] = np.asarray(encode_pq(jnp.asarray(rows_u), cb_d))
                if ei % 32 == 31:
                    logger.info("prune pq encode: %d/%d rows (%.0fs)",
                                s + rows_u.shape[0], n, time.time() - t0)
            if codes_ckpt:
                _ckpt_save(codes_ckpt + ".cb.npy", codes_key, np.asarray(cb))
                _ckpt_save(codes_ckpt, codes_key, codes_h)
            codes_d = jnp.asarray(codes_h)
        del codes_h
        logger.info("prune pq trained+encoded: M=%d ds=%d codes %.2f GB on device (%.1fs)",
                    m, d_pq // m, codes_d.nbytes / 2**30, time.time() - t0)
        for di, s in enumerate(range(0, np_total, rows_per_dispatch)):
            nb = min(rows_per_dispatch, np_total - s) // blk
            rows = np.zeros((nb * blk, d_pq), dtype=jnp.bfloat16)
            real = max(0, min(n, s + nb * blk) - s)
            rows[:real, :d_emb] = emb[s : s + real]
            sel = _robust_prune_pq_device(
                codes_d, cb_d, jnp.asarray(rows), jnp.asarray(cand_h[s : s + nb * blk]),
                r, float(alpha), keep_closest, blk, n_blocks=nb,
            )
            neighbors[s : s + nb * blk] = np.asarray(sel)
            if di < 4 or di % 16 == 15:  # early dispatches carry the compile
                logger.info("prune(pq): %d/%d rows (%.0fs)", s + nb * blk, np_total, time.time() - t0)
        del codes_d
    else:
        if n > EXACT_KNN_MAX_N:
            # bf16-only device residency: the padded f32 matrix alone is ~15 GB
            # at 10M x 384 (over HBM); norms come from a host f32 pass instead.
            # Single pre-allocated padded buffer (cast-on-assign) — a convert +
            # concat chain would hold two 7.7 GB host temporaries at once
            ebf_host = np.zeros((np_total, d_emb), dtype=jnp.bfloat16)
            ebf_host[:n] = emb
            ebf = jnp.asarray(ebf_host)
            del ebf_host
            nrm = jnp.asarray(_pad_rows(np.einsum("ij,ij->i", emb, emb, dtype=np.float32).astype(np.float32), np_total))
        else:
            emb_p = jnp.asarray(_pad_rows(emb, np_total))
            ebf = emb_p.astype(jnp.bfloat16)
            nrm = jnp.sum(jnp.square(emb_p.astype(jnp.float32)), axis=1)
            del emb_p
        for di, s in enumerate(range(0, np_total, rows_per_dispatch)):
            nb = min(rows_per_dispatch, np_total - s) // blk
            sel = _robust_prune_device(
                ebf, nrm, jnp.asarray(cand_h[s : s + nb * blk]), jnp.int32(s),
                r, float(alpha), keep_closest, blk, n_blocks=nb,
            )
            neighbors[s : s + nb * blk] = np.asarray(sel)
            if di % 16 == 15:
                logger.info("prune: %d/%d rows (%.0fs)", s + nb * blk, np_total, time.time() - t0)
    neighbors = np.ascontiguousarray(neighbors[:n])  # drop the padded base
    del cand_h
    if prune_path:
        _ckpt_save(prune_path, f"{key}_r{r}_a{alpha}_kc{keep_closest}{rc_tag}", neighbors)
    logger.info("build_graph prune phase: %.1fs (pq=%s, host rss %.1f GB)",
                time.time() - t0, pq_mode, _rss_gb())
    if n > EXACT_KNN_MAX_N:
        _trim_host("prune")

    t0 = time.time()
    logger.info("reverse-edge fill starting (host)")
    out = _fill_reverse_edges(neighbors, np.random.default_rng(0))
    logger.info("reverse-edge fill done (%.0fs); computing medoid (host-blocked)",
                time.time() - t0)
    medoid = compute_medoid(emb)
    logger.info("graph built: N=%d R=%d avg_deg=%.1f medoid=%d (%.0fs)",
                n, r, (out >= 0).mean() * r, medoid, time.time() - t0)
    return out, medoid
