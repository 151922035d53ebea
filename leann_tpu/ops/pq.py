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

OPQ (:func:`train_opq`) learns an orthogonal rotation R jointly with the
codebooks (Ge et al., CVPR'13 "Optimized Product Quantization", the
non-parametric alternation) to break the axis-aligned subspace assumption
that caps plain-PQ recall on anisotropic embeddings. Rather than storing R
and rotating every query, we store **lifted codebooks** ``B f32[M, K, D]``
with ``B[m, k] = R_m @ c[m, k]`` (centroids mapped back to input space,
``R_m`` = the m-th ds-column block of R). Because R is orthogonal:

- L2:   ||qR − recon||² = ||q||² − 2 q·ΣB[m, code_m] + Σ||c||²  — computable
        from q and B alone (the ||q||²/M term keeps ADC on the same absolute
        scale as exact distances, which the recompute screen mixes into one
        candidate pool, ops/beam_search.py:126).
- MIPS: (qR)·c = q·B — identical form.
- encode: argmin_k ||xR_m − c||² = argmin_k (||B[m,k]||² − 2 x·B[m,k]).

So the lifted tensor is the complete artifact — no rotation matrix in the
index, and :func:`adc_lut` / :func:`encode_pq` dispatch on shape
(``M·ds == D`` → plain; ``last dim == D`` → lifted).
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


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _kmeans_all_subspaces(xs: jnp.ndarray, init: jnp.ndarray, n_iters: int) -> jnp.ndarray:
    """xs [M, S, ds], init [M, K, ds] -> [M, K, ds]. Top-level jit so the
    compiled program lands in the persistent compile cache — a bare
    ``vmap(_kmeans_subspace)`` executes outside any jit entry point and its
    (multi-minute, axon) compilation is re-paid by every fresh process."""
    return jax.vmap(lambda xx, ii: _kmeans_subspace(xx, ii, n_iters))(xs, init)


def train_pq(
    x: np.ndarray, m: int = 0, k: int = 256, n_iters: int = 10, sample: int = 65536, seed: int = 0
) -> np.ndarray:
    """Train codebooks on (a sample of) x [N, D] -> f32[M, K, ds]."""
    n, d = x.shape
    m = choose_m(d, m)
    ds = d // m
    rng = np.random.default_rng(seed)
    x = _bucket_sample(x, sample, rng)
    x = np.asarray(x, np.float32)  # f16 host matrices: train on an f32 sample
    xs = jnp.asarray(x.reshape(-1, m, ds).transpose(1, 0, 2))  # [M, S, ds]
    k_eff = min(k, xs.shape[1])
    init_idx = rng.choice(xs.shape[1], k_eff, replace=False)
    init = xs[:, init_idx, :]  # [M, K, ds]
    cb = _kmeans_all_subspaces(xs, init, n_iters)
    if k_eff < k:  # pad to fixed K so codes stay u8-addressable
        pad = jnp.tile(cb[:, :1, :], (1, k - k_eff, 1)) + 1e6
        cb = jnp.concatenate([cb, pad], axis=1)
    return np.asarray(cb)


@jax.jit
def encode_pq(x: jnp.ndarray, codebooks: jnp.ndarray) -> jnp.ndarray:
    """x [B, D], codebooks [M, K, ds] (plain) or [M, K, D] (lifted OPQ)
    -> codes u8[B, M]. Accepts f16/bf16 x (cast here): callers stream blocks
    over the ~17 MB/s tunnel, so uploading the host matrix's native f16 and
    widening on device halves the dominant transfer cost of a 20M+ encode."""
    x = x.astype(jnp.float32)
    m, k, ds = codebooks.shape
    if m * ds != x.shape[1]:  # lifted: argmin_k ||B||^2 - 2 x.B
        dots = jax.lax.dot_general(
            x, codebooks.reshape(m * k, -1),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(x.shape[0], m, k)
        d = jnp.sum(jnp.square(codebooks), axis=-1)[None] - 2.0 * dots  # [B, M, K]
        return jnp.argmin(d, axis=2).astype(jnp.uint8)
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


@functools.partial(jax.jit, static_argnames=("n_kmeans",))
def _opq_iter(x: jnp.ndarray, r: jnp.ndarray, cb: jnp.ndarray, n_kmeans: int):
    """One OPQ-NP alternation step (rotation fixed): refine codebooks on the
    rotated sample, then return X^T @ recon for the host-side Procrustes SVD.
    x [S, D], r [D, D], cb [M, K, ds] -> (cb', XtY [D, D], mse)."""
    s, d = x.shape
    m, k, ds = cb.shape
    xr = jnp.dot(x, r, preferred_element_type=jnp.float32)  # [S, D]
    xs = xr.reshape(s, m, ds).transpose(1, 0, 2)  # [M, S, ds]
    cb = jax.vmap(lambda xm, cm: _kmeans_subspace(xm, cm, n_kmeans))(xs, cb)

    def assign(xm, cm):  # nearest-centroid codes per subspace
        dist = (
            jnp.sum(xm * xm, axis=1, keepdims=True)
            - 2.0 * jnp.dot(xm, cm.T, preferred_element_type=jnp.float32)
            + jnp.sum(cm * cm, axis=1)[None, :]
        )
        return jnp.argmin(dist, axis=1)

    codes = jax.vmap(assign)(xs, cb)  # [M, S]
    recon = jnp.take_along_axis(cb, codes[:, :, None], axis=1)  # [M, S, ds]
    y = recon.transpose(1, 0, 2).reshape(s, d)  # [S, D] rotated-space recon
    xty = jnp.dot(x.T, y, preferred_element_type=jnp.float32)  # [D, D]
    mse = jnp.mean(jnp.sum(jnp.square(xr - y), axis=1))
    return cb, xty, mse


def _bucket_sample(x: np.ndarray, sample: int, rng) -> np.ndarray:
    """Subsample to a power-of-two size so the jitted k-means/OPQ programs
    compile once per bucket, not once per exact corpus size (each fresh
    shape costs minutes of axon compile; a pow2 training subsample costs
    nothing — it's a sample either way)."""
    n = x.shape[0]
    size = min(n, sample)
    bucket = 1 << (size.bit_length() - 1)  # largest pow2 <= size
    if bucket == n:
        return x
    return x[rng.choice(n, bucket, replace=False)]


def train_opq(
    x: np.ndarray, m: int = 0, k: int = 256, n_iters: int = 10, opq_iters: int = 8,
    sample: int = 65536, seed: int = 0, factorized: bool = False,
):
    """OPQ-NP: alternate per-subspace k-means with the Procrustes update
    R = U V^T of SVD(X^T Y) (Ge et al. CVPR'13, non-parametric OPQ).
    Returns **lifted** codebooks f32[M, K, D] (module docstring) — drop-in
    for plain codebooks everywhere downstream. Replaces the recall the
    reference leaves on the table with faiss/DiskANN's axis-aligned PQ
    (_pq_pivots.bin, diskann_backend.py:151-208).

    ``factorized=True`` instead returns ``(rotation f32[D, D], plain
    codebooks f32[M, K, ds])`` — the compact on-disk form (~1 MB vs ~19 MB
    lifted at D=384); :func:`lift_codebooks` reconstitutes the runtime
    tensor at load."""
    n, d = x.shape
    m = choose_m(d, m)
    ds = d // m
    rng = np.random.default_rng(seed)
    x = np.asarray(_bucket_sample(x, sample, rng), np.float32)  # f16 hosts: f32 sample
    xd = jnp.asarray(x)
    r = jnp.eye(d, dtype=jnp.float32)  # identity init: starts at plain PQ
    k_eff = min(k, x.shape[0])
    init_idx = rng.choice(x.shape[0], k_eff, replace=False)
    cb = jnp.asarray(x[init_idx].reshape(k_eff, m, ds).transpose(1, 0, 2))  # [M, K, ds]
    for it in range(opq_iters):
        # early iterations: few k-means refinements (centroids chase the
        # moving rotation); final pass: full-budget polish
        cb, xty, _ = _opq_iter(xd, r, cb, n_kmeans=(n_iters if it == opq_iters - 1 else 3))
        if it < opq_iters - 1:  # Procrustes on host: D x D SVD is tiny
            u, _, vt = np.linalg.svd(np.asarray(xty))
            r = jnp.asarray((u @ vt).astype(np.float32))
    cb = np.asarray(cb)
    if k_eff < k:  # pad to fixed K so codes stay u8-addressable
        cb = np.concatenate([cb, np.tile(cb[:, :1], (1, k - k_eff, 1)) + 1e6], axis=1)
    if factorized:
        return np.asarray(r), cb
    return lift_codebooks(np.asarray(r), cb)


def lift_codebooks(rotation: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(R f32[D, D], plain cb f32[M, K, ds]) -> lifted f32[M, K, D] with
    B[m, k] = R_m @ c[m, k], R_m = ds-column block m of R."""
    d = rotation.shape[0]
    m, k, ds = cb.shape
    r_blocks = rotation.reshape(d, m, ds).transpose(1, 0, 2)  # [M, D, ds]
    return np.asarray(jnp.einsum("mds,mks->mkd", jnp.asarray(r_blocks), jnp.asarray(cb)))


def encode_pq_blocked(x: np.ndarray, codebooks: np.ndarray, block: int = 16384) -> np.ndarray:
    import logging
    import time

    log = logging.getLogger(__name__)
    t0 = time.time()
    cb = jnp.asarray(codebooks)
    out = np.empty((x.shape[0], codebooks.shape[0]), dtype=np.uint8)
    # f16 host matrices upload as f16 (half the tunnel bytes); encode_pq
    # widens on device. Other dtypes still go up as f32.
    up_dt = np.float16 if x.dtype == np.float16 else np.float32
    for bi, s in enumerate(range(0, x.shape[0], block)):
        out[s : s + block] = np.asarray(
            encode_pq(jnp.asarray(np.asarray(x[s : s + block], dtype=up_dt)), cb)
        )
        # visible progress: at 20M rows this loop is >1000 dispatches over the
        # tunnel — silence here trips the scale-run log-stall watchdog
        if bi % 64 == 63:
            log.info("encode_pq_blocked: %d/%d rows (%.0fs)",
                     min(s + block, x.shape[0]), x.shape[0], time.time() - t0)
    return out


def decode_pq(codebooks: jnp.ndarray, codes: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct vectors from plain-PQ codes on device.

    codebooks [M, K, ds], codes int [..., M] -> [..., M*ds] in codebooks'
    dtype. Per-subspace table gathers (tables are VMEM-small); subspace m
    fills dims m*ds:(m+1)*ds, matching :func:`encode_pq`'s layout. Used by
    the beyond-HBM α-prune (ops/graph.py `_robust_prune_pq_device`), where
    candidate embeddings exist only as codes."""
    dec = jax.vmap(lambda tbl, ix: tbl[ix], in_axes=(0, -1), out_axes=-2)(
        codebooks, codes.astype(jnp.int32)
    )
    return dec.reshape(*codes.shape[:-1], -1)


def adc_lut(q: jnp.ndarray, codebooks: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Per-query ADC table: q [D] -> lut f32[M, K] such that
    dist(q, x) ≈ sum_m lut[m, code[x, m]] (lower = closer). Codebooks may be
    plain [M, K, ds] or lifted OPQ [M, K, D] (see module docstring)."""
    m, k, ds = codebooks.shape
    if m * ds != q.shape[-1]:  # lifted
        dots = jnp.dot(codebooks.reshape(m * k, -1), q,
                       preferred_element_type=jnp.float32).reshape(m, k)
        if metric in ("mips", "cosine"):
            return -dots
        # + ||q||^2/M so sum_m lut = full ||qR - recon||^2 (absolute scale)
        return (jnp.sum(jnp.square(codebooks), axis=-1) - 2.0 * dots
                + jnp.sum(jnp.square(q)) / m)
    qs = q.reshape(m, 1, ds)
    if metric in ("mips", "cosine"):
        return -jnp.sum(qs * codebooks, axis=-1)  # [M, K]
    return jnp.sum(jnp.square(qs - codebooks), axis=-1)


# Above this row count the one-hot tensor ([C, M, K] bf16) outsizes the win:
# a 32K-entry pool screen at 64 vmapped lanes would stream ~50 GB/hop.
_ADC_ONEHOT_MAX_ROWS = 4096


def adc_distances(codes: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """codes i32/u8 [C, M], lut [M, K] -> approx distances [C] f32.

    Per-hop candidate sets (C <= 4096) reformulate the table lookup as a
    one-hot matmul on the MXU: TPU lowers scalar table gathers to serialized
    dynamic-slices, which profiling showed dominating the fused-loop hop
    (278 -> 75 us/hop/lane batched, docs/profile_fused_loop.md). The one-hot
    operand is exact in bf16; the LUT is split hi+lo into two bf16 passes
    accumulated in f32, so the result keeps ~f32 accuracy (rel err ~2^-17 —
    the recompute screen pools these with exact distances and the OPQ ADC
    contract is exact reconstruction distance, tests/test_graph_backends.py).
    Large C (entry-pool screens, one dispatch per query not per hop) keeps
    the flat gather."""
    m, k = lut.shape
    c = codes.shape[0]
    if c <= _ADC_ONEHOT_MAX_ROWS:
        oh = (codes.astype(jnp.int32)[:, :, None]
              == jax.lax.iota(jnp.int32, k)[None, None, :])
        oh2 = oh.astype(jnp.bfloat16).reshape(c, m * k)
        hi = lut.astype(jnp.bfloat16)
        lo = (lut - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jnp.dot(oh2, hi.reshape(-1), preferred_element_type=jnp.float32)
                + jnp.dot(oh2, lo.reshape(-1), preferred_element_type=jnp.float32))
    flat = lut.reshape(-1)  # [M*K]
    offs = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1) * k
    idx = codes.astype(jnp.int32) + offs  # [C, M]
    return jnp.sum(flat[idx], axis=1)
