"""Repack an existing index into the compact v2 storage format (storage.py).

Idempotent migration of round-1/2 artifacts: packs raw neighbor rows
(sorted-delta deflate), collapses sequential id lists, converts step-function
partition assignments to counts, and moves legacy token stores to their
``.cache.`` names (tokens are derivable from the passages, so they no longer
count as index state). Search results are unchanged — neighbor rows are sets
to every consumer.

CLI: ``leann repack <prefix>`` or ``python -m leann_tpu.repack <prefix>``.
"""

from __future__ import annotations

import json
import logging
import os
import shutil

import numpy as np

from .storage import (
    index_all_in_bytes,
    load_ids,
    pack_neighbors,
    save_ids,
    save_partition,
    token_cache_paths,
)

logger = logging.getLogger(__name__)


def repack_index(prefix: str) -> dict:
    """Repack all artifacts for ``prefix`` in place. Returns a report dict
    {"before_bytes", "after_bytes", "steps": [...]}."""
    before = index_all_in_bytes(prefix)
    steps = []

    # backend npz: pack raw neighbor rows; move the entry pool out to its
    # derivable cache (BaseSearcher.load_entry_emb regenerates it from the
    # token cache through the exact recompute pipeline; mips pools live in
    # the augmented build space and must stay in the npz)
    for backend in ("diskann", "hnsw"):
        path = f"{prefix}.{backend}.npz"
        if not os.path.exists(path):
            continue
        z = dict(np.load(path, allow_pickle=False))
        changed = False
        if "neighbors" in z:
            nbr = z.pop("neighbors")
            z.update(pack_neighbors(np.asarray(nbr)))
            changed = True
            steps.append(f"{backend}: packed neighbors {nbr.shape}")
        if "entry_emb" in z and str(z.get("metric", "")) in ("l2", "cosine"):
            ee = np.asarray(z.pop("entry_emb"), np.float16)
            np.save(f"{prefix}.entries.cache.npy", ee)
            changed = True
            steps.append(f"{backend}: entry pool {ee.shape} -> derivable cache")
        if changed:
            tmp = path + ".tmp.npz"  # savez appends .npz to bare names
            np.savez(tmp, **z)
            os.replace(tmp, path)

    # ids: collapse sequential lists
    ids_path = f"{prefix}.ids.json"
    if os.path.exists(ids_path):
        with open(ids_path) as f:
            data = json.load(f)
        if isinstance(data, list):
            save_ids(prefix, data)
            steps.append(f"ids: {len(data)} entries -> {'seq' if load_ids(prefix) == data else 'list'}")

    # partition: counts when the assignment is a step function
    part_npy = f"{prefix}.partition.npy"
    if os.path.exists(part_npy):
        assign = np.load(part_npy)
        save_partition(prefix, assign)  # removes the .npy when counts suffice
        if not os.path.exists(part_npy):
            steps.append(f"partition: {assign.shape[0]} rows -> counts")

    # tokens: legacy store -> cache name (same bytes, excluded from accounting)
    p = token_cache_paths(prefix)
    for src, dst in (
        (p["legacy_raw"], p["raw"]),
        (p["legacy_raw_len"], p["raw_len"]),
        (p["legacy_npz"], p["npz"]),
    ):
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.move(src, dst)
            steps.append(f"tokens: {os.path.basename(src)} -> cache")

    after = index_all_in_bytes(prefix)
    logger.info("repacked %s: %.1f -> %.1f MB (%s)", prefix, before / 1e6, after / 1e6,
                "; ".join(steps) or "nothing to do")
    return {"before_bytes": before, "after_bytes": after, "steps": steps}


def relabel_index(prefix: str, n_cells: int = 0,
                  order: "np.ndarray | None" = None) -> dict:
    """Locality-relabel an existing single-partition index in place
    (ops/relabel.py): renumber nodes by proximity cells so the packed
    graph's sorted-row deltas shrink and traversal gathers hit nearby HBM
    pages. NOTE (measured round 5): the win is corpus-dependent — on
    synthetic sibling-group corpora most graph edges are geometrically
    unclustered "filler" neighbors whose deltas are incompressible under ANY
    ordering (DPR 2.1M R=48: 343.9 -> 345.2 MB, locality 0.10 -> 0.17), so
    measure before adopting; ``unrelabel_index`` inverts a relabel that
    didn't pay. Permutes every per-node artifact (graph rows+values, codes,
    entries, medoid, embeddings, token caches) and stores the id permutation
    compactly (storage.py 'perm' format). Search results are identical up to
    the id mapping, which the searcher resolves through the ids list exactly
    as before. ``order`` overrides the geometry-derived ordering (new row j
    holds old row order[j]) — the undo path."""
    from .ops.relabel import (decoded_source, edge_locality, locality_order,
                              matrix_source)
    from .storage import load_partition, unpack_neighbors

    path = backend = None
    for b in ("diskann", "hnsw"):
        p = f"{prefix}.{b}.npz"
        if os.path.exists(p):
            path, backend = p, b
            break
    if path is None:
        raise FileNotFoundError(f"no backend npz for {prefix}")
    z = dict(np.load(path, allow_pickle=False))
    nbr = unpack_neighbors(z)
    n = nbr.shape[0]
    part = load_partition(prefix, n)
    if part is not None and part.size and int(part.max()) > 0:
        raise ValueError(
            "relabel would break the LDG partition-contiguity relayout of a "
            "multi-partition index; re-run the build with relabeling instead")
    before = index_all_in_bytes(prefix)
    loc_before = edge_locality(nbr)

    if order is None:
        if "embeddings" in z:
            src = matrix_source(np.asarray(z["embeddings"]))
            d = int(z["embeddings"].shape[1])
        elif "codes" in z:
            src = decoded_source(np.asarray(z["codes"]), np.asarray(z["codebooks"]))
            m, _, ds = z["codebooks"].shape
            d = int(m * ds)
        else:
            raise ValueError("index stores neither embeddings nor PQ codes; "
                             "no geometry to derive a locality order from")
        order = locality_order(src, n, d, n_cells=n_cells)
    else:
        order = np.asarray(order, np.int64)
        if order.shape != (n,):
            raise ValueError(f"explicit order has shape {order.shape}, want ({n},)")
    if np.array_equal(order, np.arange(n)):
        return {"before_bytes": before, "after_bytes": before,
                "steps": ["relabel: corpus too small, identity order"]}
    new_of_old = np.empty(n, np.int64)
    new_of_old[order] = np.arange(n)

    nbr2 = np.where(nbr >= 0, new_of_old[np.clip(nbr, 0, n - 1)], -1)[order].astype(np.int32)
    for k in ("neighbors", "neighbors_packed", "neighbors_n", "neighbors_r"):
        z.pop(k, None)
    z.update(pack_neighbors(nbr2))
    if "codes" in z:
        z["codes"] = np.asarray(z["codes"])[order]
    if "embeddings" in z:
        z["embeddings"] = np.asarray(z["embeddings"])[order]
    if "entries" in z:
        # entry_emb rows stay aligned: same physical nodes, same positions
        z["entries"] = new_of_old[np.asarray(z["entries"])].astype(np.int32)
    if "medoid" in z:
        z["medoid"] = np.int32(new_of_old[int(z["medoid"])])
    tmp = path + ".tmp.npz"
    np.savez(tmp, **z)
    os.replace(tmp, path)

    old_ids = load_ids(prefix)
    if old_ids:
        save_ids(prefix, [old_ids[int(i)] for i in order])

    # token caches: permute to the new row order (block-wise; raw stores are
    # memmapped, the gather touches pages in cache at repack time)
    p = token_cache_paths(prefix)
    if os.path.exists(p["raw"]):
        tok = np.load(p["raw"], mmap_mode="r")
        out = np.lib.format.open_memmap(p["raw"] + ".tmp", mode="w+",
                                        dtype=tok.dtype, shape=tok.shape)
        step = 1 << 19
        for s in range(0, n, step):
            out[s : s + step] = tok[order[s : s + step]]
        out.flush()
        del out, tok
        os.replace(p["raw"] + ".tmp", p["raw"])
        np.save(p["raw_len"], np.load(p["raw_len"])[order])
    elif os.path.exists(p["npz"]):
        zc = np.load(p["npz"])
        np.savez_compressed(p["npz"], tokens=zc["tokens"][order],
                            lengths=zc["lengths"][order])

    after = index_all_in_bytes(prefix)
    loc_after = edge_locality(nbr2)
    rep = {"before_bytes": before, "after_bytes": after,
           "edge_locality_64k": {"before": round(loc_before, 4),
                                 "after": round(loc_after, 4)},
           "steps": [f"{backend}: locality relabel, {n} rows"]}
    logger.info("relabel %s: %.1f -> %.1f MB, locality %.3f -> %.3f", prefix,
                before / 1e6, after / 1e6, loc_before, loc_after)
    return rep


def unrelabel_index(prefix: str) -> dict:
    """Invert a previous locality relabel using the stored id permutation
    (ids.perm.npy): re-permutes every artifact back to the original row
    order, restoring sequential ids (and deleting the perm sidecar). For
    corpora where the relabel measured as a net size loss."""
    perm_path = f"{prefix}.ids.perm.npy"
    if not os.path.exists(perm_path):
        raise FileNotFoundError(f"no {perm_path}: index is not relabeled")
    perm = np.load(perm_path).astype(np.int64)  # ids[j] == str(perm[j])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return relabel_index(prefix, order=inv)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prefix", help="index prefix (path up to .leann)")
    ap.add_argument("--relabel", action="store_true",
                    help="locality-relabel node ids (ops/relabel.py) before "
                         "repacking — shrinks the packed graph and improves "
                         "traversal HBM locality; single-partition indexes only")
    ap.add_argument("--unrelabel", action="store_true",
                    help="invert a previous --relabel via the stored id "
                         "permutation (for corpora where it measured larger)")
    ap.add_argument("--cells", type=int, default=0,
                    help="relabel cell count (0 = auto: N/2048 in [64, 8192])")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    rep = repack_index(args.prefix)
    if args.relabel or args.unrelabel:
        rep2 = (unrelabel_index(args.prefix) if args.unrelabel
                else relabel_index(args.prefix, n_cells=args.cells))
        rep = {"before_bytes": rep["before_bytes"],
               "after_bytes": rep2["after_bytes"],
               "edge_locality_64k": rep2.get("edge_locality_64k"),
               "steps": rep["steps"] + rep2["steps"]}
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
