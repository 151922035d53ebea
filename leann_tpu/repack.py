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

    # backend npz: pack raw neighbor rows
    for backend in ("diskann", "hnsw"):
        path = f"{prefix}.{backend}.npz"
        if not os.path.exists(path):
            continue
        z = dict(np.load(path, allow_pickle=False))
        if "neighbors" in z:
            nbr = z.pop("neighbors")
            z.update(pack_neighbors(np.asarray(nbr)))
            tmp = path + ".tmp.npz"  # savez appends .npz to bare names
            np.savez(tmp, **z)
            os.replace(tmp, path)
            steps.append(f"{backend}: packed neighbors {nbr.shape}")

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


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("prefix", help="index prefix (path up to .leann)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    rep = repack_index(args.prefix)
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
