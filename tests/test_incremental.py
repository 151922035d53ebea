"""Incremental insertion tests (ops/insert.py + LeannBuilder.update_index).

New capability over the reference (which requires a full rebuild per update —
SURVEY.md §5 "no incremental/streaming build"), so the tests define the
contract: inserted chunks are searchable, old chunks stay searchable, recall
vs a from-scratch rebuild stays close, and every persistence artifact
(passages, offsets, ids, tokens, meta) stays consistent.
"""

import json
import os
import pickle

import numpy as np
import pytest

from leann_tpu import LeannBuilder, LeannSearcher


def _mk_docs(rng, n, tag):
    vocab = [f"w{i}" for i in range(400)]
    return [
        f"{tag}{i} " + " ".join(rng.choice(vocab, 12)) + f" special_{tag}_{i}"
        for i in range(n)
    ]


@pytest.fixture()
def base_index(tmp_path, rng):
    docs = _mk_docs(rng, 40, "base")
    path = str(tmp_path / "idx.leann")
    b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=8)
    for i, d in enumerate(docs):
        b.add_text(d, metadata={"wave": 0})
    b.build_index(path)
    return path, docs


class TestUpdateIndex:
    def test_inserted_chunks_found(self, base_index, rng):
        path, docs = base_index
        new_docs = _mk_docs(rng, 12, "fresh")
        u = LeannBuilder.from_index(path)
        for d in new_docs:
            u.add_text(d, metadata={"wave": 1})
        u.update_index(path)

        s = LeannSearcher(path, enable_warmup=False)
        # each new chunk's unique token must retrieve that chunk
        hits = 0
        for i, d in enumerate(new_docs):
            res = s.search(d, top_k=1, complexity=16, beam_width=4)
            hits += res and res[0].text == d
        assert hits >= 10, f"only {hits}/12 inserted chunks retrievable"

    def test_old_chunks_still_found(self, base_index, rng):
        path, docs = base_index
        u = LeannBuilder.from_index(path)
        for d in _mk_docs(rng, 12, "fresh"):
            u.add_text(d)
        u.update_index(path)
        s = LeannSearcher(path, enable_warmup=False)
        hits = 0
        for d in docs[:10]:
            res = s.search(d, top_k=1, complexity=16, beam_width=4)
            hits += res and res[0].text == d
        assert hits >= 9, f"only {hits}/10 original chunks retrievable after insert"

    def test_artifacts_consistent(self, base_index, rng):
        path, docs = base_index
        u = LeannBuilder.from_index(path)
        for d in _mk_docs(rng, 5, "fresh"):
            u.add_text(d, metadata={"wave": 1})
        u.update_index(path)

        meta = json.load(open(f"{path}.meta.json"))
        assert meta["num_chunks"] == 45
        with open(f"{path}.passages.idx", "rb") as f:
            offsets = pickle.load(f)
        assert len(offsets) == 45
        from leann_tpu.storage import load_ids, load_token_cache, unpack_neighbors

        ids = load_ids(path)
        assert len(ids) == len(set(ids)) == 45
        z = np.load(f"{path}.hnsw.npz")
        nb = unpack_neighbors(z)
        assert nb.shape[0] == 45
        assert z["codes"].shape[0] == 45
        tok, _ = load_token_cache(path)
        assert tok.shape[0] == 45
        # graph invariants: no self loops, ids in range, no dup edges per row
        for i in range(nb.shape[0]):
            row = nb[i][nb[i] >= 0]
            assert i not in row
            assert row.size == np.unique(row).size
            assert (row < 45).all()
        # metadata filter reaches the new wave
        s = LeannSearcher(path, enable_warmup=False)
        res = s.search("fresh", top_k=5, complexity=16, beam_width=4,
                       metadata_filters={"wave": {"==": 1}})
        assert all(r.metadata["wave"] == 1 for r in res)

    def test_recall_close_to_rebuild(self, tmp_path, rng):
        """Insert half the corpus incrementally; recall@5 vs the flat oracle
        must be within 10 points of the from-scratch build."""
        docs = _mk_docs(rng, 60, "a") + _mk_docs(rng, 60, "b")
        inc_path = str(tmp_path / "inc.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=8)
        for d in docs[:60]:
            b.add_text(d)
        b.build_index(inc_path)
        u = LeannBuilder.from_index(inc_path)
        for d in docs[60:]:
            u.add_text(d)
        u.update_index(inc_path)

        full_path = str(tmp_path / "full.leann")
        b2 = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=8)
        for d in docs:
            b2.add_text(d)
        b2.build_index(full_path)

        flat_path = str(tmp_path / "flat.leann")
        b3 = LeannBuilder(backend_name="flat", embedding_model="hash-tiny", max_length=32)
        for d in docs:
            b3.add_text(d)
        b3.build_index(flat_path)

        queries = [" ".join(d.split()[:6]) for d in docs[::10]]
        oracle = LeannSearcher(flat_path, enable_warmup=False)
        s_inc = LeannSearcher(inc_path, enable_warmup=False)
        s_full = LeannSearcher(full_path, enable_warmup=False)

        def recall(s):
            tot = 0.0
            for q in queries:
                want = {r.id for r in oracle.search(q, top_k=5)}
                got = {r.id for r in s.search(q, top_k=5, complexity=24, beam_width=4)}
                tot += len(want & got) / 5
            return tot / len(queries)

        r_inc, r_full = recall(s_inc), recall(s_full)
        assert r_inc >= r_full - 0.10, f"incremental {r_inc:.3f} vs rebuild {r_full:.3f}"

    def test_duplicate_explicit_id_rejected(self, base_index):
        path, _ = base_index
        u = LeannBuilder.from_index(path)
        u.add_text("colliding chunk", id="0")
        # positional-digit ids are remapped, so collide via a non-digit id
        u2 = LeannBuilder.from_index(path)
        u2.add_text("colliding chunk", id="x")
        u2.update_index(path)
        u3 = LeannBuilder.from_index(path)
        u3.add_text("colliding again", id="x")
        with pytest.raises(ValueError):
            u3.update_index(path)

    def test_diskann_insert_unsupported(self, tmp_path, rng):
        path = str(tmp_path / "d.leann")
        b = LeannBuilder(backend_name="diskann", embedding_model="hash-tiny", max_length=32)
        for d in _mk_docs(rng, 20, "base"):
            b.add_text(d)
        b.build_index(path)
        u = LeannBuilder.from_index(path)
        u.add_text("new chunk")
        with pytest.raises(NotImplementedError):
            u.update_index(path)


class TestEntryPoolGrowth:
    def test_insert_grows_pool(self, tmp_path, rng):
        """insert_hnsw must grow the entry pool with the post-insert N (the
        round-1 advisor finding: a fixed 4096 cap froze seed coverage for
        indexes >65K rows). Small indexes seed inserted rows densely — every
        inserted row lands in the pool with its embedding — so locally
        repaired rows stay reachable; at scale the builder's n/16-up-to-32768
        rule (ENTRY_POOL_SIZE floor) takes over as the cap."""
        from leann_tpu.backends.hnsw.backend import ENTRY_POOL_SIZE, _pool_cap

        docs = _mk_docs(rng, 600, "base")
        path = str(tmp_path / "pool.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=8)
        for d in docs:
            b.add_text(d)
        b.build_index(path)
        z0 = np.load(path + ".hnsw.npz", allow_pickle=False)
        pool0 = z0["entries"].shape[0]
        assert pool0 <= _pool_cap(600)

        b2 = LeannBuilder(backend_name="hnsw", embedding_model="hash-tiny", max_length=32, M=8)
        for d in _mk_docs(rng, 400, "new"):
            b2.add_text(d)
        b2.update_index(path)
        z1 = np.load(path + ".hnsw.npz", allow_pickle=False)
        pool1 = z1["entries"].shape[0]
        assert pool1 > pool0, "pool must grow on insert"
        assert pool1 <= max(_pool_cap(1000), min(1000, ENTRY_POOL_SIZE))
        # every inserted row is seeded at this (small) scale, rows aligned
        covered = (z1["entries"] >= 600).sum()
        assert covered == 400
        if "entry_emb" in z1:
            assert z1["entry_emb"].shape[0] == pool1
