"""Native (C++) passage store tests: build, lookup parity, scale, fallback."""

import json
import pickle

import numpy as np
import pytest


def _write_jsonl(path, items):
    offsets = {}
    with open(path, "wb") as f:
        for it in items:
            offsets[it["id"]] = f.tell()
            f.write(json.dumps(it, ensure_ascii=False).encode() + b"\n")
    with open(str(path).replace(".jsonl", ".idx"), "wb") as f:
        pickle.dump(offsets, f)
    return offsets


@pytest.fixture(scope="module")
def native():
    from leann_tpu.runtime.passage_store import native_available

    if not native_available():
        pytest.skip("native passage store could not build")
    return True


class TestNativeStore:
    def test_build_and_lookup(self, native, tmp_path):
        from leann_tpu.runtime.passage_store import NativePassageStore

        items = [
            {"id": "0", "text": "hello world", "metadata": {"k": 1}},
            {"id": "a-b", "text": "second \"quoted\" text", "metadata": {}},
            {"id": "中文", "text": "中文内容测试", "metadata": {"lang": "zh"}},
        ]
        path = tmp_path / "p.jsonl"
        _write_jsonl(path, items)
        store = NativePassageStore(str(path))
        assert len(store) == 3
        assert store.get("0")["text"] == "hello world"
        assert store.get("a-b")["text"] == 'second "quoted" text'
        assert store.get("中文")["metadata"]["lang"] == "zh"
        assert store.get("missing") is None
        store.close()

    def test_matches_python_offsets(self, native, tmp_path, rng):
        from leann_tpu.runtime.passage_store import NativePassageStore

        items = [{"id": str(i), "text": f"passage {i} " + "x" * int(rng.integers(1, 200)), "metadata": {}}
                 for i in range(500)]
        path = tmp_path / "big.jsonl"
        offsets = _write_jsonl(path, items)
        store = NativePassageStore(str(path))
        assert len(store) == 500
        for i in (0, 17, 250, 499):
            assert store.get(str(i))["text"] == items[i]["text"]
        # native cidx offsets agree with python pickle offsets
        raw = store.get_raw("250")
        with open(path, "rb") as f:
            f.seek(offsets["250"])
            assert f.readline().rstrip(b"\n") == raw
        store.close()

    def test_passage_manager_uses_native(self, native, tiny_corpus, tmp_path):
        from leann_tpu import LeannBuilder
        from leann_tpu.api import PassageManager

        idx = str(tmp_path / "n.leann")
        b = LeannBuilder(backend_name="flat", embedding_mode="simulated", embedding_model="simulated",
                         dimensions=32)
        for text, md in tiny_corpus:
            b.add_text(text, metadata=md)
        b.build_index(idx)
        meta = json.loads((tmp_path / "n.leann.meta.json").read_text())
        pm = PassageManager(meta["passage_sources"], meta_dir=str(tmp_path))
        assert pm._native[0] is not None, "native store should engage"
        p = pm.get_passage("3")
        assert "jupiter" in p["text"]
        # python fallback returns the same thing
        pm2 = PassageManager(meta["passage_sources"], meta_dir=str(tmp_path), use_native=False)
        assert pm2.get_passage("3") == p
