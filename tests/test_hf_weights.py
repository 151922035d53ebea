"""Numerical validation of the HF BERT weight loader (roadmap item 5).

No real checkpoints exist in this zero-egress image, so the test *creates* a
tiny randomly-initialized BertModel with transformers (torch CPU), saves it
locally, loads it through ``load_hf_weights``, and checks our jitted forward
against the transformers forward + sentence-transformers mean pooling to
float32 tolerance. This pins down every conversion detail: q/k/v transposes,
token-type folding, post-LN ordering, exact-erf gelu, masked mean pooling.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    model = BertModel(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("hf") / "tiny-bert"
    model.save_pretrained(str(path))
    return str(path), model


class TestHFWeightLoading:
    def test_forward_matches_transformers(self, tiny_bert, rng):
        from dataclasses import replace

        import jax.numpy as jnp

        from leann_tpu.embeddings.encoder import encode_tokens, load_hf_weights

        path, model = tiny_bert
        params, cfg = load_hf_weights(path)
        cfg = replace(cfg, compute_dtype="float32", normalize=False)

        B, T = 3, 16
        ids = rng.integers(0, 120, size=(B, T)).astype(np.int32)
        mask = np.ones((B, T), np.int32)
        mask[0, 10:] = 0  # ragged row
        mask[2, 5:] = 0

        ours = np.asarray(encode_tokens(params, jnp.asarray(ids), jnp.asarray(mask), cfg))

        with torch.no_grad():
            out = model(
                input_ids=torch.tensor(ids.astype(np.int64)),
                attention_mask=torch.tensor(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        m = mask[:, :, None].astype(np.float32)
        theirs = (out * m).sum(1) / np.maximum(m.sum(1), 1.0)

        err = np.abs(ours - theirs).max() / (np.abs(theirs).max() + 1e-9)
        assert err < 2e-4, f"relative error {err}"

    def test_encoder_end_to_end_with_hf_dir(self, tiny_bert):
        """JaxEncoder(model_name=<local dir>) must pick up both the weights
        and the HF tokenizer, and produce unit-norm embeddings."""
        from leann_tpu.embeddings.encoder import JaxEncoder

        path, _ = tiny_bert
        # save a tokenizer into the same dir (bert-style wordpiece over a toy vocab)
        from transformers import BertTokenizerFast

        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
            "the", "cat", "sat", "on", "mat", "##s", "dog", "ran",
        ]
        import os

        vf = os.path.join(path, "vocab.txt")
        with open(vf, "w") as f:
            f.write("\n".join(vocab))
        BertTokenizerFast(vocab_file=vf, do_lower_case=True).save_pretrained(path)

        enc = JaxEncoder(path, max_length=16)
        assert enc.cfg.arch == "bert"
        e = enc.encode(["the cat sat on the mats", "dogs ran"])
        assert e.shape == (2, 32)
        assert np.allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-3)
        # distinct inputs -> distinct embeddings
        assert not np.allclose(e[0], e[1])

    def test_build_and_search_index_from_local_checkpoint(self, tiny_bert, tmp_path):
        """Closes the 'real-weights end-to-end' roadmap gap without network:
        a local HF checkpoint (model + tokenizer) drives a full build ->
        compact index -> recompute search round trip through the public API,
        exactly the reference's sentence-transformers flow (reference
        embedding_compute.py:122-221) but via the jitted JAX forward."""
        import os

        from leann_tpu import LeannBuilder, LeannSearcher

        path, _ = tiny_bert
        if not os.path.exists(os.path.join(path, "tokenizer_config.json")):
            from transformers import BertTokenizerFast

            vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
                "the", "cat", "sat", "on", "mat", "##s", "dog", "ran", "sun", "moon",
            ]
            vf = os.path.join(path, "vocab.txt")
            with open(vf, "w") as f:
                f.write("\n".join(vocab))
            BertTokenizerFast(vocab_file=vf, do_lower_case=True).save_pretrained(path)

        texts = [f"the cat sat on the mat {w}" for w in ("sun", "moon", "dog")] + [
            "dogs ran on the moon", "the sun ran", "cats sat", "the moon",
            "dog ran on mats", "the cat ran", "sun and moon",
        ]
        prefix = str(tmp_path / "hf_idx" / "i.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model=path, max_length=16, M=4)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)

        import json

        meta = json.load(open(prefix + ".meta.json"))
        assert meta["embedding_model"] == path and meta["is_compact"] is True

        s = LeannSearcher(prefix)
        res = s.search("dogs ran", top_k=3, complexity=8, beam_width=2)
        assert len(res) == 3
        assert all(np.isfinite(r.score) for r in res)
        # the query's own text must be retrieved (self-retrieval sanity)
        assert any("ran" in r.text for r in res)

    def test_corpus_calibration_roundtrip(self, tiny_bert, tmp_path):
        """Builds over a loaded checkpoint persist <prefix>.calib.npz (mean +
        top-PC removal, encoder.py JaxEncoder.calibrate) and a FRESH searcher
        in a fresh encoder state applies the identical transform: search
        results must match the calibrated exact oracle. Random-init BERT
        without calibration collapses to bulk cos ~0.97 (VERDICT r2 #5)."""
        import json
        import os

        from leann_tpu import LeannBuilder, LeannSearcher
        from leann_tpu.embeddings import encoder as enc_mod

        path, _ = tiny_bert
        if not os.path.exists(os.path.join(path, "tokenizer_config.json")):
            from transformers import BertTokenizerFast

            vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
                "the", "cat", "sat", "on", "mat", "##s", "dog", "ran", "sun", "moon",
            ]
            vf = os.path.join(path, "vocab.txt")
            with open(vf, "w") as f:
                f.write("\n".join(vocab))
            BertTokenizerFast(vocab_file=vf, do_lower_case=True).save_pretrained(path)

        rng = np.random.default_rng(11)
        words = ["the", "cat", "sat", "on", "mat", "dog", "ran", "sun", "moon"]
        texts = [" ".join(rng.choice(words, 8)) for _ in range(80)]
        prefix = str(tmp_path / "cal" / "i.leann")
        b = LeannBuilder(backend_name="hnsw", embedding_model=path, max_length=16, M=8)
        for t in texts:
            b.add_text(t)
        b.build_index(prefix)
        assert os.path.exists(prefix + ".calib.npz")
        z = np.load(prefix + ".calib.npz")
        assert z["out_pc"].shape[0] == 32  # [D, k]

        # capture the calibrated oracle BEFORE resetting encoder state
        enc = enc_mod.get_encoder(path, max_length=16)
        emb = enc.encode(texts)
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        q = [texts[7], texts[42]]
        qe = enc.encode(q)
        qe /= np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
        truth = np.argsort(-qe @ emb.T, axis=1)[:, :3]

        # fresh process state: the cached encoder forgets the calibration
        enc_mod._ENCODER_CACHE.clear()
        s = LeannSearcher(prefix)
        hits = 0
        for qi, qt in enumerate(q):
            res = s.search(qt, top_k=3, complexity=32, beam_width=4)
            hits += len({int(r.id) for r in res} & set(truth[qi].tolist()))
        assert hits >= 5  # 5/6 allows one near-tie swap


class TestHFWeightSaving:
    def test_save_load_roundtrip_exact(self, tiny_bert, tmp_path, rng):
        """save_hf_weights is the exact inverse of load_hf_weights: a tree
        saved back as an HF checkpoint and re-loaded produces bit-equal f32
        leaves (this is how ContrastiveTrainer-fine-tuned weights re-enter
        the index build through the standard loader path)."""
        import jax

        from leann_tpu.embeddings.encoder import load_hf_weights, save_hf_weights

        path, _ = tiny_bert
        params, cfg = load_hf_weights(path)
        out = str(tmp_path / "roundtrip-bert")
        save_hf_weights(params, cfg, out)
        params2, cfg2 = load_hf_weights(out)
        assert (cfg2.vocab_size, cfg2.dim, cfg2.n_layers, cfg2.n_heads,
                cfg2.mlp_dim) == (cfg.vocab_size, cfg.dim, cfg.n_layers,
                                  cfg.n_heads, cfg.mlp_dim)
        flat1 = jax.tree_util.tree_leaves_with_path(params)
        flat2 = {jax.tree_util.keystr(k): v
                 for k, v in jax.tree_util.tree_leaves_with_path(params2)}
        for k, v in flat1:
            np.testing.assert_array_equal(
                np.asarray(v, np.float32),
                np.asarray(flat2[jax.tree_util.keystr(k)], np.float32),
                err_msg=jax.tree_util.keystr(k))

    def test_trainer_accepts_loaded_params(self, tiny_bert):
        """ContrastiveTrainer(params=...) fine-tunes a loaded checkpoint: one
        step runs, loss is finite, and the params actually move."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from leann_tpu.embeddings.encoder import load_hf_weights
        from leann_tpu.parallel.train import ContrastiveTrainer

        path, _ = tiny_bert
        params, cfg = load_hf_weights(path)
        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devs, ("dp", "tp"))
        tr = ContrastiveTrainer(cfg, mesh, learning_rate=1e-3, params=params)
        before = np.asarray(tr.params["layers"][0]["q"]["w"])
        B, T = 8, 16
        rng = np.random.default_rng(0)
        q_ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
        d_ids = rng.integers(0, cfg.vocab_size, (B, T)).astype(np.int32)
        ones = np.ones((B, T), np.int32)
        loss0 = tr.train_step(jnp.asarray(q_ids), jnp.asarray(ones),
                              jnp.asarray(d_ids), jnp.asarray(ones))
        assert np.isfinite(loss0)
        after = np.asarray(tr.params["layers"][0]["q"]["w"])
        assert not np.array_equal(before, after)

    def test_hash_tokenizer_respects_checkpoint_vocab(self, tiny_bert):
        """A local HF dir WITHOUT tokenizer files gets the hash tokenizer —
        which must be built from the CHECKPOINT's vocab_size, not the
        placeholder config's 32768 (ids past tok_emb's rows clamp onto the
        last row inside jit, silently collapsing tokens)."""
        from leann_tpu.embeddings.encoder import JaxEncoder

        path, _ = tiny_bert  # vocab_size=120, no tokenizer files saved
        enc = JaxEncoder(path, max_length=32)
        ids, _ = enc.tokenize(["hello world foo bar baz qux"])
        assert ids.max() < 120, f"tokenizer emitted id {ids.max()} >= vocab 120"
