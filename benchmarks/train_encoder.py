#!/usr/bin/env python
"""Fine-tune the recompute encoder on question->passage pairs, then build and
evaluate a retrieval index THROUGH the trained checkpoint (VERDICT r3 #7 —
the first recall number where the recompute engine serves an encoder with
real learned geometry, not a seeded/random-init one).

Pipeline (everything cached under ~/.cache/leann_tpu_bench):
  1. create/load the bench-bert HF checkpoint (random init — zero-egress
     image; same seed/config as bench.py measure_hf_checkpoint)
  2. fine-tune it with parallel/train.py ContrastiveTrainer (symmetric
     InfoNCE, in-batch negatives) on (question, passage) pairs over a
     synthetic hierarchical corpus — training questions use their own rng
     stream and exclude the eval chunks
  3. save the trained weights BACK as an HF checkpoint (save_hf_weights) so
     they re-enter the pipeline through the standard loader path every
     index build uses (encoder.py load_hf_weights)
  4. build a diskann index over the corpus with the trained checkpoint
  5. evaluate held-out question-shaped queries (bench_common seed=7) against
     the exact oracle of the calibrated trained encoder, and persist the
     tier (queries/truth/train_info.json) for bench.py
     measure_trained_encoder

The reference has no counterpart: it consumes frozen sentence-transformers
checkpoints (reference embedding_compute.py:122-344) and never trains.

Usage (real TPU, ~5 min):   python benchmarks/train_encoder.py
Smoke (CPU, seconds):       python benchmarks/train_encoder.py --smoke
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(1, os.path.dirname(os.path.abspath(__file__)))

CACHE_DIR = os.path.expanduser("~/.cache/leann_tpu_bench")


def ensure_base_ckpt(path):
    """Random-init BERT checkpoint, bit-identical to bench.py's bench-bert
    (same torch seed + config) so the two tiers share lineage."""
    if os.path.exists(os.path.join(path, "config.json")):
        return
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(vocab_size=4096, hidden_size=128, num_hidden_layers=4,
                     num_attention_heads=4, intermediate_size=512,
                     max_position_embeddings=256, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    BertModel(cfg).save_pretrained(path)


def main():
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-chunks", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--max-length", type=int, default=64)
    ap.add_argument("--n-queries", type=int, default=64)
    ap.add_argument("--ckpt", default=os.path.join(CACHE_DIR, "bench-bert"))
    ap.add_argument("--out", default=os.path.join(CACHE_DIR, "bench-bert-trained"))
    ap.add_argument("--tier", default=os.path.join(CACHE_DIR, "trained100k"))
    ap.add_argument("--complexity", type=int, default=256)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny run for tests: 600 chunks / 30 steps")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env var alone is "
                         "overridden by this image's site plugin)")
    args = ap.parse_args()
    if args.smoke:
        args.n_chunks, args.steps, args.batch = 600, 30, 64
        args.n_queries = 16
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dataclasses import replace

    import jax
    from bench_common import (TRAIN_TEMPLATES, make_queries, question_for_chunk,
                              tie_aware_recall)
    from jax.sharding import Mesh
    from scale_500k import synth_corpus

    import leann_tpu.embeddings.encoder as enc_mod
    from leann_tpu import LeannBuilder, LeannSearcher
    from leann_tpu.embeddings.encoder import load_hf_weights, save_hf_weights
    from leann_tpu.embeddings.tokenizer import get_tokenizer
    from leann_tpu.parallel.train import ContrastiveTrainer

    ensure_base_ckpt(args.ckpt)
    params, cfg = load_hf_weights(args.ckpt)
    cfg = replace(cfg, max_len=args.max_length)

    rng = np.random.default_rng(0)
    chunks = synth_corpus(args.n_chunks, rng)

    # De-circularized eval (VERDICT r4 #7): the generalization protocol —
    # question shells the trainer never sees (HELDOUT_TEMPLATES) with entity
    # words drawn from sibling restatements of the target fact, not the
    # target chunk itself. The standard all-template question draw is kept as
    # a secondary (seen-distribution) diagnostic.
    eval_q, eval_idx = make_queries(chunks, args.n_queries, seed=7,
                                    mode="question_heldout")
    seen_q, seen_idx = make_queries(chunks, args.n_queries, seed=7, mode="question")
    eval_set = set(int(i) for i in eval_idx) | set(int(i) for i in seen_idx)
    train_ids = np.array([i for i in range(len(chunks)) if i not in eval_set])

    # dp-only mesh: batch data-parallel over every device; tp=1 keeps the
    # tiny 128-d model's matmuls whole on each chip
    devs = np.array(jax.devices()).reshape(-1, 1)
    mesh = Mesh(devs, ("dp", "tp"))
    trainer = ContrastiveTrainer(cfg, mesh, learning_rate=args.lr, params=params)
    tok = get_tokenizer(args.ckpt, vocab_size=cfg.vocab_size, max_length=args.max_length)

    trng = np.random.default_rng(11)  # training question stream
    b = args.batch - (args.batch % devs.shape[0]) or devs.shape[0]
    t0 = time.time()
    loss = float("nan")
    for step in range(args.steps):
        idx = trng.choice(train_ids, b, replace=False)
        # TRAIN_TEMPLATES only: the eval shells stay unseen (VERDICT r4 #7)
        qs = [question_for_chunk(chunks[i], trng, templates=TRAIN_TEMPLATES)
              for i in idx]
        ds = [chunks[i] for i in idx]
        q_ids, q_mask = tok.encode_batch(qs, args.max_length)
        d_ids, d_mask = tok.encode_batch(ds, args.max_length)
        loss = trainer.train_step(q_ids, q_mask, d_ids, d_mask)
        if step % 50 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {loss:.4f} ({time.time()-t0:.0f}s)", flush=True)
    train_s = time.time() - t0

    host_params = jax.tree.map(np.asarray, dict(trainer.params))
    save_hf_weights(host_params, cfg, args.out)
    print(f"trained checkpoint saved to {args.out}", flush=True)

    # the tier re-enters through the standard loader path: fresh encoder cache
    enc_mod._ENCODER_CACHE.clear()
    os.makedirs(args.tier, exist_ok=True)
    prefix = os.path.join(args.tier, "trained.leann")
    t0 = time.time()
    bld = LeannBuilder(backend_name="diskann", embedding_model=args.out,
                       max_length=args.max_length, graph_degree=32,
                       distance_metric="cosine")
    for c in chunks:
        bld.add_text(c)
    bld.build_index(prefix)
    build_s = time.time() - t0
    print(f"index built in {build_s:.0f}s", flush=True)

    # oracle through the SAME calibrated encoder the searcher serves
    enc = enc_mod.get_encoder(args.out, max_length=args.max_length)
    calib_path = prefix + ".calib.npz"
    if os.path.exists(calib_path):
        z = np.load(calib_path)
        enc = enc.with_calibration({"out_center": z["out_center"], "out_pc": z["out_pc"]})
    t0 = time.time()
    emb = enc.encode(chunks)
    emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    print(f"oracle matrix encoded in {time.time()-t0:.0f}s", flush=True)

    s = LeannSearcher(prefix)
    kw = dict(top_k=3, complexity=args.complexity, beam_width=16, rerank_size=64)

    def eval_queries(queries):
        qe = enc.encode(queries)
        qe /= np.maximum(np.linalg.norm(qe, axis=1, keepdims=True), 1e-12)
        truth = np.argsort(-qe @ emb.T, axis=1)[:, :3].astype(np.int32)
        s.search(queries, **kw)  # compile warmup
        t0 = time.time()
        res = s.search(queries, **kw)
        ms = (time.time() - t0) * 1000 / len(queries)
        labels = [[int(r.id) for r in row] for row in res]
        hits = sum(len(set(l) & set(t.tolist())) for l, t in zip(labels, truth))
        return truth, hits / (3 * len(queries)), tie_aware_recall(emb, qe, labels, truth), ms

    # HEADLINE: held-out templates + sibling-paraphrased entities
    truth, recall, tie, ms = eval_queries(eval_q)
    # seen-distribution diagnostic (the old circular protocol, all templates)
    _, seen_recall, seen_tie, _ = eval_queries(seen_q)

    json.dump(eval_q, open(os.path.join(args.tier, "queries_question.json"), "w"))
    np.save(os.path.join(args.tier, "truth_question.npy"), truth)
    info = {"n_chunks": args.n_chunks, "steps": args.steps, "batch": b,
            "final_loss": round(float(loss), 4), "train_s": round(train_s, 1),
            "build_s": round(build_s, 1),
            "eval_protocol": "question_heldout (templates 5-6 unseen in "
                             "training; entities from sibling restatements)",
            "recall_at_3": round(recall, 4),
            "tie_recall_at_3": round(float(tie), 4),
            "seen_template_recall_at_3": round(seen_recall, 4),
            "seen_template_tie_recall_at_3": round(float(seen_tie), 4),
            "batched_ms_per_query": round(ms, 2),
            "platform": jax.devices()[0].platform}
    json.dump(info, open(os.path.join(args.tier, "train_info.json"), "w"))
    print(json.dumps(info), flush=True)


if __name__ == "__main__":
    main()
