"""Multi-chip demo (replaces the reference's mlx_demo as the "alternative
engine" example — on TPU the alternative engine IS the device mesh): builds a
corpus, shards graph + PQ codes + token rows over all available devices, and
runs distributed recompute search.

Run on CPU with a virtual mesh:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/sharded_demo.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from leann_tpu.embeddings.encoder import get_encoder  # noqa: E402
from leann_tpu.ops.beam_search import BeamConfig  # noqa: E402
from leann_tpu.ops.graph import build_graph  # noqa: E402
from leann_tpu.ops.pq import encode_pq_blocked, train_pq  # noqa: E402
from leann_tpu.parallel.mesh import graph_mesh  # noqa: E402
from leann_tpu.parallel.sharded_search import ShardedSearcher  # noqa: E402


def main():
    import jax

    devices = jax.devices()
    print(f"devices: {devices}")
    text = open("/root/reference/data/PrideandPrejudice.txt", encoding="utf-8").read()
    paras = [p.strip().replace("\n", " ") for p in text.split("\n\n") if len(p.strip()) > 120][:400]

    enc = get_encoder("hash-minilm", max_length=128)
    emb = enc.encode(paras)
    toks, mask = enc.tokenize(paras, 128)
    lengths = mask.sum(axis=1).astype(np.int32)
    graph, medoid = build_graph(emb, r=16)
    cb = train_pq(emb)
    codes = encode_pq_blocked(emb, cb)

    mesh = graph_mesh(len(devices))
    searcher = ShardedSearcher(
        mesh, graph, entries=np.arange(0, len(paras), 4, dtype=np.int32),
        tokens=toks, lengths=lengths, codes=codes, codebooks=cb,
    )
    cfg = BeamConfig(metric="cosine", k=3, complexity=32, beam=4, max_steps=32,
                     traversal="recompute", enc_cfg=enc.cfg, normalize=True)
    q = enc.encode(["What does Mr. Darcy say about pride?"])
    labels, dists = searcher.search(q, cfg, enc_params=enc.params)
    print("top results (distributed recompute over", len(devices), "devices):")
    for lbl, d in zip(labels[0], dists[0]):
        if lbl >= 0:
            print(f"  [{d:.3f}] {paras[lbl][:110]}")


if __name__ == "__main__":
    main()
