"""Canonical API demo: build → search → chat (reference examples/basic_demo.py).

Indexes Pride & Prejudice paragraphs with the on-TPU encoder, searches with
fused recompute beam search, and answers a question with the simulated LLM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leann_tpu import LeannBuilder, LeannChat, LeannSearcher  # noqa: E402

DATA = "/root/reference/data/PrideandPrejudice.txt"
INDEX = "./demo_index/pp.leann"


def main():
    if not os.path.exists(INDEX + ".meta.json"):
        text = open(DATA, encoding="utf-8").read()
        paras = [p.strip().replace("\n", " ") for p in text.split("\n\n") if len(p.strip()) > 120]
        builder = LeannBuilder(backend_name="hnsw", embedding_model="hash-minilm", max_length=128)
        for i, p in enumerate(paras[:500]):
            builder.add_text(p, metadata={"paragraph": i})
        builder.build_index(INDEX)
        print(f"Built index with {min(500, len(paras))} chunks")

    searcher = LeannSearcher(INDEX)
    results = searcher.search("What does Mr. Darcy say about pride?", top_k=3)
    for r in results:
        print(f"[{r.score:.3f}] {r.text[:120]}")

    chat = LeannChat(INDEX, llm_config={"type": "simulated"}, searcher=searcher)
    print("\nQ: Who is Mr. Bingley?")
    print("A:", chat.ask("Who is Mr. Bingley?", top_k=3))


if __name__ == "__main__":
    main()
