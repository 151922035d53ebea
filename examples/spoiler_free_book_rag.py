"""Spoiler-free book RAG — the metadata-filtering demo.

Parity with the reference examples/spoiler_free_book_rag.py:144-153: index a
book with per-chapter metadata, then answer questions with a
``{"chapter": {"<=": N}}`` filter so retrieval never leaks passages from
chapters the reader hasn't reached.
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from leann_tpu import LeannBuilder, LeannChat, LeannSearcher  # noqa: E402

DATA = "/root/reference/data/PrideandPrejudice.txt"
INDEX = "./spoiler_free_index/book.leann"


def load_chapters(path):
    text = open(path, encoding="utf-8").read()
    # split on "Chapter N" headings
    parts = re.split(r"\n\s*Chapter\s+([IVXLC\d]+)\.?\s*\n", text)
    chapters = []
    for i in range(1, len(parts) - 1, 2):
        chapters.append((len(chapters) + 1, parts[i + 1]))
    return chapters or [(1, text)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--book", default=DATA)
    ap.add_argument("--up-to-chapter", type=int, default=3)
    ap.add_argument("--query", default="Who has Elizabeth met so far?")
    args = ap.parse_args()

    if not os.path.exists(INDEX + ".meta.json"):
        chapters = load_chapters(args.book)
        builder = LeannBuilder(backend_name="hnsw", embedding_model="hash-minilm", max_length=128)
        for ch_num, ch_text in chapters:
            for p in ch_text.split("\n\n"):
                p = p.strip().replace("\n", " ")
                if len(p) > 120:
                    builder.add_text(p, metadata={"chapter": ch_num})
        builder.build_index(INDEX)
        print(f"Indexed {len(chapters)} chapters")

    searcher = LeannSearcher(INDEX)
    results = searcher.search(
        args.query, top_k=5, metadata_filters={"chapter": {"<=": args.up_to_chapter}}
    )
    print(f"Results restricted to chapters 1..{args.up_to_chapter}:")
    for r in results:
        print(f"  [ch.{r.metadata['chapter']}] {r.text[:100]}")
    assert all(r.metadata["chapter"] <= args.up_to_chapter for r in results), "spoiler leaked!"

    chat = LeannChat(INDEX, llm_config={"type": "simulated"}, searcher=searcher)
    print("A:", chat.ask(args.query, top_k=5, metadata_filters={"chapter": {"<=": args.up_to_chapter}}))


if __name__ == "__main__":
    main()
