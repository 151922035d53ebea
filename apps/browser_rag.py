"""Browser-history RAG (Chrome).

Parity with the reference browser_rag (apps/browser_rag.py:20-171).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.base_rag_example import BaseRAGExample  # noqa: E402
from apps.history_data.history import find_history_databases, load_history  # noqa: E402


class BrowserRAG(BaseRAGExample):
    name = "browser"
    description = "RAG over Chrome browsing history"
    default_index_name = "browser_index"

    def _add_specific_arguments(self, parser):
        parser.add_argument("--history-db", nargs="+", default=None,
                            help="Chrome History sqlite files (default: auto-discover)")

    async def load_data(self, args) -> List[Dict[str, Any]]:
        dbs = args.history_db or find_history_databases()
        if not dbs:
            raise SystemExit("No Chrome history databases found; pass --history-db.")
        entries = load_history(dbs, max_count=args.max_items)
        print(f"Loaded {len(entries)} history entries")
        return [
            {"text": f"{e['title']} — {e['url']}",
             "metadata": {"url": e["url"], "visit_count": e["visit_count"], "profile": e["profile"]}}
            for e in entries
        ]


if __name__ == "__main__":
    BrowserRAG().run()
