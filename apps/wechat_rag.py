"""WeChat chat-history RAG.

Parity with the reference wechat_rag (apps/wechat_rag.py:19-189): consumes a
WeChatTweak-style JSON export directory and indexes conversation windows.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.base_rag_example import BaseRAGExample  # noqa: E402
from apps.history_data.wechat_history import load_wechat_export  # noqa: E402


class WeChatRAG(BaseRAGExample):
    name = "wechat"
    description = "RAG over exported WeChat chat history"
    default_index_name = "wechat_index"

    def _add_specific_arguments(self, parser):
        parser.add_argument("--export-dir", required=True, help="directory of exported chat JSON files")
        parser.add_argument("--window", type=int, default=20, help="messages per conversation chunk")

    async def load_data(self, args) -> List[Dict[str, Any]]:
        chunks = load_wechat_export(args.export_dir, window=args.window, max_count=args.max_items)
        if not chunks:
            raise SystemExit(f"No WeChat exports found under {args.export_dir}.")
        print(f"Loaded {len(chunks)} conversation windows")
        return chunks


if __name__ == "__main__":
    WeChatRAG().run()
