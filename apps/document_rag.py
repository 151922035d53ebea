"""Document RAG: index a directory of documents (txt/md/pdf/...) and chat.

Parity with the reference document_rag (apps/document_rag.py:17-131):
directory reader over ``--data-dir``, optional AST chunking for code files,
``--max-items`` cap.
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from apps.base_rag_example import BaseRAGExample  # noqa: E402
from leann_tpu.chunking import create_text_chunks  # noqa: E402
from leann_tpu.loaders import load_documents  # noqa: E402


class DocumentRAG(BaseRAGExample):
    name = "document"
    description = "RAG over a directory of documents"
    default_index_name = "document_index"

    def _add_specific_arguments(self, parser):
        parser.add_argument("--data-dir", default="./data")
        parser.add_argument("--file-types", nargs="+", default=None)

    async def load_data(self, args) -> List[Dict[str, Any]]:
        docs = load_documents(args.data_dir, file_types=args.file_types, max_items=args.max_items)
        return create_text_chunks(
            docs, chunk_size=args.chunk_size, chunk_overlap=args.chunk_overlap,
            use_ast_chunking=args.use_ast_chunking, ast_chunk_size=args.ast_chunk_size,
            ast_chunk_overlap=args.ast_chunk_overlap,
        )


if __name__ == "__main__":
    DocumentRAG().run()
