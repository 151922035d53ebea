"""Text + code chunking.

Capability parity with the reference's chunking stack (apps/chunking/
utils.py:15-320): ``detect_code_files`` by extension, ``create_ast_chunks``
for code, ``create_traditional_chunks`` for prose, and the unified
``create_text_chunks`` entry point. The reference delegates to llama-index's
SentenceSplitter and astchunk/tree-sitter; neither ships in this image, so
both paths are self-contained:

* prose: sentence-aware packing with token(≈word)-budget ``chunk_size`` and
  ``chunk_overlap`` carry-over.
* code: Python files are chunked along real AST boundaries (stdlib ``ast``);
  other languages use indentation/brace-aware heuristic block splitting with
  per-document fallback to traditional chunking, mirroring the reference's
  fallback behavior (utils.py:87-178).
"""

from __future__ import annotations

import ast
import logging
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

logger = logging.getLogger(__name__)

# extension -> language (reference utils.py:15-23)
CODE_EXTENSIONS: Dict[str, str] = {
    ".py": "python",
    ".java": "java",
    ".cs": "c_sharp",
    ".ts": "typescript",
    ".tsx": "typescript",
    ".js": "javascript",
    ".jsx": "javascript",
    ".c": "c",
    ".h": "c",
    ".cc": "cpp",
    ".cpp": "cpp",
    ".hpp": "cpp",
    ".go": "go",
    ".rs": "rust",
    ".rb": "ruby",
    ".php": "php",
    ".swift": "swift",
    ".kt": "kotlin",
    ".scala": "scala",
}

_SENT_RE = re.compile(r"(?<=[.!?。！？])\s+|(?<=[。！？；])|\n{2,}")
# word-ish units: whitespace tokens for space-delimited scripts, single chars
# for CJK (which has no spaces — counting only \S+ would pack a whole Chinese
# document into one "small" chunk)
_UNIT_RE = re.compile(r"[一-鿿぀-ヿ가-힯]|[^\s一-鿿぀-ヿ가-힯]+")


def detect_code_files(file_path: str) -> Optional[str]:
    """-> language name for code files, else None."""
    import os

    return CODE_EXTENSIONS.get(os.path.splitext(file_path)[1].lower())


def _words(text: str) -> int:
    return len(_UNIT_RE.findall(text))


def split_sentences(text: str) -> List[str]:
    parts = [s.strip() for s in _SENT_RE.split(text)]
    return [s for s in parts if s]


def create_traditional_chunks(
    texts: Sequence[str],
    chunk_size: int = 256,
    chunk_overlap: int = 128,
    metadata: Optional[Sequence[Dict[str, Any]]] = None,
) -> List[Dict[str, Any]]:
    """Sentence-aware packing into ~chunk_size-word chunks with overlap."""
    out: List[Dict[str, Any]] = []
    for doc_i, text in enumerate(texts):
        md = dict(metadata[doc_i]) if metadata else {}
        sents = split_sentences(text) or ([text.strip()] if text.strip() else [])
        cur: List[str] = []
        cur_words = 0
        for s in sents:
            w = _words(s)
            if w > chunk_size:  # hard-split very long sentences by units
                units = _UNIT_RE.findall(s)
                sep = "" if len(units) > 2 * len(s.split()) else " "  # CJK-ish
                for i in range(0, len(units), chunk_size):
                    piece = sep.join(units[i : i + chunk_size])
                    if cur:
                        out.append({"text": " ".join(cur), "metadata": md})
                        cur, cur_words = [], 0
                    out.append({"text": piece, "metadata": md})
                continue
            if cur_words + w > chunk_size and cur:
                out.append({"text": " ".join(cur), "metadata": md})
                # overlap: carry trailing sentences up to chunk_overlap words
                keep: List[str] = []
                kw = 0
                for prev in reversed(cur):
                    pw = _words(prev)
                    if kw + pw > chunk_overlap:
                        break
                    keep.insert(0, prev)
                    kw += pw
                cur, cur_words = keep, kw
            cur.append(s)
            cur_words += w
        if cur:
            out.append({"text": " ".join(cur), "metadata": md})
    return out


# ---------------------------------------------------------------------------
# AST-aware code chunking
# ---------------------------------------------------------------------------


def _python_ast_chunks(source: str, max_chunk_size: int) -> List[str]:
    """Chunk along top-level def/class boundaries; large classes split by
    method. Falls back (raises) on syntax errors."""
    tree = ast.parse(source)
    lines = source.splitlines()

    def seg(a, b):  # 1-based inclusive line range
        return "\n".join(lines[a - 1 : b])

    blocks: List[Tuple[int, int]] = []
    prev_end = 0
    for node in tree.body:
        start = min(getattr(node, "lineno", prev_end + 1),
                    min((d.lineno for d in getattr(node, "decorator_list", [])), default=10**9))
        end = getattr(node, "end_lineno", start)
        if isinstance(node, ast.ClassDef) and _words(seg(start, end)) > max_chunk_size:
            # split big classes: header + each method
            sub_start = start
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    istart = min(item.lineno, min((d.lineno for d in item.decorator_list), default=10**9))
                    if istart > sub_start:
                        blocks.append((sub_start, istart - 1))
                    blocks.append((istart, item.end_lineno))
                    sub_start = item.end_lineno + 1
            if sub_start <= end:
                blocks.append((sub_start, end))
        else:
            blocks.append((start, end))
        prev_end = end
    # merge small adjacent blocks up to max_chunk_size
    chunks: List[str] = []
    cur: Optional[Tuple[int, int]] = None
    for a, b in blocks:
        if cur and _words(seg(cur[0], b)) <= max_chunk_size:
            cur = (cur[0], b)
        else:
            if cur:
                chunks.append(seg(*cur))
            cur = (a, b)
    if cur:
        chunks.append(seg(*cur))
    return [c for c in chunks if c.strip()]


_BLOCK_START = re.compile(
    r"^(export\s+)?(pub\s+)?(public|private|protected|static|final|async|def|fn|func|function|class|struct|enum|impl|interface|trait|namespace|module|object|type)\b"
)


def _heuristic_code_chunks(source: str, max_chunk_size: int) -> List[str]:
    """Language-agnostic block splitter: break at column-0 block starters."""
    lines = source.splitlines()
    starts = [i for i, ln in enumerate(lines) if ln and not ln[0].isspace() and _BLOCK_START.match(ln)]
    if not starts:
        return [c["text"] for c in create_traditional_chunks([source], chunk_size=max_chunk_size)]
    starts = [0] + [s for s in starts if s != 0] + [len(lines)]
    blocks = ["\n".join(lines[a:b]) for a, b in zip(starts[:-1], starts[1:])]
    chunks: List[str] = []
    cur = ""
    for blk in blocks:
        if cur and _words(cur) + _words(blk) <= max_chunk_size:
            cur = cur + "\n" + blk
        else:
            if cur.strip():
                chunks.append(cur)
            cur = blk
        while _words(cur) > max_chunk_size * 2:  # oversized block: hard split
            words = cur.split()
            chunks.append(" ".join(words[: max_chunk_size]))
            cur = " ".join(words[max_chunk_size:])
    if cur.strip():
        chunks.append(cur)
    return chunks


def create_ast_chunks(
    documents: Sequence[Dict[str, Any]],
    max_chunk_size: int = 512,
    chunk_overlap: int = 64,
    fallback_traditional: bool = True,
) -> List[Dict[str, Any]]:
    """documents: [{"text", "metadata": {"file_path": ...}}]. Per-document
    fallback to traditional chunking on parse failure (reference
    utils.py:87-178); ``fallback_traditional=False`` re-raises instead
    (reference utils.py:299-306)."""
    out: List[Dict[str, Any]] = []
    for doc in documents:
        text = doc.get("text", "")
        md = dict(doc.get("metadata", {}))
        lang = detect_code_files(md.get("file_path", "")) or md.get("language")
        try:
            if lang == "python":
                chunks = _python_ast_chunks(text, max_chunk_size)
            elif lang:
                chunks = _heuristic_code_chunks(text, max_chunk_size)
            else:
                raise ValueError("not a code file")
        except (SyntaxError, ValueError) as e:
            if not fallback_traditional:
                raise
            logger.debug("ast chunking fell back for %s: %s", md.get("file_path"), e)
            chunks = [c["text"] for c in create_traditional_chunks([text], max_chunk_size, chunk_overlap)]
        for c in chunks:
            out.append({"text": c, "metadata": md})
    return out


def create_text_chunks(
    documents: Sequence[Dict[str, Any]],
    chunk_size: int = 256,
    chunk_overlap: int = 128,
    use_ast_chunking: bool = False,
    ast_chunk_size: int = 512,
    ast_chunk_overlap: int = 64,
    code_file_extensions: Optional[Sequence[str]] = None,
    ast_fallback_traditional: bool = True,
) -> List[Dict[str, Any]]:
    """Unified entry (reference utils.py:231-320): routes code files to AST
    chunking when enabled, everything else to traditional chunking."""
    if not use_ast_chunking:
        return create_traditional_chunks(
            [d.get("text", "") for d in documents], chunk_size, chunk_overlap,
            [d.get("metadata", {}) for d in documents],
        )
    exts = set(code_file_extensions) if code_file_extensions else set(CODE_EXTENSIONS)
    code_docs, text_docs = [], []
    for d in documents:
        import os

        ext = os.path.splitext(d.get("metadata", {}).get("file_path", ""))[1].lower()
        (code_docs if ext in exts else text_docs).append(d)
    out = create_ast_chunks(code_docs, ast_chunk_size, ast_chunk_overlap,
                            fallback_traditional=ast_fallback_traditional)
    out += create_traditional_chunks(
        [d.get("text", "") for d in text_docs], chunk_size, chunk_overlap,
        [d.get("metadata", {}) for d in text_docs],
    )
    return out
