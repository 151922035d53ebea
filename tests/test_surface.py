"""Chunking / loaders / CLI / MCP tests (reference test strategy:
test_astchunk_integration.py, test_ci_minimal.py CLI smoke, test_document_rag)."""

import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest


class TestChunking:
    def test_traditional_chunk_sizes(self):
        from leann_tpu.chunking import create_traditional_chunks

        text = ". ".join(f"sentence number {i} with several words here" for i in range(100))
        chunks = create_traditional_chunks([text], chunk_size=50, chunk_overlap=10)
        assert len(chunks) > 5
        assert all(len(c["text"].split()) <= 60 for c in chunks)

    def test_overlap_carries_text(self):
        from leann_tpu.chunking import create_traditional_chunks

        text = ". ".join(f"s{i} alpha beta gamma delta" for i in range(40))
        chunks = create_traditional_chunks([text], chunk_size=30, chunk_overlap=15)
        # consecutive chunks share at least one sentence
        shared = sum(
            any(s in chunks[i + 1]["text"] for s in chunks[i]["text"].split(". ")[-2:])
            for i in range(len(chunks) - 1)
        )
        assert shared >= len(chunks) // 2

    def test_metadata_propagates(self):
        from leann_tpu.chunking import create_traditional_chunks

        chunks = create_traditional_chunks(["hello world. " * 100], 40, 0, [{"src": "x"}])
        assert all(c["metadata"]["src"] == "x" for c in chunks)

    def test_python_ast_chunking(self):
        from leann_tpu.chunking import create_ast_chunks

        src = textwrap.dedent('''
            import os

            def alpha():
                """First function."""
                return 1

            class Big:
                def method_one(self):
                    return "one"

                def method_two(self):
                    return "two"

            def omega():
                return 3
        ''')
        chunks = create_ast_chunks([{"text": src, "metadata": {"file_path": "m.py"}}], max_chunk_size=10)
        joined = "\n".join(c["text"] for c in chunks)
        assert "def alpha" in joined and "def omega" in joined
        # function bodies stay intact inside a single chunk
        assert any("def alpha" in c["text"] and "return 1" in c["text"] for c in chunks)

    def test_ast_fallback_on_syntax_error(self):
        from leann_tpu.chunking import create_ast_chunks

        chunks = create_ast_chunks([{"text": "def broken(:\n  pass", "metadata": {"file_path": "b.py"}}])
        assert chunks and chunks[0]["text"]

    def test_ast_fallback_disabled_raises(self):
        """--no-ast-fallback-traditional semantics (reference utils.py:299-306:
        fallback off -> the parse error propagates)."""
        import pytest

        from leann_tpu.chunking import create_ast_chunks, create_text_chunks

        bad = [{"text": "def broken(:\n  pass", "metadata": {"file_path": "b.py"}}]
        with pytest.raises(SyntaxError):
            create_ast_chunks(bad, fallback_traditional=False)
        with pytest.raises(SyntaxError):
            create_text_chunks(bad, use_ast_chunking=True, ast_fallback_traditional=False)

    def test_heuristic_code_chunking(self):
        from leann_tpu.chunking import create_ast_chunks

        src = "func main() {\n\tfmt.Println(1)\n}\n\nfunc helper() {\n\treturn\n}\n"
        chunks = create_ast_chunks([{"text": src, "metadata": {"file_path": "m.go"}}], max_chunk_size=4)
        assert len(chunks) >= 2

    def test_unified_router(self):
        from leann_tpu.chunking import create_text_chunks

        docs = [
            {"text": "prose sentence one. prose sentence two.", "metadata": {"file_path": "a.txt"}},
            {"text": "def f():\n    return 1\n", "metadata": {"file_path": "a.py"}},
        ]
        chunks = create_text_chunks(docs, use_ast_chunking=True)
        assert len(chunks) == 2


class TestLoaders:
    def test_load_documents_with_gitignore(self, tmp_path):
        from leann_tpu.loaders import load_documents

        (tmp_path / "keep.txt").write_text("keep me please")
        (tmp_path / "skip.log").write_text("skip me")
        (tmp_path / ".gitignore").write_text("*.log\nsecret/\n")
        (tmp_path / "secret").mkdir()
        (tmp_path / "secret" / "hidden.txt").write_text("secret stuff")
        (tmp_path / ".hidden.txt").write_text("hidden file")
        docs = load_documents(str(tmp_path))
        names = {d["metadata"]["file_name"] for d in docs}
        assert names == {"keep.txt"}

    def test_single_file(self, tmp_path):
        from leann_tpu.loaders import load_documents

        f = tmp_path / "doc.md"
        f.write_text("# title\nbody text")
        docs = load_documents(str(f))
        assert len(docs) == 1 and "body text" in docs[0]["text"]

    def test_max_items(self, tmp_path):
        from leann_tpu.loaders import load_documents

        for i in range(5):
            (tmp_path / f"f{i}.txt").write_text(f"content {i}")
        assert len(load_documents(str(tmp_path), max_items=2)) == 2

    def test_builtin_pdf_reader(self):
        from leann_tpu.loaders import extract_pdf_text

        path = "/root/reference/data/2506.08276v1.pdf"
        if not os.path.exists(path):
            pytest.skip("fixture pdf missing")
        text = extract_pdf_text(path)
        assert len(text) > 1000  # best-effort extraction finds real text


class TestCLI:
    def _run(self, args, cwd):
        env = dict(os.environ, JAX_PLATFORMS="cpu", LEANN_HOME=str(cwd / "home"))
        return subprocess.run(
            [sys.executable, "-m", "leann_tpu.cli", *args],
            capture_output=True, text=True, cwd=str(cwd), timeout=500,
            env={**env, "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))},
        )

    def test_help(self, tmp_path):
        out = self._run(["--help"], tmp_path)
        assert out.returncode == 0
        for sub in ("build", "search", "ask", "list", "remove"):
            assert sub in out.stdout

    @pytest.mark.slow
    def test_build_search_ask_list_remove(self, tmp_path):
        docs = tmp_path / "docs"
        docs.mkdir()
        (docs / "a.txt").write_text("jupiter is the largest planet in the solar system. " * 5)
        (docs / "b.txt").write_text("the stock market fluctuates based on investor sentiment. " * 5)
        r = self._run(["build", "demo", "--docs", str(docs), "--backend", "hnsw",
                       "--embedding-model", "hash-tiny", "--max-length", "64", "-M", "4",
                       "--build-checkpoint-dir", str(tmp_path / "ck")], tmp_path)
        assert r.returncode == 0, r.stderr
        assert (tmp_path / ".leann" / "indexes" / "demo" / "documents.leann.meta.json").exists()
        assert (tmp_path / "ck" / "ckpt_pruned.npy.json").exists()  # phases checkpointed

        r = self._run(["search", "demo", "largest planet", "--top-k", "1",
                       "--complexity", "8", "--beam-width", "2", "--non-interactive"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert "jupiter" in r.stdout.lower()

        r = self._run(["ask", "demo", "what is the largest planet?", "--llm", "simulated",
                       "--complexity", "8"], tmp_path)
        assert r.returncode == 0, r.stderr
        assert "simulated" in r.stdout

        r = self._run(["list"], tmp_path)
        assert r.returncode == 0 and "demo" in r.stdout

        r = self._run(["remove", "demo", "--force"], tmp_path)
        assert r.returncode == 0, r.stderr
        r = self._run(["list"], tmp_path)
        assert "demo" not in r.stdout


class TestMCP:
    def test_initialize_and_tools_list(self):
        from leann_tpu.mcp import handle_request

        resp = handle_request({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
        assert resp["result"]["serverInfo"]["name"] == "leann-tpu-mcp"
        resp = handle_request({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        names = {t["name"] for t in resp["result"]["tools"]}
        assert names == {"leann_search", "leann_list"}

    def test_unknown_method(self):
        from leann_tpu.mcp import handle_request

        resp = handle_request({"jsonrpc": "2.0", "id": 3, "method": "nope"})
        assert "error" in resp

    def test_notification_returns_none(self):
        from leann_tpu.mcp import handle_request

        assert handle_request({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None


class TestEmailReader:
    def test_parse_emlx(self, tmp_path):
        from apps.email_data.email_reader import parse_emlx

        msg = (b"Subject: Hello\r\nFrom: a@x.com\r\nTo: b@y.com\r\nDate: Mon, 1 Jan 2024 00:00:00 +0000\r\n"
               b"Content-Type: text/plain\r\n\r\nThis is the email body.\r\n")
        raw = str(len(msg)).encode() + b"\n" + msg + b"<plist>trailing</plist>"
        f = tmp_path / "1.emlx"
        f.write_bytes(raw)
        parsed = parse_emlx(str(f))
        assert parsed["subject"] == "Hello"
        assert "email body" in parsed["body"]


class TestWeChatReader:
    def test_load_export(self, tmp_path):
        from apps.history_data.wechat_history import load_wechat_export

        data = [{"contact": "alice", "messages": [
            {"from": "alice", "time": "2024-01-01", "text": "hello <img>x</img>"},
            {"from": "me", "time": "2024-01-01", "text": "hi [smile]"},
        ]}]
        (tmp_path / "alice.json").write_text(json.dumps(data))
        chunks = load_wechat_export(str(tmp_path), window=10)
        assert len(chunks) == 1
        assert "hello" in chunks[0]["text"] and "<img>" not in chunks[0]["text"]
        assert chunks[0]["metadata"]["contact"] == "alice"

    def test_wechattweak_export_shape(self, tmp_path):
        """The REAL WeChatTweak artifact: flat message list per contact file,
        media as XML content, wxid sender prefixes, epoch createTime
        (reference apps/history_data/wechat_history.py:93-198)."""
        from apps.history_data.wechat_history import load_wechat_export

        t0 = 1_700_000_000
        data = [
            {"fromUser": "wxid_bob", "content": "wxid_bob:\nlunch tomorrow?",
             "createTime": t0, "isSentFromSelf": False},
            {"fromUser": "me", "content": "sure, noon works",
             "createTime": t0 + 60, "isSentFromSelf": True},
            # media + system payloads must be dropped
            {"fromUser": "wxid_bob", "createTime": t0 + 120,
             "content": '<msg><img cdnurl="http://x" aeskey="k"/></msg>'},
            {"fromUser": "wxid_bob", "createTime": t0 + 130,
             "content": '<msg><emoji productid="p" md5="m"/></msg>'},
            {"fromUser": "wxid_bob", "createTime": t0 + 140,
             "content": '"wxid_bob" recalled a message'},
            # quoted-message dict payload
            {"fromUser": "wxid_bob", "createTime": t0 + 200,
             "content": {"title": "re: lunch", "quoted": "sure, noon works"}},
            # >30 min gap -> new conversation window
            {"fromUser": "wxid_bob", "content": "wxid_bob:\nrunning late",
             "createTime": t0 + 4000, "isSentFromSelf": False},
        ]
        (tmp_path / "bob.json").write_text(json.dumps(data))

        chunks = load_wechat_export(str(tmp_path), time_window_minutes=30)
        assert len(chunks) == 2  # time gap split
        first, second = chunks[0]["text"], chunks[1]["text"]
        assert "lunch tomorrow?" in first and "wxid_bob:" not in first
        assert "[Me]: sure, noon works" in first
        assert "re: lunch | sure, noon works" in first  # dict payload joined
        assert "cdnurl" not in first and "recalled" not in first
        assert "running late" in second
        assert chunks[0]["metadata"]["n_messages"] == 3

        # per-message mode: reference header shape, one doc per message
        per = load_wechat_export(str(tmp_path), concatenate=False)
        assert len(per) == 4
        assert per[0]["text"].startswith("Contact: bob\n")
        assert "Is sent from self: True" in per[1]["text"]

        # include_non_text keeps the media rows via their summary field
        data2 = [{"fromUser": "wxid_bob", "createTime": t0,
                  "content": '<msg><img cdnurl="u"/></msg>', "message": "[Image]"}]
        (tmp_path / "bob.json").write_text(json.dumps(data2))
        kept = load_wechat_export(str(tmp_path), include_non_text=True)
        assert len(kept) == 1 and "[Image]" in kept[0]["text"]

        # max_length closes groups; overlap carries trailing messages
        data3 = [{"fromUser": "wxid_bob", "content": f"wxid_bob:\nmsg {i} " + "x" * 40,
                  "createTime": t0 + i} for i in range(6)]
        (tmp_path / "bob.json").write_text(json.dumps(data3))
        grouped = load_wechat_export(str(tmp_path), max_length=100,
                                     overlap_messages=1)
        assert len(grouped) > 1
        assert "msg 1" in grouped[0]["text"] and "msg 1" in grouped[1]["text"]


class TestBrowserReader:
    def test_load_history_sqlite(self, tmp_path):
        import sqlite3

        from apps.history_data.history import load_history

        db = tmp_path / "History"
        conn = sqlite3.connect(db)
        conn.execute("CREATE TABLE urls (id INTEGER, title TEXT, url TEXT, visit_count INTEGER, last_visit_time INTEGER)")
        conn.execute("INSERT INTO urls VALUES (1, 'JAX docs', 'https://jax.dev', 5, 1000)")
        conn.commit()
        conn.close()
        entries = load_history([str(db)])
        assert entries[0]["title"] == "JAX docs"


class TestStructuralCodeChunking:
    """Lexer-based chunking for brace-family languages (replaces the line
    heuristic for JS/TS/Java/Go/Rust/C-family): matched-brace units, string/
    comment awareness, class descent with header context."""

    def test_java_class_descends_into_methods(self):
        from leann_tpu.chunking import create_ast_chunks

        methods = "\n".join(
            f"    public int method{i}() {{\n        int x{i} = {i} * compute_some_value_{i}(alpha, beta, gamma);\n        return x{i} + offset_{i};\n    }}"
            for i in range(12)
        )
        src = f"public class Big {{\n{methods}\n}}\n"
        chunks = create_ast_chunks([{"text": src, "metadata": {"file_path": "Big.java"}}],
                                   max_chunk_size=40)
        assert len(chunks) > 2
        # every descended chunk carries the class header for context
        assert all(c["text"].startswith("public class Big {") for c in chunks)
        # method bodies are not split mid-signature
        assert any("method0" in c["text"] for c in chunks)
        assert any("method11" in c["text"] for c in chunks)

    def test_js_template_literal_braces_ignored(self):
        from leann_tpu.chunking import _top_level_units

        src = 'function a() {\n  const s = `hello ${ {deep: "}"} } world`;\n}\nfunction b() { return 2; }\n'
        units = _top_level_units(src, "javascript")
        assert len(units) == 2
        assert units[0].startswith("function a")
        assert units[1].startswith("function b")

    def test_string_and_comment_braces_ignored(self):
        from leann_tpu.chunking import _top_level_units

        src = 'int f() {\n  // ignore } this\n  char* s = "also } {";\n  /* and } */\n  return 1;\n}\nint g() { return 2; }\n'
        units = _top_level_units(src, "c")
        assert len(units) == 2

    def test_go_top_level_units(self):
        from leann_tpu.chunking import _top_level_units

        src = 'package main\n\nimport "fmt"\n\nfunc main() {\n\tfmt.Println(`raw } string`)\n}\n\nfunc helper() int {\n\treturn 1\n}\n'
        units = _top_level_units(src, "go")
        # Go has no top-level semicolons: package/import attach to the first
        # func's unit; the two funcs land in separate units with the raw
        # string's brace ignored
        assert len(units) == 2
        assert "func main" in units[0] and "func helper" in units[1]
        assert "raw } string" in units[0]

    def test_rust_lifetimes_not_strings(self):
        from leann_tpu.chunking import _top_level_units

        src = "fn get<'a>(x: &'a str) -> &'a str {\n    let c = 'x';\n    x\n}\nfn two() -> i32 { 2 }\n"
        units = _top_level_units(src, "rust")
        assert len(units) == 2

    def test_unbalanced_falls_back(self):
        from leann_tpu.chunking import create_ast_chunks

        src = "function broken() { if (x) { return 1;\n"  # missing braces
        chunks = create_ast_chunks([{"text": src, "metadata": {"file_path": "b.js"}}])
        assert chunks and chunks[0]["text"]  # traditional fallback kicked in

    def test_small_units_pack(self):
        from leann_tpu.chunking import create_ast_chunks

        src = "\n".join(f"const v{i} = {i};" for i in range(20)) + "\n"
        chunks = create_ast_chunks([{"text": src, "metadata": {"file_path": "a.ts"}}],
                                   max_chunk_size=30)
        assert 1 <= len(chunks) <= 4  # statements packed, not one-per-chunk
