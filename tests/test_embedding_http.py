"""HTTP embedding-mode robustness tests against a fake in-process server.

Exercises the reference's Ollama guardrails (embedding_compute.py:509-789):
server reachability errors, model validation with pull hints, per-text
retries, zero-vector fill after exhausted retries, all-failed error, and L2
normalization — plus the OpenAI batching/validation rules (356-432) that
don't need a network at all.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

from leann_tpu.embeddings.compute import (
    _ollama_embeddings,
    _openai_embeddings,
    validate_ollama_model,
)


class FakeOllama:
    """Programmable fake: fail_counts maps prompt -> number of failures to
    serve before succeeding (-1 = always fail)."""

    def __init__(self, models=("nomic-embed-text:latest",), dim=4):
        self.models = list(models)
        self.dim = dim
        self.fail_counts = {}
        self.calls = []

        fake = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, code, obj):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path == "/api/version":
                    self._json(200, {"version": "0.0-fake"})
                elif self.path == "/api/tags":
                    self._json(200, {"models": [{"name": m} for m in fake.models]})
                else:
                    self._json(404, {})

            def do_POST(self):
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n))
                prompt = req.get("prompt", "")
                fake.calls.append(prompt)
                left = fake.fail_counts.get(prompt, 0)
                if left == -1:
                    self._json(500, {"error": "permanent"})
                    return
                if left > 0:
                    fake.fail_counts[prompt] = left - 1
                    self._json(500, {"error": "transient"})
                    return
                rng = np.random.default_rng(abs(hash(prompt)) % (2**31))
                self._json(200, {"embedding": rng.standard_normal(fake.dim).tolist()})

        self.server = HTTPServer(("127.0.0.1", 0), Handler)
        self.host = f"http://127.0.0.1:{self.server.server_port}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def close(self):
        self.server.shutdown()
        self.server.server_close()


@pytest.fixture()
def fake_ollama():
    srv = FakeOllama()
    yield srv
    srv.close()


class TestOllamaRobustness:
    def test_basic_and_normalized(self, fake_ollama):
        emb = _ollama_embeddings(["alpha", "beta"], "nomic-embed-text", host=fake_ollama.host)
        assert emb.shape == (2, 4)
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    def test_versioned_model_resolution(self, fake_ollama):
        # bare name resolves to the locally tagged variant
        name = validate_ollama_model("nomic-embed-text", host=fake_ollama.host)
        assert name == "nomic-embed-text:latest"

    def test_unknown_model_pull_hint(self, fake_ollama):
        with pytest.raises(RuntimeError, match="ollama pull no-such-model"):
            validate_ollama_model("no-such-model", host=fake_ollama.host)

    def test_unreachable_server(self):
        with pytest.raises(RuntimeError, match="Could not connect to Ollama"):
            validate_ollama_model("m", host="http://127.0.0.1:1", timeout=1)

    def test_transient_failure_retried(self, fake_ollama):
        fake_ollama.fail_counts["flaky"] = 2  # succeeds on 3rd attempt
        emb = _ollama_embeddings(["flaky", "ok"], "nomic-embed-text", host=fake_ollama.host)
        assert emb.shape == (2, 4)
        assert np.linalg.norm(emb[0]) > 0.5  # real embedding, not zero fill
        assert fake_ollama.calls.count("flaky") == 3

    def test_permanent_failure_zero_filled(self, fake_ollama):
        fake_ollama.fail_counts["dead"] = -1
        emb = _ollama_embeddings(["dead", "ok"], "nomic-embed-text", host=fake_ollama.host)
        assert emb.shape == (2, 4)
        np.testing.assert_array_equal(emb[0], 0.0)  # zero-vector fallback
        assert np.linalg.norm(emb[1]) > 0.5
        assert fake_ollama.calls.count("dead") == 3  # retried before giving up

    def test_all_failed_raises(self, fake_ollama):
        fake_ollama.fail_counts["a"] = -1
        fake_ollama.fail_counts["b"] = -1
        with pytest.raises(RuntimeError, match="any Ollama embeddings"):
            _ollama_embeddings(["a", "b"], "nomic-embed-text", host=fake_ollama.host)

    def test_long_text_truncated(self, fake_ollama):
        _ollama_embeddings(["x" * 20000], "nomic-embed-text", host=fake_ollama.host)
        assert len(fake_ollama.calls[-1]) == 8000  # 8000-char cap


class TestOpenAIGuards:
    def test_empty_text_rejected(self):
        with pytest.raises(ValueError, match="empty/invalid"):
            _openai_embeddings(["ok", "  "], "text-embedding-3-small")

    def test_missing_api_key(self, monkeypatch):
        monkeypatch.delenv("OPENAI_API_KEY", raising=False)
        with pytest.raises(RuntimeError, match="OPENAI_API_KEY"):
            _openai_embeddings(["ok"], "text-embedding-3-small")


class TestChatModelValidation:
    """get_llm model validation + fuzzy suggestions (reference chat.py:20-250)."""

    def test_ollama_resolves_versioned(self, fake_ollama):
        from leann_tpu.chat import validate_ollama_chat_model

        assert validate_ollama_chat_model("nomic-embed-text", host=fake_ollama.host) \
            == "nomic-embed-text:latest"

    def test_ollama_unknown_suggests(self, fake_ollama):
        from leann_tpu.chat import validate_ollama_chat_model

        with pytest.raises(ValueError, match="ollama pull"):
            validate_ollama_chat_model("nomic-embed-txt", host=fake_ollama.host)
        try:
            validate_ollama_chat_model("nomic-embed-txt", host=fake_ollama.host)
        except ValueError as e:
            assert "nomic-embed-text:latest" in str(e)  # fuzzy suggestion

    def test_ollama_unreachable_is_permissive(self):
        from leann_tpu.chat import validate_ollama_chat_model

        # server down -> assume-exists (error surfaces on first ask instead)
        assert validate_ollama_chat_model("m", host="http://127.0.0.1:1") == "m"

    def test_suggest_layers(self):
        from leann_tpu.chat import suggest_similar_models

        avail = ["llama3.2:1b", "llama3.2:3b", "qwen2.5:7b", "nomic-embed-text:latest"]
        assert suggest_similar_models("llama3.2", avail)[0] == "llama3.2:1b"
        assert suggest_similar_models("qwen", avail)[0] == "qwen2.5:7b"
        assert "llama3.2:1b" in suggest_similar_models("lama3.2:1b", avail)  # typo

    def test_hf_local_dir_ok(self, tmp_path):
        from leann_tpu.chat import validate_hf_model

        d = tmp_path / "ckpt"
        d.mkdir()
        assert validate_hf_model(str(d)) == str(d)

    def test_hf_unknown_raises_with_suggestions(self):
        from leann_tpu.chat import validate_hf_model

        with pytest.raises(ValueError, match="Qwen/Qwen3-0.6B"):
            validate_hf_model("Qwen/Qwen3-0.6")
