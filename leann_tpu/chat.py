"""LLM layer for RAG chat.

Parity with the reference chat stack (leann-core/src/leann/chat.py:413-854):
``LLMInterface.ask()`` with Ollama / HuggingFace / OpenAI / Gemini / Simulated
providers behind a ``get_llm`` factory. Network providers require
reachability; the HF provider loads local checkpoints only (zero-egress).
``SimulatedChat`` doubles as the deterministic fake for tests, exactly like
the reference uses it (chat.py:807-813, tests/test_document_rag.py:23).
"""

from __future__ import annotations

import logging
import os
from abc import ABC, abstractmethod
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)


class LLMInterface(ABC):
    @abstractmethod
    def ask(self, prompt: str, system: Optional[str] = None, **kwargs) -> str: ...


class SimulatedChat(LLMInterface):
    """Deterministic canned responses; echoes a slice of retrieved context so
    RAG tests can assert the context actually reached the LLM."""

    def ask(self, prompt: str, system: Optional[str] = None, **kwargs) -> str:
        context = ""
        if "Context:" in prompt:
            context = prompt.split("Context:", 1)[1].split("Question:", 1)[0].strip()
        head = context[:200].replace("\n", " ")
        return f"[simulated] Based on the retrieved context: {head}"


class OllamaChat(LLMInterface):
    def __init__(self, model: str = "llama3.2:1b", host: str = "http://localhost:11434",
                 thinking_budget: Optional[str] = None):
        self.model, self.host = model, host
        # reasoning-effort mapping for gpt-oss / deepseek-r1 families
        # (reference chat.py:493-514)
        self.thinking_budget = thinking_budget

    def ask(self, prompt: str, system: Optional[str] = None, **kwargs) -> str:
        import json
        import urllib.request

        payload: Dict[str, Any] = {"model": self.model, "prompt": prompt, "stream": False}
        if system:
            payload["system"] = system
        if self.thinking_budget and any(f in self.model for f in ("gpt-oss", "deepseek-r1")):
            payload["options"] = {"reasoning_effort": self.thinking_budget}
        req = urllib.request.Request(
            f"{self.host}/api/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read()).get("response", "")


class OpenAIChat(LLMInterface):
    def __init__(self, model: str = "gpt-4o-mini", thinking_budget: Optional[str] = None):
        from openai import OpenAI

        self.client = OpenAI(api_key=os.environ.get("OPENAI_API_KEY"))
        self.model = model
        self.thinking_budget = thinking_budget

    def ask(self, prompt: str, system: Optional[str] = None, max_tokens: int = 1024, **kwargs) -> str:
        messages = ([{"role": "system", "content": system}] if system else []) + [
            {"role": "user", "content": prompt}
        ]
        params: Dict[str, Any] = {"model": self.model, "messages": messages}
        # o-series parameter shape (reference chat.py:768-790)
        if self.model.startswith(("o1", "o3", "o4")):
            params["max_completion_tokens"] = max_tokens
            if self.thinking_budget:
                params["reasoning_effort"] = self.thinking_budget
        else:
            params["max_tokens"] = max_tokens
        resp = self.client.chat.completions.create(**params)
        return resp.choices[0].message.content or ""


class GeminiChat(LLMInterface):
    def __init__(self, model: str = "gemini-2.0-flash"):
        from google import genai

        self.client = genai.Client(api_key=os.environ.get("GEMINI_API_KEY"))
        self.model = model

    def ask(self, prompt: str, system: Optional[str] = None, **kwargs) -> str:
        full = f"{system}\n\n{prompt}" if system else prompt
        resp = self.client.models.generate_content(model=self.model, contents=full)
        return resp.text or ""


class HFChat(LLMInterface):
    """Local transformers checkpoint (CPU torch in this image)."""

    def __init__(self, model: str, max_new_tokens: int = 256):
        import torch
        from transformers import AutoModelForCausalLM, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(model, local_files_only=True)
        self.model = AutoModelForCausalLM.from_pretrained(model, local_files_only=True, torch_dtype=torch.float32)
        self.max_new_tokens = max_new_tokens

    def ask(self, prompt: str, system: Optional[str] = None, **kwargs) -> str:
        messages = ([{"role": "system", "content": system}] if system else []) + [
            {"role": "user", "content": prompt}
        ]
        # qwen-style no-think toggle parity (chat.py:617-680)
        text = self.tokenizer.apply_chat_template(messages, tokenize=False, add_generation_prompt=True)
        inputs = self.tokenizer(text, return_tensors="pt")
        out = self.model.generate(**inputs, max_new_tokens=self.max_new_tokens, do_sample=False)
        return self.tokenizer.decode(out[0][inputs["input_ids"].shape[1]:], skip_special_tokens=True)


def get_llm(config: Dict[str, Any]) -> LLMInterface:
    """Factory (reference chat.py:816-854). ``config = {"type": ..., "model": ..., ...}``."""
    llm_type = (config.get("type") or "simulated").lower()
    model = config.get("model")
    if llm_type == "simulated":
        return SimulatedChat()
    if llm_type == "ollama":
        return OllamaChat(model=model or "llama3.2:1b", host=config.get("host", "http://localhost:11434"),
                          thinking_budget=config.get("thinking_budget"))
    if llm_type == "openai":
        return OpenAIChat(model=model or "gpt-4o-mini", thinking_budget=config.get("thinking_budget"))
    if llm_type == "gemini":
        return GeminiChat(model=model or "gemini-2.0-flash")
    if llm_type == "hf":
        return HFChat(model=model or "Qwen/Qwen3-0.6B")
    raise ValueError(f"Unknown LLM type {llm_type!r}")
