"""Frontend-language backends beyond the native Engine/RuntimeEndpoint
(analog of sglang lang/backend/{openai,anthropic,litellm,vertexai}.py).

Each backend exposes `generate(prompt, sp) -> str` (the interpreter's
only required hook) and optionally `score_choices(prompt, choices)` for
likelihood-based select. Third-party backends are import-gated: this
image is zero-egress, so they activate only where their SDKs and
credentials exist.
"""

from __future__ import annotations

import os
from typing import List, Optional


class OpenAIBackend:
    """Any OpenAI-compatible /v1/completions endpoint — including this
    framework's own server — via plain HTTP (the reference wraps the
    openai SDK; requests keeps it dependency-free)."""

    def __init__(self, model: str, base_url: str = "https://api.openai.com/v1",
                 api_key: Optional[str] = None, is_chat: bool = False):
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.is_chat = is_chat

    def _headers(self):
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        return h

    def generate(self, prompt: str, sp: dict) -> str:
        import requests

        if self.is_chat:
            body = {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": sp.get("max_new_tokens", 128),
                "temperature": sp.get("temperature", 1.0),
                "top_p": sp.get("top_p", 1.0),
                "stop": sp.get("stop"),
            }
            r = requests.post(f"{self.base_url}/chat/completions",
                              json=body, headers=self._headers(), timeout=600)
            r.raise_for_status()
            return r.json()["choices"][0]["message"]["content"]
        body = {
            "model": self.model,
            "prompt": prompt,
            "max_tokens": sp.get("max_new_tokens", 128),
            "temperature": sp.get("temperature", 1.0),
            "top_p": sp.get("top_p", 1.0),
            "stop": sp.get("stop"),
        }
        r = requests.post(f"{self.base_url}/completions", json=body,
                          headers=self._headers(), timeout=600)
        r.raise_for_status()
        return r.json()["choices"][0]["text"]


class AnthropicBackend:
    """Anthropic messages API (reference lang/backend/anthropic.py).
    Requires the `anthropic` SDK + ANTHROPIC_API_KEY."""

    def __init__(self, model: str, api_key: Optional[str] = None):
        try:
            import anthropic
        except ImportError as e:  # pragma: no cover - sdk absent in image
            raise ImportError(
                "AnthropicBackend requires the `anthropic` package") from e
        self.model = model
        self.client = anthropic.Anthropic(
            api_key=api_key or os.environ.get("ANTHROPIC_API_KEY"))

    def generate(self, prompt: str, sp: dict) -> str:  # pragma: no cover
        resp = self.client.messages.create(
            model=self.model,
            max_tokens=sp.get("max_new_tokens", 128),
            temperature=sp.get("temperature", 1.0),
            messages=[{"role": "user", "content": prompt}],
        )
        return resp.content[0].text


class LiteLLMBackend:
    """Any provider through litellm.completion
    (reference lang/backend/litellm.py)."""

    def __init__(self, model: str, **client_kwargs):
        try:
            import litellm
        except ImportError as e:  # pragma: no cover - sdk absent in image
            raise ImportError(
                "LiteLLMBackend requires the `litellm` package") from e
        self.litellm = litellm
        self.model = model
        self.client_kwargs = client_kwargs

    def generate(self, prompt: str, sp: dict) -> str:  # pragma: no cover
        resp = self.litellm.completion(
            model=self.model,
            messages=[{"role": "user", "content": prompt}],
            max_tokens=sp.get("max_new_tokens", 128),
            temperature=sp.get("temperature", 1.0),
            **self.client_kwargs,
        )
        return resp.choices[0].message.content


class VertexAIBackend:
    """Google Vertex AI generative models
    (reference lang/backend/vertexai.py)."""

    def __init__(self, model: str, project: Optional[str] = None,
                 location: str = "us-central1"):
        try:
            import vertexai
            from vertexai.generative_models import GenerativeModel
        except ImportError as e:  # pragma: no cover - sdk absent in image
            raise ImportError(
                "VertexAIBackend requires the `google-cloud-aiplatform` "
                "package") from e
        vertexai.init(project=project, location=location)
        self.model = GenerativeModel(model)

    def generate(self, prompt: str, sp: dict) -> str:  # pragma: no cover
        resp = self.model.generate_content(
            prompt,
            generation_config={
                "max_output_tokens": sp.get("max_new_tokens", 128),
                "temperature": sp.get("temperature", 1.0),
            },
        )
        return resp.text
