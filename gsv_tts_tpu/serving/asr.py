"""Optional ASR backends for prompt-text auto-transcription.

The reference calls Qwen3-ASR through dashscope when ``prompt_text`` is
omitted (``API/personal_api.py:92-108``).  This module provides the same
capability as a pluggable ``asr_fn`` for :class:`serving.server.TTSServer`:

    from gsv_tts_tpu.serving.asr import make_asr_fn
    app = create_app(tts, asr_fn=make_asr_fn())

Backends (first available wins): dashscope Qwen3-ASR (needs
``DASHSCOPE_API_KEY``), then any user-registered callable.
"""
from __future__ import annotations

import logging
import os
from typing import Callable, Optional

_CUSTOM: Optional[Callable[[str], str]] = None


def register_asr(fn: Callable[[str], str]):
    """Register a custom transcription callable (audio_path → text)."""
    global _CUSTOM
    _CUSTOM = fn


def _dashscope_asr(audio_path: str) -> str:
    """Qwen3-ASR via dashscope (mirrors ``personal_api.py:92-108``)."""
    import dashscope  # optional dependency

    messages = [
        {"role": "system", "content": [{"text": ""}]},
        {"role": "user", "content": [{"audio": audio_path}]},
    ]
    response = dashscope.MultiModalConversation.call(
        api_key=os.environ.get("DASHSCOPE_API_KEY"),
        model="qwen3-asr-flash",
        messages=messages,
        result_format="message",
        asr_options={"enable_lid": True, "enable_itn": False},
    )
    try:
        return response["output"]["choices"][0]["message"]["content"][0]["text"]
    except (KeyError, IndexError, TypeError):
        logging.error(f"dashscope ASR failed: {response}")
        return ""


def make_asr_fn() -> Optional[Callable[[str], str]]:
    """Returns the best available transcription callable, or None."""
    if _CUSTOM is not None:
        return _CUSTOM
    try:
        import dashscope  # noqa: F401

        if os.environ.get("DASHSCOPE_API_KEY"):
            return _dashscope_asr
    except ImportError:
        pass
    return None
