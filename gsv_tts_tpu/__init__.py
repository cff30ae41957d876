"""gsv-tts-lite-tpu: TPU-native (JAX/XLA/Pallas) GPT-SoVITS inference engine.

Public surface mirrors the reference package (``gsv_tts/__init__.py:1-11``):
``TTS``, ``AudioClip``, ``cut_text``.
"""

__version__ = "0.1.0"

from .player import AudioClip  # noqa: F401
from .frontend.text_processor import cut_text  # noqa: F401


def __getattr__(name):
    # TTS pulls in jax/model modules; keep import lazy so light-weight users
    # (frontend only) stay fast.
    if name == "TTS":
        from .tts import TTS

        return TTS
    if name == "WaveOverloadedError":
        # raised by stream_shared at the wave_max_clients admission cap —
        # exported here so callers need not import runtime internals
        from .runtime.wave import WaveOverloadedError

        return WaveOverloadedError
    raise AttributeError(name)


__all__ = ["TTS", "AudioClip", "cut_text", "WaveOverloadedError"]
