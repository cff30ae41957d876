"""Engine configuration and device/dtype policy.

TPU-native counterpart of the reference's ``gsv_tts/Config.py`` (reference
``Config.py:54-96`` picks the best CUDA device and a dtype by SM version).
Here the policy is much simpler: on TPU we always want bfloat16 compute with
float32 accumulation (the MXU's native mode); on CPU (tests, debugging) we
default to float32.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp


def default_platform() -> str:
    try:
        return jax.devices()[0].platform
    except RuntimeError:
        return "cpu"


def default_dtype(platform: Optional[str] = None):
    platform = platform or default_platform()
    if platform in ("tpu", "gpu"):
        return jnp.bfloat16
    return jnp.float32


_DTYPE_MAP = {
    "float32": jnp.float32,
    "fp32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "float16": jnp.float16,
    "fp16": jnp.float16,
}


@dataclasses.dataclass
class Config:
    """Per-engine configuration (mirrors reference ``Config`` semantics).

    ``gpt_cache`` is a list of ``(batch_size, max_seq_len)`` buckets: each
    bucket becomes one fixed-shape jit specialization of the decode step (the
    XLA compile cache plays the role the CUDA-graph pool plays in the
    reference, ``t2s_model.py:210-298``).  ``sovits_cache`` is the list of
    fixed vocoder frame lengths (reference ``models.py:322-369``).
    """

    dtype: Any = None
    platform: str = None
    use_flash_attn: bool = True  # use the Pallas decode-attention kernel
    # int8 weight-streaming t2s decode ("fused_step_q8"): halves the packed
    # weight DMA that bounds B=1 decode (~0.34 ms/tok is pure weight
    # stream); per-lane symmetric weight-only quantization, sampling logits
    # shift by the int8 rounding error (opt-in — token streams are NOT
    # bit-identical to the bf16 engine)
    quant_t2s: bool = False
    # "shared": shared-max online softmax in the batched decode kernel
    # (":shsm" impl suffix) — kills the per-row VPU bookkeeping and, with
    # quant_t2s, gates B = 7/8 waves.  Tokens differ from the per-row path
    # by f32 exp reordering (opt-in, like quant_t2s).
    t2s_softmax: str = "rows"
    # int8 dynamic-quantization BERT featurizer (models/roberta.py):
    # counterpart of the reference's INT8-ONNX CPU backend
    # (cnroberta.py:17-98) — ~4× faster linear layers on AVX-512 CPU hosts,
    # 4× smaller weights; features drift by the int8 rounding (opt-in).
    quant_bert: bool = False
    # Shape-bucket the featurizer jit programs (models/roberta.py,
    # models/hubert.py): pad BERT token batches to a row/column ladder and
    # reference audio to 0.5 s multiples (masked attention + masked
    # group-norm keep the valid rows numerically equivalent).  Bounds the
    # number of XLA compiles when serving arbitrary text lengths /
    # user-uploaded reference audio — without it every novel shape pays a
    # fresh trace+compile (the reference's torch eager featurizers have no
    # such cliff, cnhubert.py:24-35).  Opt-in: padding changes XLA
    # reduction tiling, so features drift ~1 ulp vs the exact-shape run.
    featurizer_buckets: bool = False
    gpt_cache: list = None
    sovits_cache: list = None
    cnroberta: Any = None  # lazily-attached BERT featurizer (see models/roberta.py)
    # Interop: number of host threads the runtime may use for frontend work.
    frontend_workers: int = max(1, (os.cpu_count() or 4) // 2)

    def __post_init__(self):
        if self.platform is None:
            self.platform = default_platform()
        if self.dtype is None:
            self.dtype = default_dtype(self.platform)
        elif isinstance(self.dtype, str):
            self.dtype = _DTYPE_MAP[self.dtype.lower()]


class GlobalConfig:
    """Process-wide singletons (reference ``Config.py:98-108``)."""

    def __init__(self):
        self.models_dir: Optional[Path] = None
        self.use_jieba_fast: Optional[bool] = None
        self.chinese_g2p = None
        self.japanese_g2p = None
        self.english_g2p = None
        # auto-built G2P instances, cached per (lang, models_dir) so TTS
        # facades with different models_dir never see each other's engines
        # (the reference scopes its singletons to GlobalConfig for the same
        # reason, Config.py:98-108)
        self._g2p_auto: dict = {}


global_config = GlobalConfig()
