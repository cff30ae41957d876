"""Device mesh and sharding layout for multi-chip execution.

The reference is single-GPU (SURVEY §2.8: no distributed runtime).  The
TPU-native scale-out story is:
  * ``dp`` (data) axis — shard request batches across chips for
    ``infer_batched`` and training;
  * ``tp`` (tensor) axis — shard attention heads / MLP hidden of the t2s
    transformer for larger models / lower latency.

Everything goes through ``jax.sharding.NamedSharding`` + jit: shardings are
annotated on params and batch inputs and XLA GSPMD inserts the collectives
(all-reduce over ``tp`` for row-parallel matmuls, etc.) over ICI.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None,
              tp: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if tp is None and dp is None:
        # favour tensor parallelism within a chip group of ≤4, data beyond
        tp = 1
        for cand in (4, 2, 1):
            if n % cand == 0 and cand <= n:
                tp = cand
                break
        dp = n // tp
    elif tp is None:
        tp = n // dp
    elif dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != n_devices({n})"
    dev_array = np.asarray(devices).reshape(dp, tp)
    return Mesh(dev_array, ("dp", "tp"))


def t2s_param_sharding(mesh: Mesh):
    """NamedSharding pytree for the t2s params (stacked-layer layout,
    ``models/t2s.py``): column-parallel qkv/mlp1, row-parallel out/mlp2,
    replicated embeddings/norms."""

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    rep = ns()
    return {
        "text_emb": rep,
        "audio_emb": rep,
        "bert_proj_w": rep,
        "bert_proj_b": rep,
        "text_pos_alpha": rep,
        "audio_pos_alpha": rep,
        "predict_w": rep,
        "pe": rep,
        "layers": {
            "qkv_w": ns(None, None, "tp"),   # [L, D, 3D] column-parallel
            "qkv_b": ns(None, "tp"),
            "out_w": ns(None, "tp", None),   # [L, D, D] row-parallel
            "out_b": rep,
            "ln1_g": rep, "ln1_b": rep, "ln2_g": rep, "ln2_b": rep,
            "mlp1_w": ns(None, None, "tp"),  # [L, D, M] column-parallel
            "mlp1_b": ns(None, "tp"),
            "mlp2_w": ns(None, "tp", None),  # [L, M, D] row-parallel
            "mlp2_b": rep,
        },
    }


def batch_sharding(mesh: Mesh):
    """Inputs sharded over ``dp`` on the leading (batch) axis."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_t2s_params(params, mesh: Mesh):
    shardings = t2s_param_sharding(mesh)
    return jax.tree.map(jax.device_put, params, shardings)
