"""Data-parallel inference over a device mesh.

The reference's only parallelism is intra-device batching (SURVEY §2.8); the
TPU-native scale-out replicates the engine across chips and shards the
request batch over the ``dp`` axis.  The jitted prefill/decode functions are
sharding-polymorphic — this module just places params (replicated) and the
decode state (batch-sharded) so GSPMD runs every chunk step across the mesh
with no cross-chip collectives in the hot loop (requests are independent).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.t2s_session import T2SEngine


def dp_state_sharding(mesh: Mesh):
    """NamedSharding pytree for DecodeState: batch axis over ``dp``."""
    c = NamedSharding(mesh, P(None, "dp"))      # caches [L, B, S, H, Dh]
    b = NamedSharding(mesh, P("dp"))            # per-slot vectors [B]
    bb = NamedSharding(mesh, P("dp", None))     # tok_buf [B, S]
    r = NamedSharding(mesh, P())                # rng
    from ..runtime.t2s_session import DecodeState

    return DecodeState(k_cache=c, v_cache=c, kv_len=b, x_len=b, tok_buf=bb,
                       buf_len=b, last_tok=b, step_idx=b, rng=r)


class DataParallelEngine(T2SEngine):
    """T2SEngine whose batched generation shards slots across a dp mesh.

    Use with batch-size buckets that are multiples of the dp axis; each chip
    owns ``B/dp`` continuous-batching slots.
    """

    def __init__(self, *args, mesh: Mesh, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        dp = int(np.prod(mesh.devices.shape[:1]))
        for b in self.buckets:
            if b > 1 and b % dp != 0:
                raise ValueError(
                    f"batch bucket {b} not divisible by dp axis {dp}")
        # replicate params across the mesh once
        rep = NamedSharding(mesh, P())
        self.params = jax.device_put(self.params, rep)

    def _alloc_cache(self, B: int, S: int):
        c = self.cfg
        shape = (c.num_layers, B, S, c.num_heads, c.head_dim)
        if B > 1:
            sh = NamedSharding(self.mesh, P(None, "dp"))
        else:
            sh = NamedSharding(self.mesh, P())
        zeros = jax.jit(lambda: (jax.numpy.zeros(shape, self.dtype),
                                 jax.numpy.zeros(shape, self.dtype)),
                        out_shardings=(sh, sh))
        return zeros()
