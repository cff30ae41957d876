"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import t2s as t2s_model
from gsv_tts_tpu.models.t2s import T2SConfig
from gsv_tts_tpu.parallel import mesh as pmesh
from gsv_tts_tpu.parallel.train import make_train_step, t2s_loss

CFG = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4, num_layers=2,
                vocab_size=101, phoneme_vocab_size=64, eos=100)


def _batch(B, Lx=8, Ly=12, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x_ids": jnp.asarray(rng.randint(1, 64, (B, Lx)), jnp.int32),
        "y_ids": jnp.asarray(rng.randint(0, 100, (B, Ly)), jnp.int32),
        "bert": jnp.zeros((B, Lx, CFG.bert_dim), jnp.float32),
        "x_lens": jnp.asarray([Lx - (i % 3) for i in range(B)], jnp.int32),
        "y_lens": jnp.asarray([Ly - (i % 2) for i in range(B)], jnp.int32),
    }


def test_mesh_factorization():
    m = pmesh.make_mesh(8)
    assert m.devices.size == 8
    assert m.axis_names == ("dp", "tp")
    m2 = pmesh.make_mesh(8, dp=8, tp=1)
    assert m2.devices.shape == (8, 1)


def test_sharded_train_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    import optax

    params = t2s_model.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    optimizer = optax.adamw(1e-3)
    batch = _batch(8)

    # single-device reference
    step = jax.jit(make_train_step(CFG, optimizer, dtype=jnp.float32))
    p1, o1, loss1 = step(params, optimizer.init(params), batch)

    # dp=2, tp=4 sharded
    mesh = pmesh.make_mesh(8, dp=2, tp=4)
    sp = pmesh.shard_t2s_params(params, mesh)
    so = jax.device_put(optimizer.init(params), pmesh.replicated(mesh))
    sb = {k: jax.device_put(v, pmesh.batch_sharding(mesh)) for k, v in batch.items()}
    p2, o2, loss2 = jax.jit(make_train_step(CFG, optimizer, dtype=jnp.float32))(sp, so, sb)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p1["layers"]["qkv_w"]), np.asarray(p2["layers"]["qkv_w"]),
        rtol=1e-4, atol=1e-5)


def test_loss_decreases():
    import optax

    params = t2s_model.init_params(jax.random.PRNGKey(1), CFG, dtype=jnp.float32)
    optimizer = optax.adamw(3e-3)
    opt_state = optimizer.init(params)
    batch = _batch(4, seed=3)
    step = jax.jit(make_train_step(CFG, optimizer, dtype=jnp.float32))
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_dryrun_entrypoints():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    toks, kv_len = jax.jit(fn)(*args)
    assert toks.shape == (1, 5)
    assert int(kv_len[0]) == 69  # 64 + 5 decode steps

    mod.dryrun_multichip(8)
