"""Pipeline-parallel (GPipe) t2s training vs the single-device oracle.

The pp step (``parallel/pipeline.py``) must compute the SAME loss and
gradients as the dense ``parallel/train.py:make_train_step`` — the microbatch
skew, ppermute hops, and autodiff through the tick scan are an execution
schedule, not a numerics change.  Comparisons run with ``optax.sgd(1.0)`` so
one step's param delta IS the gradient (AdamW's ``g/(√v+ε)`` amplifies
±1e-8 sign noise near zero-gradient elements into ~2·lr deltas).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from gsv_tts_tpu.models import t2s as t2s_model
from gsv_tts_tpu.models.t2s import T2SConfig
from gsv_tts_tpu.parallel import pipeline as pp_mod
from gsv_tts_tpu.parallel.train import make_train_step

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _cfg():
    return T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                     num_layers=8, vocab_size=101, phoneme_vocab_size=64,
                     eos=100)


def _batch(cfg, B=8, Lx=8, Ly=12, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "x_ids": jnp.asarray(rng.randint(1, 64, (B, Lx)), jnp.int32),
        "y_ids": jnp.asarray(rng.randint(0, 100, (B, Ly)), jnp.int32),
        "bert": jnp.asarray(
            rng.randn(B, Lx, cfg.bert_dim).astype(np.float32) * 0.02),
        "x_lens": jnp.asarray(rng.randint(4, Lx + 1, (B,)), jnp.int32),
        "y_lens": jnp.asarray(rng.randint(4, Ly + 1, (B,)), jnp.int32),
    }


@pytest.fixture(scope="module")
def oracle():
    cfg = _cfg()
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    batch = _batch(cfg)
    opt = optax.sgd(1.0)
    step = jax.jit(make_train_step(cfg, opt, dtype=jnp.float32))
    p1, _, loss = step(dict(params), opt.init(params), batch)
    grads = jax.tree.map(lambda a, b: a - b, params, p1)
    return cfg, params, batch, float(loss), grads


def _run_pp(cfg, params, batch, dp, pp, n_micro, remat=False):
    mesh = pp_mod.make_mesh_dp_pp(8, dp=dp, pp=pp)
    opt = optax.sgd(1.0)
    pparams = pp_mod.shard_pp_params(params, mesh)
    step = jax.jit(pp_mod.make_pp_train_step(
        cfg, opt, mesh, n_micro=n_micro, dtype=jnp.float32, remat=remat))
    p1, _, loss = step(pparams, opt.init(pparams), batch)
    grads = jax.tree.map(lambda a, b: a - b, params, p1)
    return float(loss), grads


@pytest.mark.parametrize("dp,pp,n_micro", [(2, 4, 2), (1, 8, 4), (4, 2, 2)])
def test_pp_matches_single_device(oracle, dp, pp, n_micro):
    cfg, params, batch, loss_ref, grads_ref = oracle
    loss, grads = _run_pp(cfg, params, batch, dp, pp, n_micro)
    assert abs(loss - loss_ref) < 2e-5
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), grads, grads_ref)
    assert max(jax.tree.leaves(deltas)) < 2e-5, deltas


def test_pp_remat_matches(oracle):
    cfg, params, batch, loss_ref, grads_ref = oracle
    loss, grads = _run_pp(cfg, params, batch, 2, 4, 2, remat=True)
    assert abs(loss - loss_ref) < 2e-5
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), grads, grads_ref)
    assert max(jax.tree.leaves(deltas)) < 2e-5


def test_pp_microbatch_count_invariant(oracle):
    """n_micro is a schedule knob: gradients must not depend on it."""
    cfg, params, batch, _, _ = oracle
    _, g2 = _run_pp(cfg, params, batch, 2, 4, 2)
    _, g4 = _run_pp(cfg, params, batch, 2, 4, 4)
    deltas = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), g2, g4)
    assert max(jax.tree.leaves(deltas)) < 2e-5


def test_pp_ragged_lengths_masked(oracle):
    """Loss ignores padding: lengthening the y padding must not change it."""
    cfg, params, batch, loss_ref, _ = oracle
    batch2 = dict(batch)
    pad = jnp.zeros((batch["y_ids"].shape[0], 6), jnp.int32)
    batch2["y_ids"] = jnp.concatenate([batch["y_ids"], pad], axis=1)
    loss, _ = _run_pp(cfg, params, batch2, 2, 4, 2)
    assert abs(loss - loss_ref) < 2e-5
