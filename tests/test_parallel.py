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


def test_data_parallel_batched_generation():
    """DataParallelEngine: batched continuous generation with slots sharded
    over dp matches the greedy single-device sequences."""
    from gsv_tts_tpu.parallel.shard import DataParallelEngine

    params = t2s_model.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    mesh = pmesh.make_mesh(8, dp=8, tp=1)
    dp_eng = DataParallelEngine(params, CFG, gpt_cache=[(1, 128), (8, 128)],
                                dtype=jnp.float32, mesh=mesh)
    ref_eng = __import__("gsv_tts_tpu.runtime.t2s_session",
                         fromlist=["T2SEngine"]).T2SEngine(
        params, CFG, gpt_cache=[(1, 128), (8, 128)], dtype=jnp.float32)

    rng = np.random.RandomState(7)
    xs, ys, bs = [], [], []
    for i in range(5):
        lx, ly = 6 + i % 3, 4 + i % 2
        xs.append(rng.randint(1, 64, (lx,)).astype(np.int32))
        ys.append(rng.randint(0, 100, (ly,)).astype(np.int32))
        bs.append(np.zeros((lx, CFG.bert_dim), np.float32))

    pred_dp, idx_dp = dp_eng.generate_batched(xs, ys, bs, top_k=1,
                                              rng=jax.random.PRNGKey(0))
    pred_1, idx_1 = ref_eng.generate_batched(xs, ys, bs, top_k=1,
                                             rng=jax.random.PRNGKey(0))
    by_idx_dp = {int(i): t.tolist() for t, i in zip(pred_dp, idx_dp)}
    by_idx_1 = {int(i): t.tolist() for t, i in zip(pred_1, idx_1)}
    assert by_idx_dp == by_idx_1


def test_tp_sharded_generate_matches_single_device():
    """T2SEngine.shard(): tp-sharded weights + head-sharded KV caches under
    GSPMD produce token-identical greedy generations."""
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    params = t2s_model.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    rng = np.random.RandomState(11)
    x = rng.randint(1, 64, (10,)).astype(np.int32)
    y = rng.randint(0, 100, (6,)).astype(np.int32)
    b = np.zeros((10, CFG.bert_dim), np.float32)

    eng1 = T2SEngine(params, CFG, gpt_cache=[(1, 96)], dtype=jnp.float32)
    toks1 = eng1.generate(x, y, b, top_k=1, rng=jax.random.PRNGKey(5))

    mesh = pmesh.make_mesh(8, dp=2, tp=4)
    eng2 = T2SEngine(params, CFG, gpt_cache=[(1, 96)],
                     dtype=jnp.float32).shard(mesh)
    assert eng2.attn_impl == "xla"
    toks2 = eng2.generate(x, y, b, top_k=1, rng=jax.random.PRNGKey(5))
    assert np.asarray(toks1).ravel().tolist() == \
        np.asarray(toks2).ravel().tolist()


def test_tp_dp_sharded_batched_matches_single_device():
    """Batched continuous generation on a dp=2 x tp=4 mesh (caches sharded on
    batch AND heads) matches the single-device engine per request."""
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    params = t2s_model.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    cache = [(1, 128), (4, 128)]
    rng = np.random.RandomState(7)
    xs, ys, bs = [], [], []
    for i in range(5):
        lx, ly = 6 + i % 3, 4 + i % 2
        xs.append(rng.randint(1, 64, (lx,)).astype(np.int32))
        ys.append(rng.randint(0, 100, (ly,)).astype(np.int32))
        bs.append(np.zeros((lx, CFG.bert_dim), np.float32))

    eng1 = T2SEngine(params, CFG, gpt_cache=cache, dtype=jnp.float32)
    pred1, idx1 = eng1.generate_batched(xs, ys, bs, top_k=1,
                                        rng=jax.random.PRNGKey(0))

    mesh = pmesh.make_mesh(8, dp=2, tp=4)
    eng2 = T2SEngine(params, CFG, gpt_cache=cache,
                     dtype=jnp.float32).shard(mesh)
    pred2, idx2 = eng2.generate_batched(xs, ys, bs, top_k=1,
                                        rng=jax.random.PRNGKey(0))
    by1 = {int(i): t.tolist() for t, i in zip(pred1, idx1)}
    by2 = {int(i): t.tolist() for t, i in zip(pred2, idx2)}
    assert by1 == by2


def test_make_optimizer_schedule_and_training():
    """Warmup-cosine AdamW + ragged pad_batch: loss decreases, schedule
    warms up then decays."""
    from gsv_tts_tpu.parallel.train import make_optimizer, pad_batch

    optimizer, schedule = make_optimizer(peak_lr=3e-3, warmup_steps=4,
                                         decay_steps=32)
    assert float(schedule(0)) == 0.0
    assert float(schedule(4)) == pytest.approx(3e-3, rel=1e-6)
    assert float(schedule(32)) < float(schedule(8))

    rng = np.random.RandomState(0)
    samples = [(rng.randint(1, 64, (5 + i,)).astype(np.int32),
                rng.randint(0, 100, (7 + i % 3,)).astype(np.int32),
                None) for i in range(4)]
    batch = pad_batch(CFG, samples, pad_multiple=8)
    assert batch["x_ids"].shape[1] % 8 == 0
    assert int(batch["x_lens"][3]) == 8 and int(batch["y_lens"][0]) == 7

    params = t2s_model.init_params(jax.random.PRNGKey(2), CFG, dtype=jnp.float32)
    opt_state = optimizer.init(params)
    step = jax.jit(make_train_step(CFG, optimizer, dtype=jnp.float32))
    losses = []
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_remat_grads_match():
    """jax.checkpoint rematerialization: identical loss and gradients."""
    from gsv_tts_tpu.parallel.train import t2s_loss

    params = t2s_model.init_params(jax.random.PRNGKey(4), CFG, dtype=jnp.float32)
    batch = _batch(2, seed=9)

    def loss_fn(remat):
        return lambda p: t2s_loss(p, CFG, batch["x_ids"], batch["y_ids"],
                                  batch["bert"], batch["x_lens"],
                                  batch["y_lens"], jnp.float32, remat=remat)

    l1, g1 = jax.jit(jax.value_and_grad(loss_fn(False)))(params)
    l2, g2 = jax.jit(jax.value_and_grad(loss_fn(True)))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_seq_parallel_train_step_matches_single_device():
    """sp (sequence/context parallelism): the ``seq_mesh`` constraint shards
    the packed-prompt TIME axis over ``tp`` — loss and updated params must
    match the unsharded step (GSPMD inserts the attention gathers)."""
    import optax

    params = t2s_model.init_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    optimizer = optax.sgd(1.0)
    batch = _batch(4, Lx=16, Ly=16, seed=3)

    step = jax.jit(make_train_step(CFG, optimizer, dtype=jnp.float32))
    p1, _, loss1 = step(params, optimizer.init(params), batch)

    mesh = pmesh.make_mesh(8, dp=2, tp=4)
    sp = pmesh.shard_t2s_params(params, mesh)
    so = jax.device_put(optimizer.init(params), pmesh.replicated(mesh))
    sb = {k: jax.device_put(v, pmesh.batch_sharding(mesh))
          for k, v in batch.items()}
    step_sp = jax.jit(make_train_step(CFG, optimizer, dtype=jnp.float32,
                                      seq_mesh=mesh))
    p2, _, loss2 = step_sp(sp, so, sb)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=2e-5)
