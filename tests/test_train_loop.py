"""Resumable training loops (train_loop.py): checkpoint roundtrip fidelity
and the interrupted-run == uninterrupted-run guarantee for both stages.
The reference is inference-only (SURVEY §4), so these are anchored by
self-consistency: a resume must replay the exact batch order, rng draws,
and optimizer trajectory of a straight run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu import train_loop
from gsv_tts_tpu.hparams import HParams
from gsv_tts_tpu.models import sovits as jsv
from gsv_tts_tpu.models import sovits_train as svt
from gsv_tts_tpu.models import t2s as t2s_model
from gsv_tts_tpu.models.t2s import T2SConfig


def tiny_t2s_cfg():
    return T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                     num_layers=2, vocab_size=101, phoneme_vocab_size=64,
                     eos=100)


def make_t2s_samples(n=6, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        lx = int(rng.randint(5, 11))
        ly = int(rng.randint(6, 13))
        out.append((rng.randint(1, 64, lx).astype(np.int32),
                    rng.randint(0, 100, ly).astype(np.int32), None))
    return out


def assert_trees_equal(a, b):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(fb[path]),
                                      err_msg=jax.tree_util.keystr(path))


def test_train_state_roundtrip_and_mismatch(tmp_path):
    state = {
        "params": {"w": jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) / 3,
                   "b": jnp.zeros((3,), jnp.float32)},
        "step": 7,
    }
    path = str(tmp_path / "st.npz")
    train_loop.save_train_state(path, state)
    template = {
        "params": {"w": jnp.zeros((2, 3), jnp.bfloat16),
                   "b": jnp.zeros((3,), jnp.float32)},
        "step": 0,
    }
    back = train_loop.load_train_state(path, template)
    assert back["params"]["w"].dtype == jnp.bfloat16
    assert_trees_equal(state["params"], back["params"])
    assert int(back["step"]) == 7

    bad = {"params": {"w": jnp.zeros((2, 3), jnp.bfloat16)}, "step": 0}
    with pytest.raises(ValueError, match="does not match"):
        train_loop.load_train_state(path, bad)
    bad_shape = {
        "params": {"w": jnp.zeros((3, 2), jnp.bfloat16),
                   "b": jnp.zeros((3,), jnp.float32)},
        "step": 0,
    }
    with pytest.raises(ValueError, match="shape"):
        train_loop.load_train_state(path, bad_shape)


def test_finetune_t2s_resume_matches_straight_run(tmp_path):
    cfg = tiny_t2s_cfg()
    samples = make_t2s_samples()
    init = t2s_model.init_params(jax.random.PRNGKey(3), cfg,
                                 dtype=jnp.float32)
    common = dict(total_steps=5, batch_size=2, init_params=init,
                  dtype=jnp.float32, peak_lr=1e-3, warmup_steps=2,
                  ckpt_every=100, log_every=100, export=False,
                  log_fn=lambda *_: None)

    straight = train_loop.finetune_t2s(
        samples, cfg, str(tmp_path / "a"), **common)

    # interrupted mid-epoch (bpe=3, stop at step 2) then resumed
    out_b = str(tmp_path / "b")
    train_loop.finetune_t2s(samples, cfg, out_b, max_steps_this_run=2,
                            **common)
    resumed = train_loop.finetune_t2s(samples, cfg, out_b, **common)

    assert_trees_equal(straight, resumed)


def test_finetune_t2s_exports_loadable_checkpoint(tmp_path):
    cfg = tiny_t2s_cfg()
    samples = make_t2s_samples()
    out = str(tmp_path / "ft")
    params = train_loop.finetune_t2s(
        samples, cfg, out, total_steps=2, batch_size=2, dtype=jnp.float32,
        ckpt_every=100, log_every=100, export=True, log_fn=lambda *_: None)
    import os
    assert os.path.exists(os.path.join(out, "model.safetensors"))
    assert os.path.exists(os.path.join(out, "t2s_state.npz"))
    assert np.isfinite(float(jnp.sum(params["predict_w"])))


def _tiny_sovits():
    cfg = jsv.SovitsConfig(
        spec_channels=129, inter_channels=64, hidden_channels=64,
        filter_channels=96, n_heads=2, n_layers=2, kernel_size=3,
        p_dropout=0.0, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3, 5),), upsample_rates=(2, 2),
        upsample_initial_channel=32, upsample_kernel_sizes=(4, 4),
        gin_channels=512, ref_enc_in=96, flow_n_layers=2)
    params = jsv.init_params(jax.random.PRNGKey(0), cfg)
    hps = HParams({
        "data": {"hop_length": 4, "filter_length": 16, "win_length": 16,
                 "sampling_rate": 16000},
        "train": {"segment_size": 32},
    })
    return cfg, params, hps


def make_sovits_samples(cfg, n=4, seed=1):
    rng = np.random.RandomState(seed)
    hop = 4
    out = []
    for i in range(n):
        T = int(rng.randint(20, 33))
        out.append((rng.randn(768, T).astype(np.float32) * 0.1,
                    np.abs(rng.randn(cfg.spec_channels, T)).astype(np.float32),
                    (rng.randn(T * hop) * 0.1).astype(np.float32),
                    rng.randint(1, 100, size=(9,)).astype(np.int32)))
    return out


def test_finetune_sovits_resume_matches_straight_run(tmp_path):
    cfg, params, hps = _tiny_sovits()
    samples = make_sovits_samples(cfg)
    common = dict(total_steps=3, batch_size=2, init_params=params,
                  segment_frames=4, ckpt_every=100, log_every=100,
                  export=False, log_fn=lambda *_: None)

    straight = train_loop.finetune_sovits(
        samples, cfg, hps, str(tmp_path / "a"), **common)

    out_b = str(tmp_path / "b")
    train_loop.finetune_sovits(samples, cfg, hps, out_b,
                               max_steps_this_run=1, **common)
    resumed = train_loop.finetune_sovits(samples, cfg, hps, out_b, **common)

    assert_trees_equal(straight, resumed)


def test_finetune_sovits_dp_sharded_matches_single(tmp_path):
    """GAN fine-tune under a dp×tp GSPMD mesh: batches shard over dp,
    params replicate, and two steps stay numerically equivalent to the
    unsharded run (the gradient all-reduce is GSPMD-inserted)."""
    from gsv_tts_tpu.parallel.mesh import make_mesh

    cfg, params, hps = _tiny_sovits()
    samples = make_sovits_samples(cfg)
    common = dict(total_steps=2, batch_size=4, init_params=params,
                  segment_frames=4, ckpt_every=100, log_every=100,
                  export=False, log_fn=lambda *_: None)

    single = train_loop.finetune_sovits(
        samples, cfg, hps, str(tmp_path / "a"), **common)
    sharded = train_loop.finetune_sovits(
        samples, cfg, hps, str(tmp_path / "b"),
        mesh=make_mesh(8, dp=2, tp=4), **common)

    # dp-sharded vs single differ only by reduction order (GSPMD psum +
    # oneDNN thread-count-dependent CPU kernels under xdist contention);
    # two GAN steps amplify isolated elements, so bound the BULK tightly
    # and allow a few reduction-order outliers a 10x cap (r3: one element
    # in 40960 crossed a plain 2e-4/2e-5 allclose; under -n 4 a handful
    # cross 5e-4/5e-5)
    for k in single:
        a = np.asarray(single[k], np.float64)
        b = np.asarray(sharded[k], np.float64)
        tol = 5e-5 + 5e-4 * np.abs(b)
        diff = np.abs(a - b)
        frac_bad = float((diff > tol).mean())
        assert frac_bad <= 1e-3, (k, frac_bad)
        assert (diff <= 10 * tol).all(), (k, float((diff / tol).max()))


def test_finetune_sovits_rejects_indivisible_batch(tmp_path):
    from gsv_tts_tpu.parallel.mesh import make_mesh

    cfg, params, hps = _tiny_sovits()
    samples = make_sovits_samples(cfg, n=3)
    with pytest.raises(ValueError, match="divide"):
        train_loop.finetune_sovits(
            samples, cfg, hps, str(tmp_path / "x"), total_steps=1,
            batch_size=3, init_params=params, segment_frames=4,
            export=False, mesh=make_mesh(8, dp=2, tp=4),
            log_fn=lambda *_: None)


def test_finetune_t2s_pp_resume_matches_straight_run(tmp_path):
    """GPipe path of the loop: resume == straight run, and the result is
    params-close to the dense dp×tp run (same data order; f32 reorder)."""
    from gsv_tts_tpu.parallel.pipeline import make_mesh_dp_pp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = tiny_t2s_cfg()
    samples = make_t2s_samples(n=9)
    init = t2s_model.init_params(jax.random.PRNGKey(3), cfg,
                                 dtype=jnp.float32)
    mesh = make_mesh_dp_pp(8, dp=4, pp=2)
    common = dict(total_steps=4, batch_size=8, init_params=init,
                  dtype=jnp.float32, peak_lr=1e-3, warmup_steps=2,
                  mesh=mesh, pp_n_micro=2,
                  ckpt_every=100, log_every=100, export=False,
                  log_fn=lambda *_: None)

    straight = train_loop.finetune_t2s(
        samples, cfg, str(tmp_path / "a"), **common)

    out_b = str(tmp_path / "b")
    train_loop.finetune_t2s(samples, cfg, out_b, max_steps_this_run=2,
                            **common)
    resumed = train_loop.finetune_t2s(samples, cfg, out_b, **common)
    assert_trees_equal(straight, resumed)

    # dense single-device run on the SAME dropped-tail batch schedule is
    # impossible to replicate exactly (dense keeps the ragged tail), so
    # just pin finiteness + movement here; numerical parity with the dense
    # step is covered by tests/test_pipeline.py
    assert np.isfinite(float(jnp.sum(straight["predict_w"])))
    assert float(jnp.max(jnp.abs(straight["predict_w"] -
                                 init["predict_w"]))) > 0


def test_finetune_t2s_pp_rejects_bad_batch(tmp_path):
    from gsv_tts_tpu.parallel.pipeline import make_mesh_dp_pp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    cfg = tiny_t2s_cfg()
    mesh = make_mesh_dp_pp(8, dp=4, pp=2)
    with pytest.raises(ValueError, match="must divide"):
        train_loop.finetune_t2s(
            make_t2s_samples(), cfg, str(tmp_path / "x"), total_steps=1,
            batch_size=6, mesh=mesh, pp_n_micro=4, dtype=jnp.float32,
            log_fn=lambda *_: None)
    with pytest.raises(ValueError, match="full batch"):
        train_loop.finetune_t2s(
            make_t2s_samples(n=4), cfg, str(tmp_path / "y"), total_steps=1,
            batch_size=8, mesh=mesh, pp_n_micro=2, dtype=jnp.float32,
            log_fn=lambda *_: None)
