"""End-to-end parity of the t2s decoder against the torch reference
(``gsv_tts/GPT_SoVITS/GPT/t2s_model.py``) with shared random weights.

With top_k=1 the sampling pipeline is deterministic (pivot filtering leaves a
single token), so the full prefill → decode loop → EOS/trim behaviour can be
compared token-for-token.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import t2s as jt2s
from gsv_tts_tpu.runtime.t2s_session import T2SEngine
from conftest import import_reference_module

torch = pytest.importorskip("torch")

TINY = {
    "model": {
        "hidden_dim": 64,
        "embedding_dim": 64,
        "head": 4,
        "n_layer": 2,
        "vocab_size": 101,
        "phoneme_vocab_size": 50,
        "dropout": 0.0,
        "EOS": 100,
    }
}


@pytest.fixture(scope="module")
def ref_t2s_module():
    import_reference_module("GPT_SoVITS/GPT/embedding.py", "GPT_SoVITS.GPT.embedding")
    import_reference_module("GPT_SoVITS/GPT/utils.py", "GPT_SoVITS.GPT.utils")
    return import_reference_module("GPT_SoVITS/GPT/t2s_model.py", "GPT_SoVITS.GPT.t2s_model")


@pytest.fixture(scope="module")
def models(ref_t2s_module):
    torch.manual_seed(0)
    ref = ref_t2s_module.Text2SemanticDecoder(TINY)
    ref.eval()
    # shrink initial logits scale so sequences do not hit EOS immediately
    with torch.no_grad():
        ref.ar_predict_layer.weight.mul_(0.5)
    ref.initialize_runtime(torch.float32, torch.device("cpu"), [(1, 96), (1, 128), (2, 128)])
    # the reference allocates cache roots with torch.empty (uninitialized,
    # ``t2s_model.py:245-246``); on CPU recycled pages can hold NaNs that
    # poison SDPA through the additive mask — zero them for determinism
    with torch.inference_mode():
        for bs in ref.cuda_graph_buckets:
            ref.cuda_graph_buckets[bs][-1].k_cache.zero_()
            ref.cuda_graph_buckets[bs][-1].v_cache.zero_()
    # the reference hard-codes suppressed ids 280/486 (``t2s_model.py:170``)
    # which exceed the tiny vocab; align both sides on in-range ids
    ref.suppressed_tokens = [10, 20, ref.EOS]

    import dataclasses as _dc
    cfg = _dc.replace(jt2s.T2SConfig.from_checkpoint_config(TINY),
                      suppressed_tokens=(10, 20))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = jt2s.params_from_torch_state_dict(sd, cfg, dtype=jnp.float32)
    return ref, cfg, params


def _rand_inputs(seed, lx=12, ly=7, vocab_p=50, vocab_a=100):
    rng = np.random.RandomState(seed)
    x = rng.randint(1, vocab_p, size=(lx,)).astype(np.int64)
    y = rng.randint(0, vocab_a, size=(ly,)).astype(np.int64)
    bert = rng.randn(lx, 1024).astype(np.float32) * 0.1
    return x, y, bert


def test_prefill_logits_parity(models):
    ref, cfg, params = models
    x, y, bert = _rand_inputs(1)

    with torch.no_grad():
        xy_pos, mask = ref.process_single_data(
            torch.tensor(x)[None], torch.tensor(y)[None], torch.tensor(bert)[None])
        # run the eager prompt pass against fresh caches
        L, B, H, S, Dh = ref.num_layers, 1, ref.num_head, 64, ref.model_dim // ref.num_head
        k_cache = torch.zeros(L, B, H, S, Dh)
        v_cache = torch.zeros(L, B, H, S, Dh)
        kv_len = torch.zeros(B, dtype=torch.int64)
        h = ref.t2s_transformer.process_prompt(xy_pos, k_cache, v_cache, kv_len, mask)
        ref_logits = ref.ar_predict_layer(h[:, -1]).numpy()

    xy_pos_j, mask_j = jt2s.embed_prompt_single(
        params, cfg, jnp.asarray(x)[None], jnp.asarray(y)[None],
        jnp.asarray(bert)[None], jnp.float32)
    np.testing.assert_allclose(np.asarray(xy_pos_j), xy_pos.numpy(), rtol=1e-5, atol=1e-5)

    h_j, ks, vs = jt2s.transformer_prefill(params, cfg, xy_pos_j, mask_j)
    logits_j = np.asarray(h_j[:, -1] @ params["predict_w"])
    np.testing.assert_allclose(logits_j, ref_logits, rtol=1e-4, atol=1e-4)

    # K/V parity (layout ours [L,B,T,H,Dh] vs ref [L,B,H,S,Dh])
    T = len(x) + len(y)
    np.testing.assert_allclose(
        np.asarray(ks).transpose(0, 1, 3, 2, 4), k_cache[:, :, :, :T].numpy(),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("seed", [2, 3])
def test_generate_token_parity(models, seed):
    ref, cfg, params = models
    x, y, bert = _rand_inputs(seed)

    with torch.no_grad():
        ref_out = ref.infer(
            torch.tensor(x)[None], torch.tensor(y)[None], torch.tensor(bert)[None],
            top_k=1, top_p=1.0, temperature=1.0, repetition_penalty=1.35,
        )
    ref_tokens = ref_out[0, 0].numpy().tolist() if ref_out.numel() else []

    eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128)], dtype=jnp.float32)
    ours = eng.generate(x, y, bert, top_k=1, top_p=1.0, temperature=1.0,
                        repetition_penalty=1.35, rng=jax.random.PRNGKey(0))
    our_tokens = np.asarray(ours).ravel().tolist()

    assert our_tokens == ref_tokens


def test_stream_chunks_concatenate(models):
    ref, cfg, params = models
    x, y, bert = _rand_inputs(5)
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128)], dtype=jnp.float32)
    full = np.asarray(eng.generate(x, y, bert, top_k=1, rng=jax.random.PRNGKey(0))).ravel()

    chunks = list(eng.generate(x, y, bert, top_k=1, rng=jax.random.PRNGKey(0),
                               stream_chunk=10))
    assert chunks[-1][1] is True
    final = np.asarray(chunks[-1][0]).ravel()
    # reference quirk (t2s_model.py:534-553): an EOS-ended STREAM keeps the
    # prefill-sampled first token that the non-stream path drops; cap-ended
    # runs match exactly
    if len(final) == len(full) + 1:
        np.testing.assert_array_equal(final[1:], full)
    else:
        np.testing.assert_array_equal(final, full)
    # every intermediate yield is a prefix of the non-stream sequence
    for toks, is_final in chunks[:-1]:
        t = np.asarray(toks).ravel()
        np.testing.assert_array_equal(t, full[: len(t)])


def test_batched_matches_single(models):
    """Continuous batching must produce the same greedy sequences as
    one-by-one generation (top_k=1 ⇒ deterministic)."""
    ref, cfg, params = models
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128), (2, 128)],
                    dtype=jnp.float32)

    xs, ys, bs = [], [], []
    for seed in (11, 12, 13):
        x, y, bert = _rand_inputs(seed, lx=8 + seed % 3, ly=5 + seed % 2)
        xs.append(x)
        ys.append(y)
        bs.append(bert)

    singles = []
    for x, y, bert in zip(xs, ys, bs):
        # batched mode disables repetition penalty (``t2s_model.py:651``)
        toks = eng.generate(x, y, bert, top_k=1, repetition_penalty=1.0,
                            rng=jax.random.PRNGKey(0))
        singles.append(np.asarray(toks).ravel())

    pred, idx = eng.generate_batched(xs, ys, bs, top_k=1,
                                     rng=jax.random.PRNGKey(0))
    assert sorted(idx.tolist()) == [0, 1, 2]
    for toks, i in zip(pred, idx):
        toks = np.asarray(toks).ravel()
        # for capped (no-EOS) rows the batched path stops check_interval
        # early (reference ``t2s_model.py:656``) while single mode fills the
        # cache exactly (``t2s_model.py:425``): compare the common prefix
        assert len(singles[i]) - len(toks) <= eng.check_interval
        np.testing.assert_array_equal(toks, singles[i][: len(toks)])


def test_generate_batched_stream_matches_batched():
    """generate_batched_stream must emit tokens INCREMENTALLY (multiple
    non-done yields per request) and its per-request concatenation must
    equal generate_batched's harvest exactly, including with slot refill
    (N > bucket B) — same rng => same jitted chain on both calls."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(3, 128)], dtype=jnp.float32)
    rng = np.random.RandomState(11)
    N = 6
    xs = [rng.randint(1, 50, rng.randint(6, 12)).astype(np.int32)
          for _ in range(N)]
    ys = [rng.randint(0, 100, rng.randint(4, 9)).astype(np.int32)
          for _ in range(N)]
    bs = [np.zeros((len(x), cfg.bert_dim), np.float32) for x in xs]

    key = jax.random.PRNGKey(5)
    preds, idx = eng.generate_batched(xs, ys, bs, top_k=5, rng=key)

    acc = {}
    order = []
    n_partial = 0
    for i, toks, done in eng.generate_batched_stream(xs, ys, bs, top_k=5,
                                                     rng=key):
        assert toks.dtype == np.int64 and cfg.eos not in toks.tolist()
        acc.setdefault(i, []).append(toks)
        n_partial += 0 if done else 1
        if done:
            order.append(i)

    assert order == idx.tolist()
    for k, (i, p) in enumerate(zip(idx.tolist(), preds)):
        got = np.concatenate(acc[i]) if acc[i] else np.zeros(0, np.int64)
        np.testing.assert_array_equal(got, p, err_msg=f"request {i}")
    assert n_partial >= 1, "no incremental emission happened"


def test_simultaneous_refills_are_batched_and_token_exact(monkeypatch):
    """Slots that finish on the same decode chunk must be refilled in ONE
    ``prefill_slots`` dispatch, with greedy sequences identical to
    one-by-one generation.  Two identical head requests finish on the same
    chunk by construction, freeing two slots at once."""
    import gsv_tts_tpu.runtime.t2s_session as sess
    from gsv_tts_tpu.models.t2s import T2SConfig

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = jt2s.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 128), (2, 128)],
                    dtype=jnp.float32)

    # seed choice matters: identical greedy rows can flip on the ~1e-6
    # B=1-vs-B=2 prefill noise near a tie (seed 3 EOSes at step 1 on this
    # tiny model) — seed 4 is stable, as the tolerance comment below
    rng = np.random.RandomState(4)
    x0 = rng.randint(1, 50, 9).astype(np.int32)
    y0 = rng.randint(0, 100, 6).astype(np.int32)
    b0 = np.zeros((len(x0), cfg.bert_dim), np.float32)
    xs, ys, bs = [x0, x0.copy()], [y0, y0.copy()], [b0, b0.copy()]
    for seed in (7, 8):
        r = np.random.RandomState(seed)
        x = r.randint(1, 50, 8).astype(np.int32)
        xs.append(x)
        ys.append(r.randint(0, 100, 5).astype(np.int32))
        bs.append(np.zeros((len(x), cfg.bert_dim), np.float32))

    calls = []
    real = sess.prefill_slots

    def counting(params_, cfg_, state_, slots_, *a, **kw):
        calls.append(int(np.asarray(slots_).size))
        return real(params_, cfg_, state_, slots_, *a, **kw)

    monkeypatch.setattr(sess, "prefill_slots", counting)

    singles = [np.asarray(eng.generate(x, y, b, top_k=1,
                                       repetition_penalty=1.0,
                                       rng=jax.random.PRNGKey(0))).ravel()
               for x, y, b in zip(xs, ys, bs)]
    pred, idx = eng.generate_batched(xs, ys, bs, top_k=1,
                                     rng=jax.random.PRNGKey(0))

    assert any(k >= 2 for k in calls), \
        f"simultaneous refills were not batched (prefill_slots calls: {calls})"
    assert sorted(idx.tolist()) == [0, 1, 2, 3]
    for toks, i in zip(pred, idx):
        toks = np.asarray(toks).ravel()
        # refilled slots inherit the GLOBAL check cadence (steps 1, 6, 11,
        # ...), so a cap-ended refilled row can stop up to one extra step
        # earlier than the phase-0 rows test_batched_matches_single covers
        assert len(singles[i]) - len(toks) <= eng.check_interval + 1
        np.testing.assert_array_equal(toks, singles[i][: len(toks)],
                                      err_msg=f"request {i}")


def test_mismatched_refill_group_falls_back_without_overflow(monkeypatch):
    """Two slots freed on the same chunk whose refill prompts have
    MISMATCHED x/y splits: each fits the S bucket alone, but the common
    group pad (max ``round_up(x)`` + max ``round_up(y)`` ACROSS the group)
    exceeds every bucket — the refill must fall back to per-slot
    dispatches instead of letting ``prefill_slots`` shape-error out of the
    jit (which would abort every request in the batch)."""
    import gsv_tts_tpu.runtime.t2s_session as sess
    from gsv_tts_tpu.models.t2s import T2SConfig

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = jt2s.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 160), (2, 160)],
                    dtype=jnp.float32)

    # identical head requests => both slots finish on the same chunk,
    # freeing two slots for one refill group (same device as
    # test_simultaneous_refills_are_batched_and_token_exact)
    rng = np.random.RandomState(4)
    x0 = rng.randint(1, 50, 9).astype(np.int32)
    y0 = rng.randint(0, 100, 6).astype(np.int32)
    b0 = np.zeros((len(x0), cfg.bert_dim), np.float32)
    # refill pair: 90/20 and 20/90 -> per-request pad 96+32=128 <= 160,
    # group pad 96+96=192 > 160 (no bigger bucket exists)
    ra, rb = np.random.RandomState(7), np.random.RandomState(8)
    xa = ra.randint(1, 50, 90).astype(np.int32)
    ya = ra.randint(0, 100, 20).astype(np.int32)
    xb = rb.randint(1, 50, 20).astype(np.int32)
    yb = rb.randint(0, 100, 90).astype(np.int32)
    xs = [x0, x0.copy(), xa, xb]
    ys = [y0, y0.copy(), ya, yb]
    bs = [b0, b0.copy(),
          np.zeros((len(xa), cfg.bert_dim), np.float32),
          np.zeros((len(xb), cfg.bert_dim), np.float32)]

    slots_calls, slot_calls = [], []
    real_slots, real_slot = sess.prefill_slots, sess.prefill_slot

    def counting_slots(params_, cfg_, state_, slots_, *a, **kw):
        slots_calls.append(int(np.asarray(slots_).size))
        return real_slots(params_, cfg_, state_, slots_, *a, **kw)

    def counting_slot(*a, **kw):
        slot_calls.append(1)
        return real_slot(*a, **kw)

    monkeypatch.setattr(sess, "prefill_slots", counting_slots)
    monkeypatch.setattr(sess, "prefill_slot", counting_slot)

    singles = [np.asarray(eng.generate(x, y, b, top_k=1,
                                       repetition_penalty=1.0,
                                       rng=jax.random.PRNGKey(0))).ravel()
               for x, y, b in zip(xs, ys, bs)]
    pred, idx = eng.generate_batched(xs, ys, bs, top_k=1,
                                     rng=jax.random.PRNGKey(0))

    assert not slots_calls, \
        f"oversized group was dispatched batched: {slots_calls}"
    assert len(slot_calls) == 2, \
        f"expected 2 per-slot fallback refills, saw {len(slot_calls)}"
    assert sorted(idx.tolist()) == [0, 1, 2, 3]
    for toks, i in zip(pred, idx):
        toks = np.asarray(toks).ravel()
        assert len(singles[i]) - len(toks) <= eng.check_interval + 1
        np.testing.assert_array_equal(toks, singles[i][: len(toks)],
                                      err_msg=f"request {i}")


def test_batched_tail_compaction_is_token_invariant():
    """Tail compaction (dead-slot burn fix): once refills run out and most
    slots are frozen, the wave re-packs into a smaller batch bucket.  The
    gather must be token-invariant — with top_k=1 the compacted run equals
    the uncompacted one exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gsv_tts_tpu.models import t2s as t2s_model
    from gsv_tts_tpu.models.t2s import T2SConfig
    from gsv_tts_tpu.runtime.t2s_session import T2SEngine

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(1), cfg,
                                   dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128), (2, 128),
                                            (4, 128)], dtype=jnp.float32)
    rng = np.random.RandomState(3)
    N = 4
    xs = [rng.randint(1, 50, rng.randint(6, 12)).astype(np.int32)
          for _ in range(N)]
    ys = [rng.randint(0, 100, rng.randint(4, 9)).astype(np.int32)
          for _ in range(N)]
    bs = [np.zeros((len(x), cfg.bert_dim), np.float32) for x in xs]

    key = jax.random.PRNGKey(9)
    plain, idx_p = eng.generate_batched(xs, ys, bs, top_k=1, rng=key,
                                        compact=False)
    assert eng.compactions == 0
    packed, idx_c = eng.generate_batched(xs, ys, bs, top_k=1, rng=key,
                                         compact=True)
    assert eng.compactions >= 1, \
        "compaction never triggered (request lengths too uniform?)"

    by_idx_p = {int(i): t for i, t in zip(idx_p, plain)}
    by_idx_c = {int(i): t for i, t in zip(idx_c, packed)}
    assert set(by_idx_p) == set(by_idx_c) == set(range(N))
    for i in range(N):
        np.testing.assert_array_equal(by_idx_c[i], by_idx_p[i],
                                      err_msg=f"request {i}")
