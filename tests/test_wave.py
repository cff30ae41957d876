"""Open-ended wave scheduler (runtime/wave.py): independent clients
attaching at arbitrary times must share one continuous-batching wave with
exact token semantics (vs the single-caller ``generate_batched_stream``),
including slot refill, wave growth, cancellation, and compaction."""
import queue
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gsv_tts_tpu.models import t2s as t2s_model
from gsv_tts_tpu.models.t2s import T2SConfig
from gsv_tts_tpu.runtime.t2s_session import T2SEngine
from gsv_tts_tpu.runtime.wave import WaveScheduler


@pytest.fixture(scope="module")
def engine():
    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    return T2SEngine(params, cfg, gpt_cache=[(1, 128), (2, 128), (4, 128)],
                     dtype=jnp.float32)


def _inputs(seed, cfg):
    rng = np.random.RandomState(seed)
    x = rng.randint(1, 50, rng.randint(6, 12)).astype(np.int32)
    y = rng.randint(0, 100, rng.randint(4, 9)).astype(np.int32)
    bert = np.zeros((len(x), cfg.bert_dim), np.float32)
    return x, y, bert


def _drain(handle, timeout=120.0):
    toks = []
    deadline = time.time() + timeout
    while True:
        t, done = handle.get(timeout=max(0.1, deadline - time.time()))
        toks.append(t)
        if done:
            return np.concatenate(toks) if toks else np.zeros(0, np.int64)


def _solo_tokens(engine, x, y, bert):
    """Deterministic (top_k=1) single-request reference: the engine's own
    batched-stream harvest."""
    out = []
    for _, t, done in engine.generate_batched_stream(
            [x], [y], [bert], top_k=1, rng=jax.random.PRNGKey(0)):
        out.append(t)
    return np.concatenate(out) if out else np.zeros(0, np.int64)


def _assert_tokens_match(got, want, check_interval, msg=""):
    """Exact when EOS-ended; cap-ended rows may differ by the chunk phase
    (same tolerance as test_batched_matches_single)."""
    n = min(len(got), len(want))
    np.testing.assert_array_equal(got[:n], want[:n], err_msg=msg)
    assert abs(len(got) - len(want)) <= check_interval, \
        f"{msg}: lengths {len(got)} vs {len(want)}"


def test_single_client_matches_batched_stream(engine):
    x, y, bert = _inputs(21, engine.cfg)
    want = _solo_tokens(engine, x, y, bert)

    sched = WaveScheduler(engine, max_batch=4)
    try:
        h = sched.attach(x, y, bert, top_k=1)
        got = _drain(h)
    finally:
        sched.close()
    # a fresh single-client wave has exactly the generate_batched_stream
    # cadence (1-step first chunk, then check_interval) => exact tokens
    np.testing.assert_array_equal(got, want)
    assert engine.cfg.eos not in got.tolist()


def test_staggered_clients_share_one_wave(engine):
    cfg = engine.cfg
    reqs = [_inputs(s, cfg) for s in (31, 32, 33, 34)]
    solos = [_solo_tokens(engine, *r) for r in reqs]

    sched = WaveScheduler(engine, max_batch=4)
    seen = {"share": 0}

    def drain_tracking(h):
        # accumulate stats WHILE draining (idle waves tear down instantly)
        toks = []
        for t, done in h:
            toks.append(t)
            for w in sched.stats["waves"]:
                seen["share"] = max(seen["share"],
                                    w["refills"] + w["resizes"],
                                    w["live"] - 1)
            if done:
                break
        return np.concatenate(toks) if toks else np.zeros(0, np.int64)

    try:
        h0 = sched.attach(*reqs[0], top_k=1)
        # wait until client 0 is actually decoding before the others arrive
        first, done0 = h0.get(timeout=120.0)
        assert not done0 or first.size
        handles = [sched.attach(*r, top_k=1) for r in reqs[1:]]
        got0 = first if done0 else np.concatenate([first, drain_tracking(h0)])
        gots = [got0] + [drain_tracking(h) for h in handles]
    finally:
        sched.close()

    for i, (got, want) in enumerate(zip(gots, solos)):
        _assert_tokens_match(got, want, engine.check_interval, f"client {i}")
    assert seen["share"] >= 1, "no slot sharing happened"


def test_cancel_compacts_wave_and_survivor_is_exact(engine):
    cfg = engine.cfg
    reqs = [_inputs(s, cfg) for s in (41, 42, 43, 44)]
    survivor_want = _solo_tokens(engine, *reqs[0])

    sched = WaveScheduler(engine, max_batch=4)
    try:
        handles = [sched.attach(*r, top_k=1) for r in reqs]
        # let the wave start, then detach three clients
        first, done0 = handles[0].get(timeout=120.0)
        for h in handles[1:]:
            h.cancel()
        got = np.concatenate([first, _drain(handles[0])]) if not done0 else first
        # compaction must have re-packed the wave into a smaller bucket
        deadline = time.time() + 30.0
        compacted = False
        while time.time() < deadline:
            stats = sched.stats
            if any(w["resizes"] >= 1 for w in stats["waves"]) or not stats["waves"]:
                compacted = True
                break
            time.sleep(0.05)
    finally:
        stats = sched.stats
        sched.close()
    _assert_tokens_match(got, survivor_want, engine.check_interval, "survivor")
    assert compacted, f"no compaction observed: {stats}"


def test_growth_from_single_to_full_wave(engine):
    cfg = engine.cfg
    reqs = [_inputs(s, cfg) for s in (51, 52, 53, 54)]
    solos = [_solo_tokens(engine, *r) for r in reqs]

    sched = WaveScheduler(engine, max_batch=4)
    shared = {"n": 0}

    def drain_tracking(h):
        # accumulate scheduler stats WHILE draining: the idle wave is torn
        # down (and its counters dropped) as soon as the last slot finishes
        toks = []
        for t, done in h:
            toks.append(t)
            for w in sched.stats["waves"]:
                shared["n"] = max(shared["n"], w["refills"] + w["resizes"])
            if done:
                break
        return np.concatenate(toks) if toks else np.zeros(0, np.int64)

    try:
        h0 = sched.attach(*reqs[0], top_k=1)
        first, done0 = h0.get(timeout=120.0)
        handles = [sched.attach(*r, top_k=1) for r in reqs[1:]]
        gots = [first if done0 else np.concatenate([first, drain_tracking(h0)])]
        gots += [drain_tracking(h) for h in handles]
    finally:
        sched.close()
    for i, (got, want) in enumerate(zip(gots, solos)):
        _assert_tokens_match(got, want, engine.check_interval, f"client {i}")
    assert shared["n"] >= 1, "no wave growth/refill observed"


def test_distinct_signatures_get_distinct_waves(engine):
    cfg = engine.cfg
    x, y, bert = _inputs(61, cfg)
    sched = WaveScheduler(engine, max_batch=4)
    try:
        h1 = sched.attach(x, y, bert, top_k=1)
        h2 = sched.attach(x, y, bert, top_k=5, temperature=0.9)
        g1, g2 = _drain(h1), _drain(h2)
    finally:
        sched.close()
    assert g1.size and g2.size
    np.testing.assert_array_equal(g1, _solo_tokens(engine, x, y, bert))


def test_attach_rejects_oversized_prompt(engine):
    cfg = engine.cfg
    x = np.ones(100, np.int32)
    y = np.ones(60, np.int32)
    bert = np.zeros((100, cfg.bert_dim), np.float32)
    sched = WaveScheduler(engine, max_batch=4)
    try:
        with pytest.raises(ValueError):
            sched.attach(x, y, bert)
    finally:
        sched.close()


def test_close_fails_outstanding_handles(engine):
    cfg = engine.cfg
    x, y, bert = _inputs(71, cfg)
    sched = WaveScheduler(engine, max_batch=4)
    h = sched.attach(x, y, bert, top_k=1)
    sched.close()
    with pytest.raises((RuntimeError, queue.Empty)):
        while True:
            _, done = h.get(timeout=5.0)
            if done:
                # finished before close() landed — acceptable
                break


def test_attach_rejects_prompt_padded_beyond_all_buckets(engine):
    """The attach guard must account for prefill PADDING: a prompt whose
    padded [Lx|Ly] block exceeds every bucket is rejected up front."""
    sched = WaveScheduler(engine, max_batch=2)
    try:
        rng = np.random.RandomState(0)
        x = rng.randint(1, 50, 90).astype(np.int32)   # pads to 96
        y = rng.randint(0, 100, 40).astype(np.int32)  # pads to 64 -> 160 > 128
        bert = np.zeros((len(x), engine.cfg.bert_dim), np.float32)
        with pytest.raises(ValueError, match="bucket"):
            sched.attach(x, y, bert, top_k=1)
    finally:
        sched.close()


def test_oversized_prompt_does_not_crash_the_wave():
    """A prompt that only fits the larger bucket must not shape-crash a
    wave sitting at a smaller bucket (which would _fail every client):
    create-fallback opens it in a compatible bucket, and refill escalates
    the wave instead of blind-prefilling."""
    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(1), cfg,
                                   dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 96), (1, 128), (2, 96)],
                    dtype=jnp.float32)
    sched = WaveScheduler(eng, max_batch=2)
    try:
        rng = np.random.RandomState(1)
        # padded need 64+64=128: fits only the (1, 128) bucket
        xb = rng.randint(1, 50, 40).astype(np.int32)
        yb = rng.randint(0, 100, 40).astype(np.int32)
        bb = np.zeros((len(xb), cfg.bert_dim), np.float32)
        xs = rng.randint(1, 50, 8).astype(np.int32)
        ys = rng.randint(0, 100, 6).astype(np.int32)
        bs = np.zeros((len(xs), cfg.bert_dim), np.float32)

        # big first: B=2 has no fitting S -> single-request fallback wave
        h_big = sched.attach(xb, yb, bb, top_k=1)
        h_small = sched.attach(xs, ys, bs, top_k=1)
        t_big = _drain(h_big)
        t_small = _drain(h_small)
        assert t_big.size >= 0 and t_small.size >= 0

        # small first: wave at (2, 96); the big request's refill must
        # requeue/escalate, not crash the live wave
        h_small2 = sched.attach(xs, ys, bs, top_k=1)
        h_big2 = sched.attach(xb, yb, bb, top_k=1)
        t_small2 = _drain(h_small2)
        t_big2 = _drain(h_big2)
        # greedy chains are deterministic, but the CAP differs between
        # scenarios (the big request may run at S=128 solo or be gathered
        # into a 96-row wave) — assert prefix consistency, not equality
        for a, b in ((t_small, t_small2), (t_big, t_big2)):
            n = min(a.size, b.size)
            np.testing.assert_array_equal(a[:n], b[:n])
    finally:
        sched.close()


def test_prefill_slots_matches_sequential(engine):
    """One batched ``prefill_slots`` dispatch must be state-equivalent to
    the k sequential ``prefill_slot`` calls it replaces: identical slot
    bookkeeping and token buffers, identical valid cache rows, identical
    greedy first tokens (greedy sampling is rng-independent, so the one
    rng-split difference cannot show)."""
    from gsv_tts_tpu.runtime.t2s_session import (SampleArgs, prefill_batch,
                                                 prefill_slot, prefill_slots)
    cfg = engine.cfg
    eng = engine
    sa = SampleArgs(top_k=1, repetition_penalty=1.0, use_prev=False)

    # open a B=4 wave with one live row, three frozen dummies
    x0, y0, b0 = _inputs(41, cfg)
    xp, yp, bp = eng._pad_prompt(x0, y0, b0)
    B, S = 4, 128
    kc, vc = eng._alloc_cache(B, S)
    xs = np.tile(xp, (B, 1)); ys = np.tile(yp, (B, 1))
    bs = np.tile(bp, (B, 1, 1))
    lens = np.full((B,), len(x0), np.int32)
    ylens = np.full((B,), len(y0), np.int32)
    state0, _ = prefill_batch(
        eng.params, cfg, jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bs),
        jnp.asarray(lens), jnp.asarray(ylens), kc, vc,
        jax.random.PRNGKey(5), sa, False, eng._dtype_name(), eng.attn_impl)
    reqs = [_inputs(s, cfg) for s in (42, 43, 44)]
    slots = [1, 2, 3]

    def run_sequential(state):
        for j, (x, y, b) in zip(slots, reqs):
            xpj, ypj, bpj = eng._pad_prompt(x, y, b)
            state, _ = prefill_slot(
                eng.params, cfg, state, j,
                jnp.asarray(xpj[None]), jnp.asarray(ypj[None]),
                jnp.asarray(bpj[None]),
                jnp.asarray(len(x), jnp.int32), jnp.asarray(len(y), jnp.int32),
                sa, eng._dtype_name(), eng.attn_impl)
        return state

    def run_batched(state):
        k = len(reqs)
        Lx = max(len(x) for x, _, _ in reqs)
        Lx = -(-Lx // 32) * 32
        Ly = -(-max(len(y) for _, y, _ in reqs) // 32) * 32
        xs = np.zeros((k, Lx), np.int32); ys = np.zeros((k, Ly), np.int32)
        bs = np.zeros((k, Lx, cfg.bert_dim), np.float32)
        xl = np.zeros((k,), np.int32); yl = np.zeros((k,), np.int32)
        for n, (x, y, b) in enumerate(reqs):
            xs[n, :len(x)] = x; ys[n, :len(y)] = y; bs[n, :len(x)] = b
            xl[n], yl[n] = len(x), len(y)
        state, _ = prefill_slots(
            eng.params, cfg, state, jnp.asarray(slots, jnp.int32),
            jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(bs),
            jnp.asarray(xl), jnp.asarray(yl),
            sa, eng._dtype_name(), eng.attn_impl)
        return state

    seq = run_sequential(jax.tree.map(jnp.copy, state0))
    bat = run_batched(jax.tree.map(jnp.copy, state0))

    for field in ("kv_len", "x_len", "buf_len", "last_tok", "step_idx",
                  "tok_buf"):
        np.testing.assert_array_equal(np.asarray(getattr(seq, field)),
                                      np.asarray(getattr(bat, field)), field)
    kv = np.asarray(seq.kv_len)
    for j in slots:  # valid cache prefix per refilled row (pad region may
        n = int(kv[j])  # legitimately differ between padding layouts)
        np.testing.assert_allclose(
            np.asarray(seq.k_cache)[:, j, :n], np.asarray(bat.k_cache)[:, j, :n],
            rtol=1e-6, atol=1e-7, err_msg=f"k_cache slot {j}")
        np.testing.assert_allclose(
            np.asarray(seq.v_cache)[:, j, :n], np.asarray(bat.v_cache)[:, j, :n],
            rtol=1e-6, atol=1e-7, err_msg=f"v_cache slot {j}")


def test_burst_arrivals_use_batched_refill(engine):
    """Requests arriving together while a wave is live must be admitted in
    ONE batched refill dispatch (prefill_slots) — and still produce the
    exact solo token streams (greedy)."""
    cfg = engine.cfg
    reqs = [_inputs(s, cfg) for s in (51, 52, 53, 54)]
    solos = [_solo_tokens(engine, *r) for r in reqs]

    sched = WaveScheduler(engine, max_batch=4)
    seen = {"batched": 0}

    def drain_tracking(h):
        toks = []
        for t, done in h:
            toks.append(t)
            for w in sched.stats["waves"]:
                seen["batched"] = max(seen["batched"], w["batched_refills"])
            if done:
                break
        return np.concatenate(toks) if toks else np.zeros(0, np.int64)

    try:
        h0 = sched.attach(*reqs[0], top_k=1)
        first, done0 = h0.get(timeout=120.0)  # wave is live now
        handles = [sched.attach(*r, top_k=1) for r in reqs[1:]]  # burst
        got0 = first if done0 else np.concatenate([first, drain_tracking(h0)])
        gots = [got0] + [drain_tracking(h) for h in handles]
    finally:
        sched.close()

    for i, (got, want) in enumerate(zip(gots, solos)):
        _assert_tokens_match(got, want, engine.check_interval, f"client {i}")
    assert seen["batched"] >= 1, "burst was not admitted via prefill_slots"


def test_mismatched_refill_group_falls_back_in_wave(engine):
    """A refill group whose x/y splits are mismatched pads past every S
    bucket even though each request fits alone (per-request 96+32=128 <=
    128, group 96+96=192): _refill must fall back to per-slot dispatches
    instead of letting prefill_slots shape-error and fail every client in
    the wave."""
    from gsv_tts_tpu.runtime import wave as wmod
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs, decode_chunk

    sched = WaveScheduler(engine, max_batch=4)
    try:
        w = wmod._Wave(SampleArgs(top_k=1, repetition_penalty=1.0,
                                  use_prev=False), jax.random.PRNGKey(5))
        x, y, bert = _inputs(3, engine.cfg)
        w.pending.extend([wmod._Request(x, y, bert, wmod.StreamHandle())
                          for _ in range(4)])
        assert sched._create_wave_state(w)

        ra, rb = np.random.RandomState(7), np.random.RandomState(8)
        xa = ra.randint(1, 50, 70).astype(np.int32)
        ya = ra.randint(0, 100, 20).astype(np.int32)
        xb = rb.randint(1, 50, 20).astype(np.int32)
        yb = rb.randint(0, 100, 70).astype(np.int32)
        jobs = [(1, wmod._Request(xa, ya,
                                  np.zeros((len(xa), engine.cfg.bert_dim),
                                           np.float32), wmod.StreamHandle())),
                (2, wmod._Request(xb, yb,
                                  np.zeros((len(xb), engine.cfg.bert_dim),
                                           np.float32), wmod.StreamHandle()))]
        assert sched._refill(w, jobs)
        assert w.n_batched_refills == 0, "oversized group went batched"
        assert w.n_refills == 2
        kv = np.asarray(w.state.kv_len)
        assert kv[1] >= len(xa) + len(ya) and kv[2] >= len(xb) + len(yb)
        # the mixed wave still decodes
        w.state, chunk = decode_chunk(
            engine.params, engine.cfg, w.state, 5, w.sa, 0,
            engine._dtype_name(), engine.attn_impl)
        assert np.asarray(chunk).shape == (4, 5)  # [B, n_steps]
    finally:
        sched.close()


def test_churn_many_clients_attach_and_cancel(engine):
    """Serving-robustness stress: a dozen clients attach at staggered
    times, a third of them cancel mid-stream — every surviving handle
    must terminate with the exact solo tokens, nothing deadlocks, and
    the scheduler closes cleanly.  (Seeded; exercises refill, growth,
    compaction, and cancellation racing the pump thread.)"""
    cfg = engine.cfg
    reqs = [_inputs(100 + s, cfg) for s in range(12)]
    solos = {i: _solo_tokens(engine, *reqs[i])
             for i in range(12) if i % 3 != 1}

    sched = WaveScheduler(engine, max_batch=4)
    rng = np.random.RandomState(0)
    handles = []
    try:
        for i, r in enumerate(reqs):
            handles.append(sched.attach(*r, top_k=1))
            if rng.rand() < 0.5:
                time.sleep(rng.rand() * 0.15)
        # cancel every third client (some before their first chunk, some
        # mid-stream depending on thread timing — both must be safe)
        for i in (1, 4, 7, 10):
            handles[i].cancel()
        gots = {i: _drain(handles[i]) for i in solos}
    finally:
        sched.close()
    for i, want in solos.items():
        _assert_tokens_match(gots[i], want, engine.check_interval,
                             f"client {i}")


def test_dead_slot_phantom_kv_does_not_escalate():
    """decode_chunk advances kv_len for frozen slots too; a long-dead
    slot's phantom kv must neither trigger sequence-bucket escalation nor
    creep toward the bucket edge (its K/V append window would read out of
    bounds) — the pump keys escalation on LIVE slots and re-freezes dead
    ones nearing the edge."""
    from gsv_tts_tpu.runtime import wave as wmod
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    # only B=4 buckets: compaction can never drop the dead slot
    eng = T2SEngine(params, cfg, gpt_cache=[(4, 128), (4, 256)],
                    dtype=jnp.float32)
    sched = WaveScheduler(eng, max_batch=4)
    try:
        w = wmod._Wave(SampleArgs(top_k=1, repetition_penalty=1.0,
                                  use_prev=False), jax.random.PRNGKey(3))
        x, y, bert = _inputs(5, eng.cfg)
        w.pending.extend([wmod._Request(x, y, bert, wmod.StreamHandle())
                          for _ in range(2)])
        assert sched._create_wave_state(w)
        # kill slot 1 and give it a phantom kv just under the bucket edge
        w.slots[1].live = False
        w.state = sched._freeze(w.state, 1)
        import dataclasses as _dc
        w.state = _dc.replace(w.state,
                              kv_len=w.state.kv_len.at[1].set(127))
        assert sched._pump(w)  # first chunk: n_steps=1, 127+1 >= 128
        assert w.state.k_cache.shape[2] == 128, \
            "dead slot's phantom kv escalated the wave"
        kv = np.asarray(w.state.kv_len)
        # re-frozen to 0 before the chunk, then advanced by n_steps only —
        # it must never reach S (its append window would read OOB)
        assert kv[1] <= 10, f"dead slot kv not re-frozen: {kv[1]}"
    finally:
        sched.close()


def test_attach_guard_matches_scheduler_buckets():
    """A prompt that only fits a batch bucket ABOVE max_batch must be
    rejected at attach (ValueError) instead of failing asynchronously in
    _create_wave_state."""
    cfg = T2SConfig(hidden_dim=64, embedding_dim=64, num_heads=4,
                    num_layers=2, vocab_size=101, phoneme_vocab_size=50,
                    eos=100)
    params = t2s_model.init_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.float32)
    eng = T2SEngine(params, cfg, gpt_cache=[(1, 128), (4, 512)],
                    dtype=jnp.float32)
    sched = WaveScheduler(eng, max_batch=1)
    try:
        rng = np.random.RandomState(0)
        x = rng.randint(1, 50, 200).astype(np.int32)  # needs ~256 rows
        y = rng.randint(0, 100, 8).astype(np.int32)
        bert = np.zeros((len(x), cfg.bert_dim), np.float32)
        with pytest.raises(ValueError):
            sched.attach(x, y, bert, top_k=1)
    finally:
        sched.close()


def test_wave_generations_use_fresh_rng(engine):
    """Re-creating a drained wave must draw a fresh key — reusing the
    construction-time key would replay the identical gumbel chain across
    wave generations (correlated sampling between clients)."""
    from gsv_tts_tpu.runtime import wave as wmod
    from gsv_tts_tpu.runtime.t2s_session import SampleArgs

    sched = WaveScheduler(engine, max_batch=2)
    try:
        w = wmod._Wave(SampleArgs(top_k=1, repetition_penalty=1.0,
                                  use_prev=False),
                       jax.random.PRNGKey(7))
        x, y, bert = _inputs(3, engine.cfg)
        keys = [np.asarray(w.rng).copy()]
        for _ in range(2):
            w.pending.append(wmod._Request(x, y, bert, wmod.StreamHandle()))
            w.state, w.slots = None, []
            assert sched._create_wave_state(w)
            keys.append(np.asarray(w.rng).copy())
        assert not np.array_equal(keys[0], keys[1])
        assert not np.array_equal(keys[1], keys[2])
    finally:
        sched.close()


def test_max_clients_admission_and_release(engine):
    """Admission control (serving --max-streams): the max_clients-th
    concurrent client is the last one admitted; a release re-opens the
    door.  attach() itself is never gated — the cap is per CLIENT, so an
    admitted multi-segment stream cannot be rejected mid-utterance."""
    from gsv_tts_tpu.runtime.wave import WaveOverloadedError

    sched = WaveScheduler(engine, max_batch=2, max_clients=2)
    try:
        sched.acquire_client()
        sched.acquire_client()
        assert sched.overloaded
        with pytest.raises(WaveOverloadedError):
            sched.acquire_client()
        st = sched.stats
        assert st["clients"] == 2 and st["max_clients"] == 2
        # an already-admitted client's attach still works at the cap
        x, y, bert = _inputs(11, engine.cfg)
        got = _drain(sched.attach(x, y, bert, top_k=1))
        assert got.size >= 0
        sched.release_client()
        assert not sched.overloaded
        sched.acquire_client()  # re-admitted after a release
    finally:
        sched.close()


def test_uncapped_scheduler_never_sheds(engine):
    sched = WaveScheduler(engine, max_batch=2)
    try:
        for _ in range(64):
            sched.acquire_client()
        assert not sched.overloaded
        assert sched.stats["max_clients"] is None
        assert sched.stats["clients"] == 64
    finally:
        sched.close()


def test_failed_prefill_fails_popped_handles_not_hangs(engine, monkeypatch):
    """A device failure during wave creation / refill must FAIL the
    requests already popped from pending (they are in neither
    wave.pending nor wave.slots, so the driver's wave-failure sweep
    cannot see them) — their consumers would otherwise block forever on
    handle.get() and leak admission slots."""
    from gsv_tts_tpu.runtime import wave as wmod

    boom = RuntimeError("synthetic prefill failure")

    def bad_prefill(*a, **k):
        raise boom

    sched = WaveScheduler(engine, max_batch=2)
    try:
        monkeypatch.setattr(wmod, "prefill_batch", bad_prefill)
        x, y, bert = _inputs(21, engine.cfg)
        h = sched.attach(x, y, bert, top_k=1)
        with pytest.raises(RuntimeError, match="synthetic prefill"):
            h.get(timeout=30.0)
        monkeypatch.undo()
        # the scheduler survives and serves the next client normally
        x2, y2, bert2 = _inputs(22, engine.cfg)
        got = _drain(sched.attach(x2, y2, bert2, top_k=1))
        want = _solo_tokens(engine, x2, y2, bert2)
        _assert_tokens_match(got, want, engine.check_interval)
    finally:
        sched.close()


def test_failed_refill_fails_popped_handles(engine, monkeypatch):
    """Same guarantee on the REFILL path: client A keeps the wave alive,
    client B's refill prefill fails — B's handle gets the error instead
    of hanging, A's stream is failed by the driver sweep (wave-wide
    failure), and the scheduler recovers for the next client."""
    import time as _time

    from gsv_tts_tpu.runtime import wave as wmod

    sched = WaveScheduler(engine, max_batch=1)  # B=1 wave: refill on free
    try:
        xa, ya, ba = _inputs(31, engine.cfg)
        ha = sched.attach(xa, ya, ba, top_k=1)
        # wait until A's wave is running, then break prefill_slot for B
        deadline = _time.time() + 60.0
        while _time.time() < deadline:
            st = sched.stats
            if st["waves"] and any(w["live"] for w in st["waves"]):
                break
            _time.sleep(0.01)

        def bad_prefill_slot(*a, **k):
            raise RuntimeError("synthetic refill failure")

        # slot refills dispatch through the shared engine helper, which
        # resolves prefill_slot/prefill_slots in t2s_session's namespace
        from gsv_tts_tpu.runtime import t2s_session as tsmod
        monkeypatch.setattr(tsmod, "prefill_slot", bad_prefill_slot)
        monkeypatch.setattr(tsmod, "prefill_slots", bad_prefill_slot)
        monkeypatch.setattr(wmod, "prefill_batch", bad_prefill_slot)
        xb, yb, bb = _inputs(32, engine.cfg)
        hb = sched.attach(xb, yb, bb, top_k=1)
        with pytest.raises(RuntimeError, match="synthetic refill"):
            while True:
                _, done = hb.get(timeout=30.0)
                if done:
                    raise AssertionError("B finished through a broken prefill")
        monkeypatch.undo()
        # drain A (either finished normally before the failure or failed
        # by the wave sweep — it must NOT hang)
        try:
            _drain(ha, timeout=60.0)
        except RuntimeError:
            pass
        xc, yc, bc = _inputs(33, engine.cfg)
        got = _drain(sched.attach(xc, yc, bc, top_k=1))
        assert got.size >= 0
    finally:
        sched.close()


def test_bucket_edge_refill_never_overflows_cache(engine, monkeypatch):
    """A slot refilled mid-wave with a prompt within check_interval of the
    LARGEST S bucket must not let decode_chunk append K/V rows past the
    cache edge (the XLA DUS clamps the start index and silently overwrites
    the last valid rows; the TPU kernel's 8-row RMW window runs out of
    bounds).  The chunk is clamped to the tightest slot's room instead.
    Instrumented invariant: for EVERY dispatched chunk, max(kv_len) +
    n_steps <= S."""
    from gsv_tts_tpu.runtime import t2s_session as ts

    calls = []
    real = ts.decode_chunk

    def recording(params, cfg, state, n_steps, *a, **k):
        kv = np.asarray(state.kv_len)
        calls.append((int(kv.max()), int(n_steps), state.k_cache.shape[2]))
        return real(params, cfg, state, n_steps, *a, **k)

    monkeypatch.setattr(ts, "decode_chunk", recording)
    cfg = engine.cfg
    rng = np.random.RandomState(7)
    # initial B=4 wave: three tiny requests + one medium (kv=100, so it
    # hits the 128 cap first and frees a slot mid-wave); the FIFTH
    # request's prompt_rows sits at the single S=128 bucket's edge
    # (x=96 pads to 96, y=30 pads to 32: padded block 128 == S, kv after
    # its refill prefill = 126 — within check_interval of the edge)
    reqs = [
        (rng.randint(1, 50, 10).astype(np.int32),
         rng.randint(0, 100, 6).astype(np.int32)),
        (rng.randint(1, 50, 12).astype(np.int32),
         rng.randint(0, 100, 7).astype(np.int32)),
        (rng.randint(1, 50, 9).astype(np.int32),
         rng.randint(0, 100, 8).astype(np.int32)),
        (rng.randint(1, 50, 50).astype(np.int32),
         rng.randint(0, 100, 30).astype(np.int32)),
        (rng.randint(1, 50, 96).astype(np.int32),
         rng.randint(0, 100, 30).astype(np.int32)),
    ]
    xs = [x for x, _ in reqs]
    ys = [y for _, y in reqs]
    berts = [np.zeros((len(x), cfg.bert_dim), np.float32) for x in xs]
    done = set()
    for idx, toks, fin in engine.generate_batched_stream(
            xs, ys, berts, top_k=1, rng=jax.random.PRNGKey(3)):
        if fin:
            done.add(idx)
    assert done == {0, 1, 2, 3, 4}
    assert calls, "no decode chunks dispatched"
    for kv_max, n, S in calls:
        assert kv_max + n <= S, (kv_max, n, S)
    # the scenario must actually exercise the edge: some chunk ran with a
    # slot close enough to the bucket edge that the full check_interval
    # would have overflowed (i.e. the clamp had work to do)
    assert any(kv_max + engine.check_interval > S and n < engine.check_interval
               for kv_max, n, S in calls), calls
