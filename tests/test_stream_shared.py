"""Shared-wave streaming at the facade (TTS.stream_shared) and subtitles
in the streaming-batched mode.

Determinism levers: top_k=1 makes the token chain exact, noise_scale=0
removes the vocoder's stochastic latent, so audio comparisons across
paths can be bitwise."""
import threading
import time

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_e2e import assets, engine  # fixtures  # noqa: F401,E402


def _collect_shared(engine, assets, text, **kw):
    clips = list(engine.stream_shared(
        assets["spk"], assets["prompt"], "hello there.", text,
        debug=False, **kw))
    return clips


def test_stream_shared_single_client_matches_batched_stream(engine, assets):
    """A fresh single-client wave has exactly the generate_batched_stream
    cadence, so stream_shared must reproduce infer_batched_stream(N=1)
    bitwise (top_k=1, noise_scale=0)."""
    # single segment: multi-segment requests legitimately differ between
    # the two modes (batched decodes segments concurrently and vocodes
    # buffered segments in one final pass; shared streams them in order)
    text = "this is a longer test sentence to stream."
    kw = dict(top_k=1, noise_scale=0.0, stream_chunk=10, is_cut_text=False,
              return_subtitles=True)

    batched = list(engine.infer_batched_stream(
        assets["spk"], assets["prompt"], "hello there.", [text], **kw))
    shared = _collect_shared(engine, assets, text, **kw)

    a_batched = np.concatenate([c.audio_data for _, c, _ in batched])
    a_shared = np.concatenate([c.audio_data for c in shared])
    np.testing.assert_array_equal(a_shared, a_batched)

    s_batched = [s for _, c, _ in batched for s in c.subtitles]
    s_shared = [s for c in shared for s in c.subtitles]
    assert s_shared == s_batched
    assert s_shared, "expected subtitles in shared streaming mode"
    # scheduler must have torn the idle wave down (frees the HBM cache)
    deadline = time.time() + 10.0
    while time.time() < deadline:
        stats = engine.wave_stats()
        if all(not v["waves"] for v in stats.values()):
            break
        time.sleep(0.05)
    assert all(not v["waves"] for v in engine.wave_stats().values())


def test_stream_shared_concurrent_clients_share_wave(engine, assets):
    """Three independent threads streaming concurrently: all finish, audio
    is sane, the wave actually gets shared (refills/resizes > 0), and
    per-client durations track the solo runs."""
    texts = ["the first client speaks now.",
             "meanwhile a second client is talking.",
             "and one more joins the conversation."]
    kw = dict(top_k=1, noise_scale=0.0, stream_chunk=10, is_cut_text=False)

    solo_samples = []
    for t in texts:
        clips = _collect_shared(engine, assets, t, **kw)
        solo_samples.append(sum(len(c.audio_data) for c in clips))

    results = [None] * 3
    events = []

    def client(i):
        out = []
        for c in engine.stream_shared(
                assets["spk"], assets["prompt"], "hello there.", texts[i],
                debug=False, **kw):
            events.append((time.perf_counter(), i))
            out.append(c)
        results[i] = out

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    threads[0].start()
    time.sleep(0.3)
    threads[1].start()
    threads[2].start()
    stats_seen = {"refills": 0, "resizes": 0, "max_live": 0}
    for th in threads:
        while th.is_alive():
            th.join(timeout=0.1)
            for v in engine.wave_stats().values():
                for w in v["waves"]:
                    stats_seen["refills"] = max(stats_seen["refills"], w["refills"])
                    stats_seen["resizes"] = max(stats_seen["resizes"], w["resizes"])
                    stats_seen["max_live"] = max(stats_seen["max_live"], w["live"])

    for i in range(3):
        assert results[i], f"client {i} got no audio"
        total = sum(len(c.audio_data) for c in results[i])
        # cap-ended rows may differ by one check interval of tokens
        # (2 frames/token * 640 samples/frame), plus the same slack for
        # chunk-boundary SOLA differences
        assert abs(total - solo_samples[i]) <= 4 * 2 * 640 * 5, \
            f"client {i}: {total} vs solo {solo_samples[i]}"
        for c in results[i]:
            a = np.asarray(c.audio_data)
            assert a.dtype == np.float32 and np.isfinite(a).all()
    # sharing is proven by the scheduler stats (>=2 live in one wave, or a
    # refill/resize); event-order interleaving is NOT asserted — on CPU a
    # fast client can legitimately finish during the others' featurization
    assert stats_seen["max_live"] >= 2 or stats_seen["refills"] >= 1 \
        or stats_seen["resizes"] >= 1, f"no wave sharing observed: {stats_seen}"


def test_stream_shared_cancel_frees_slot(engine, assets):
    """Abandoning the generator mid-stream must detach the request (the
    wave drains instead of decoding a dead client to the cap)."""
    gen = engine.stream_shared(
        assets["spk"], assets["prompt"], "hello there.",
        "a sentence that will be cancelled midway through synthesis.",
        top_k=1, noise_scale=0.0, stream_chunk=5, is_cut_text=False,
        debug=False)
    first = next(gen)
    assert len(first.audio_data) >= 0
    gen.close()
    deadline = time.time() + 15.0
    while time.time() < deadline:
        stats = engine.wave_stats()
        if all(not v["waves"] for v in stats.values()):
            return
        time.sleep(0.05)
    pytest.fail(f"wave did not drain after cancel: {engine.wave_stats()}")


def test_batched_stream_subtitles_match_infer_stream(engine, assets, monkeypatch):
    """VERDICT r2 #6: with an identical token stream and identical chunk
    boundaries, a 1-request infer_batched_stream must emit byte-identical
    audio AND identical subtitle words/timestamps to infer_stream (the two
    paths share the incremental subtitle machinery)."""
    tokens = np.random.RandomState(9).randint(0, 1024, 23).astype(np.int64)
    chunk = 5
    gpt = engine.gpt_models[assets["gpt"]]

    def fake_generate(x_ids, y_ids, bert, **kw):
        for hi in range(chunk, len(tokens), chunk):
            yield tokens[None, None, :hi], False
        yield tokens[None, None, :], True

    def fake_gbs(xs, ys, bs, grouped=False, **kw):
        def ev():
            emitted = 0
            for hi in range(chunk, len(tokens), chunk):
                yield 0, tokens[emitted:hi], False
                emitted = hi
            yield 0, tokens[emitted:], True

        for e in ev():
            yield [e] if grouped else e

    monkeypatch.setattr(gpt.engine, "generate", fake_generate)
    monkeypatch.setattr(gpt.engine, "generate_batched_stream", fake_gbs)

    text = "this is a test sentence for subtitle parity."
    common = dict(return_subtitles=True, is_cut_text=False,
                  stream_chunk=chunk, noise_scale=0.0)
    engine._rng = jax.random.PRNGKey(7)
    stream_clips = list(engine.infer_stream(
        assets["spk"], assets["prompt"], "hello there.", text,
        debug=False, boost_first_chunk=False, **common))
    engine._rng = jax.random.PRNGKey(7)
    batched = list(engine.infer_batched_stream(
        assets["spk"], assets["prompt"], "hello there.", [text], **common))

    a1 = np.concatenate([c.audio_data for c in stream_clips])
    a2 = np.concatenate([c.audio_data for _, c, _ in batched])
    np.testing.assert_array_equal(a1, a2)

    s1 = [s for c in stream_clips for s in c.subtitles]
    s2 = [s for _, c, _ in batched for s in c.subtitles]
    assert s1, "no subtitles produced by infer_stream"
    assert s1 == s2


def test_vocoder_batcher_groups_and_matches_solo(engine, assets):
    """Cross-stream vocoder micro-batching (runtime/vocoder_batch.py):
    three threads submitting chunk states at DIFFERENT progress points
    (two first chunks of different lengths, one blended continuation)
    must be grouped into one batched program whose per-row results match
    each row's solo bucketed vocode (noise_scale=0 ⇒ deterministic)."""
    from gsv_tts_tpu.runtime.vocoder_batch import VocoderBatcher

    sovits, ge = engine._prepare_sovits_resources(assets["sovits"],
                                                  assets["spk"])
    overlap = 5
    rng = np.random.RandomState(5)
    c_long = rng.randint(0, 1024, 41).astype(np.int32)
    t_long = rng.randint(1, 100, 13).astype(np.int32)

    # build the continuation row's carried overlap via a solo first chunk
    _, _, ov_carry = engine._sovits_decode_stream(
        sovits, c_long[None, None, :20], t_long[None], ge,
        noise_scale=0.0, speed=1.0, y_overlap=None, valid_start_idx=0,
        overlap_len=overlap)

    # (codes, text, vsi, y_overlap)
    rows = [
        (c_long[:20], t_long, 0, None),                       # first chunk
        (c_long, t_long, 35, ov_carry),                       # continuation
        (rng.randint(0, 1024, 9).astype(np.int32),
         rng.randint(1, 100, 7).astype(np.int32), 0, None),   # short row
    ]
    expected = [
        engine._sovits_decode_stream(
            sovits, c[None, None, :], t[None], ge, noise_scale=0.0,
            speed=1.0, y_overlap=yo, valid_start_idx=v, overlap_len=overlap)
        for c, t, v, yo in rows
    ]

    batcher = VocoderBatcher(engine, max_batch=4, window_s=0.5)
    try:
        results = [None] * len(rows)
        errs = []
        barrier = threading.Barrier(len(rows))

        def client(i):
            c, t, v, yo = rows[i]
            try:
                barrier.wait()
                results[i] = batcher.decode_stream(
                    sovits, c, t, ge, 0.0, yo, v, overlap)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(len(rows))]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        assert not errs, errs
        assert batcher.stats["max_group"] >= 2, batcher.stats
        for i, ((audio_e, attn_e, ov_e), got) in enumerate(zip(expected,
                                                               results)):
            audio_b, attn_b, ov_b = got
            assert np.asarray(audio_b).shape == np.asarray(audio_e).shape
            np.testing.assert_allclose(
                np.asarray(audio_b), np.asarray(audio_e), atol=2e-3,
                err_msg=f"row {i} audio")
            np.testing.assert_allclose(
                np.asarray(attn_b), np.asarray(attn_e), rtol=2e-4,
                atol=2e-5, err_msg=f"row {i} attn")
            np.testing.assert_allclose(
                np.asarray(ov_b), np.asarray(ov_e), rtol=2e-4, atol=2e-5,
                err_msg=f"row {i} overlap carry")
    finally:
        batcher.close()


def test_stream_shared_concurrent_clients_use_vocoder_batcher(engine, assets):
    """Two concurrent shared-wave clients must route their vocoder chunks
    through the micro-batcher (rows counted in wave_stats) and still
    produce sane audio of the expected per-client duration."""
    from gsv_tts_tpu.runtime.vocoder_batch import VocoderBatcher

    texts = ["the first client speaks now.",
             "meanwhile a second client is talking."]
    kw = dict(top_k=1, noise_scale=0.0, stream_chunk=10, is_cut_text=False)

    solo_samples = []
    for t in texts:
        clips = _collect_shared(engine, assets, t, **kw)
        solo_samples.append(sum(len(c.audio_data) for c in clips))

    # widen the collect window so coincident chunk boundaries group even
    # on a slow CPU box
    old = engine._vocoder_batcher
    engine._vocoder_batcher = VocoderBatcher(engine, max_batch=4,
                                             window_s=0.15)
    try:
        results = [None] * 2

        def client(i):
            results[i] = list(engine.stream_shared(
                assets["spk"], assets["prompt"], "hello there.", texts[i],
                debug=False, **kw))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(2)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=600)
        stats = dict(engine._vocoder_batcher.stats)
        for i in range(2):
            assert results[i], f"client {i} got no audio"
            total = sum(len(c.audio_data) for c in results[i])
            assert abs(total - solo_samples[i]) <= 4 * 2 * 640 * 5, \
                f"client {i}: {total} vs solo {solo_samples[i]}"
            for c in results[i]:
                a = np.asarray(c.audio_data)
                assert a.dtype == np.float32 and np.isfinite(a).all()
        assert stats["rows"] >= 2, stats
        assert engine.vocoder_batch_stats()["rows"] >= 2
    finally:
        engine._vocoder_batcher.close()
        engine._vocoder_batcher = old


def test_vocoder_batcher_close_fails_queued_items(engine):
    """close() must drain and FAIL anything still queued — a stranded
    item leaves its decode_stream caller blocked forever."""
    from gsv_tts_tpu.runtime.vocoder_batch import VocoderBatcher, _Item

    b = VocoderBatcher(engine, max_batch=2, window_s=0.01)
    # stop the worker loop first so the queued item is guaranteed stranded
    b._closed = True
    b._q.put(None)
    b._thread.join(timeout=10)
    it = _Item(None, np.zeros(3, np.int32), np.zeros(2, np.int32), None,
               0.0, None, 0, 5)
    b._q.put(it)
    b.close()
    assert it.event.is_set()
    assert isinstance(it.error, RuntimeError)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        b.decode_stream(None, [1], [1], None, 0.0, None, 0, 5)


def test_batched_stream_flushes_subtitles_when_head_trim_eats_audio(
        engine, assets, monkeypatch):
    """A chunk whose audio is fully consumed by the head trim must still
    deliver its subtitles: _SegStream already advanced its subtitle
    cursor, so a dropped event would lose them permanently."""
    import gsv_tts_tpu.tts as jtts_mod

    tokens = np.random.RandomState(9).randint(0, 1024, 23).astype(np.int64)
    chunk = 5
    gpt = engine.gpt_models[assets["gpt"]]

    def fake_gbs(xs, ys, bs, grouped=False, **kw):
        def ev():
            emitted = 0
            for hi in range(chunk, len(tokens), chunk):
                yield 0, tokens[emitted:hi], False
                emitted = hi
            yield 0, tokens[emitted:], True

        for e in ev():
            yield [e] if grouped else e

    monkeypatch.setattr(gpt.engine, "generate_batched_stream", fake_gbs)
    text = "this is a test sentence for subtitle flushing."
    common = dict(return_subtitles=True, is_cut_text=False,
                  stream_chunk=chunk, noise_scale=0.0)

    engine._rng = jax.random.PRNGKey(7)
    normal = list(engine.infer_batched_stream(
        assets["spk"], assets["prompt"], "hello there.", [text], **common))
    words_normal = [s["text"] for _, c, _ in normal for s in c.subtitles]

    # make the head trim consume the ENTIRE first chunk's audio
    real_trim = jtts_mod.dsp.find_head_threshold_offset
    monkeypatch.setattr(jtts_mod.dsp, "find_head_threshold_offset",
                        lambda audio: len(audio))
    engine._rng = jax.random.PRNGKey(7)
    trimmed = list(engine.infer_batched_stream(
        assets["spk"], assets["prompt"], "hello there.", [text], **common))
    monkeypatch.setattr(jtts_mod.dsp, "find_head_threshold_offset", real_trim)
    words_trimmed = [s["text"] for _, c, _ in trimmed for s in c.subtitles]

    assert words_normal, "fixture produced no subtitles"
    assert words_trimmed == words_normal


def test_stream_shared_admission_cap(engine, assets):
    """``wave_max_clients`` admission: a saturated scheduler rejects a NEW
    client up front (WaveOverloadedError before any device work), an
    admitted client holds its slot for its whole multi-segment life, and
    finishing releases it (sequential clients fit a cap of 1)."""
    from gsv_tts_tpu.runtime.wave import WaveOverloadedError

    gpt_model, _ = engine._default_models(None, None)
    sched = engine._get_wave_scheduler(gpt_model)
    old = sched.max_clients
    kw = dict(top_k=1, noise_scale=0.0, stream_chunk=10, is_cut_text=False)
    try:
        sched.max_clients = 0
        with pytest.raises(WaveOverloadedError):
            list(engine.stream_shared(assets["spk"], assets["prompt"],
                                      "hello there.", "shed me.",
                                      debug=False, **kw))
        sched.max_clients = 1
        for text in ("first capped client.", "second capped client."):
            clips = _collect_shared(engine, assets, text, **kw)
            assert sum(len(c.audio_data) for c in clips) > 0
        assert sched.stats["clients"] == 0
    finally:
        sched.max_clients = old


def test_lone_stream_skips_vocoder_collect_window(engine, assets):
    """A single shared client must not pay the cross-stream collect window
    on every chunk (there is nothing to batch with): the batcher takes the
    windowless path, visible in its stats counter."""
    before = engine.vocoder_batch_stats().get("windowless", 0)
    clips = _collect_shared(engine, assets, "a lone client streams alone.",
                            top_k=1, noise_scale=0.0, stream_chunk=10,
                            is_cut_text=False)
    assert sum(len(c.audio_data) for c in clips) > 0
    after = engine.vocoder_batch_stats().get("windowless", 0)
    assert after > before, (before, after)
