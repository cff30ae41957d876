"""Post-FX chain tests (gsv_tts_tpu/fx.py): filters, compressor, reverb,
BS.1770 loudness, and the full enhance chain."""
import numpy as np
import pytest

pytest.importorskip("scipy")

from gsv_tts_tpu import fx

SR = 32000


def _tone(freq, secs=1.0, amp=0.5, sr=SR):
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _band_rms(x, freq, sr=SR, width=0.1):
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    sel = (freqs > freq * (1 - width)) & (freqs < freq * (1 + width))
    return float(np.sqrt(np.mean(spec[sel] ** 2)))


def test_highpass_kills_lows_keeps_mids():
    low, mid = _tone(30), _tone(1000)
    assert np.abs(fx.highpass(low, SR, 80.0)).max() < 0.2 * np.abs(low).max()
    out_mid = fx.highpass(mid, SR, 80.0)
    assert np.abs(np.abs(out_mid).max() - np.abs(mid).max()) < 0.05


def test_peak_filter_boost_and_cut():
    x = _tone(300) + _tone(7000)
    boosted = fx.peak_filter(x, SR, 300.0, 2.5, 1.0)
    assert _band_rms(boosted, 300) > _band_rms(x, 300) * 1.2
    cut = fx.peak_filter(x, SR, 7000.0, -3.0, 2.0)
    assert _band_rms(cut, 7000) < _band_rms(x, 7000) * 0.85
    # the untouched band stays put
    assert abs(_band_rms(cut, 300) / _band_rms(x, 300) - 1) < 0.1


def test_compressor_reduces_dynamic_range():
    quiet = _tone(440, secs=0.5, amp=0.05)
    loud = _tone(440, secs=0.5, amp=0.8)
    x = np.concatenate([quiet, loud])
    y = fx.compressor(x, SR, threshold_db=-18.0, ratio=3.5)

    def rms(v):
        return float(np.sqrt(np.mean(v ** 2)))

    in_ratio = rms(loud) / rms(quiet)
    out_ratio = rms(y[len(quiet):]) / rms(y[:len(quiet)])
    assert out_ratio < in_ratio * 0.5
    # below-threshold content passes ~unchanged
    assert np.abs(y[:len(quiet)]).max() == pytest.approx(0.05, rel=0.15)


def test_envelope_native_matches_numpy():
    from gsv_tts_tpu.utils.native import native_lib

    lib = native_lib()
    if lib is None or not getattr(lib, "_has_envelope", False):
        pytest.skip("native lib without envelope symbol")
    rng = np.random.RandomState(0)
    level = np.abs(rng.randn(5000)).astype(np.float32)
    att, rel = 0.97, 0.9995
    np.testing.assert_allclose(lib.envelope_follow(level, att, rel),
                               fx._envelope_numpy(level, att, rel),
                               rtol=1e-5, atol=1e-6)


def test_reverb_adds_tail_and_preserves_dry():
    x = np.zeros(SR, np.float32)
    x[:64] = 1.0  # click
    y = fx.reverb(x, SR, room_size=0.1, damping=0.5, wet=0.03, dry=0.97)
    assert y.shape == x.shape
    # energy appears after the dry click stops
    assert np.abs(y[SR // 4:]).max() > 1e-4
    # dry level dominates, at juce::Reverb's dryGain = dry_level * 2
    assert y[:64].max() == pytest.approx(0.97 * 2.0, abs=0.2)


def test_integrated_loudness_sine_reference():
    # 997 Hz full-scale sine ≈ -3.01 dB mean square → LUFS ≈ -0.69 + K-gain
    x = _tone(997, secs=2.0, amp=1.0)
    lufs = fx.integrated_loudness(x, SR)
    assert -4.5 < lufs < -2.0  # BS.1770: ~-3.01 LUFS for 0 dBFS @ 1 kHz


def test_loudness_normalize_hits_target():
    x = _tone(440, secs=2.0, amp=0.05)
    y = fx.loudness_normalize(x, SR, target_lufs=-18.0)
    assert fx.integrated_loudness(y, SR) == pytest.approx(-18.0, abs=0.5)
    silent = np.zeros(SR, np.float32)
    assert fx.loudness_normalize(silent, SR).max() == 0.0


def test_enhance_audio_end_to_end():
    rng = np.random.RandomState(1)
    x = (_tone(220, secs=1.5, amp=0.2)
         + 0.01 * rng.randn(int(1.5 * SR)).astype(np.float32))
    y = fx.enhance_audio(x, SR)
    assert y.dtype == np.float32 and y.shape == x.shape
    assert np.isfinite(y).all()
    assert fx.integrated_loudness(y, SR) == pytest.approx(-18.0, abs=1.0)


def test_allpass_is_juce_form_not_unity_gain():
    """Freeverb/JUCE 'allpass': y[n] = w[n-D] - x[n], w[n] = x[n] +
    0.5·w[n-D] ⇒ impulse response -1, (1.5-0.5)=1.0 at D, then ×0.5 per
    D — NOT the flat-magnitude textbook allpass (review r4)."""
    h = fx._allpass(np.eye(1, 400, 0, dtype=np.float64)[0], 100)
    assert h[0] == pytest.approx(-1.0)
    assert h[100] == pytest.approx(1.0)
    assert h[200] == pytest.approx(0.5)
    assert h[300] == pytest.approx(0.25)


def test_comb_damped_delay_one_no_alias():
    """delay == 1 lands both recursive coefficients on a[1]; they must SUM
    (a tuple assignment silently dropped the damping term)."""
    x = np.zeros(32)
    x[0] = 1.0
    y = fx._comb_damped(x, 1, feedback=0.7, damp=0.2)
    # y[n] = x[n-1] - damp·x[n-2] + (damp + fb(1-damp))·y[n-1] - ... manual:
    # a = [1, -(0.2 + 0.7*0.8)], b = [0, 1, -0.2]
    from scipy.signal import lfilter
    want = lfilter([0.0, 1.0, -0.2], [1.0, -(0.2 + 0.7 * 0.8)], x)
    np.testing.assert_allclose(y, want, atol=1e-12)


def test_freeverb_native_matches_numpy_lfilter_path():
    """The C++ delay-line freeverb and the dense-lfilter fallback are the
    same filters (structural vs rational form): outputs agree to float
    noise, and the native path is what serving's enhance flag rides."""
    from gsv_tts_tpu.utils.native import native_lib

    lib = native_lib()
    if lib is None or not getattr(lib, "_has_freeverb", False):
        pytest.skip("native library not built")
    rng = np.random.RandomState(0)
    x = (rng.randn(SR) * 0.1).astype(np.float32)
    y_native = fx.reverb(x, SR)
    import os

    os.environ["GSV_DISABLE_NATIVE"] = "1"
    native_lib.cache_clear()
    try:
        y_np = fx.reverb(x, SR)
    finally:
        os.environ.pop("GSV_DISABLE_NATIVE", None)
        native_lib.cache_clear()
    np.testing.assert_allclose(y_native, y_np, atol=1e-5)
