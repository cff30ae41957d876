"""Host-DSP parity: SOLA offset search (vs the reference torch formula and
between the C++/numpy backends) and monotonic Viterbi backend equality."""
import numpy as np
import pytest

from gsv_tts_tpu import dsp
from gsv_tts_tpu.utils.native import native_lib

torch = pytest.importorskip("torch")


def _ref_sola_offset(f1, f2, overlap_len, search_len=320):
    """The reference formula verbatim (TTS.py:1612-1627) in torch."""
    import torch.nn.functional as F

    q = torch.from_numpy(f1).view(1, 1, -1)
    key = torch.from_numpy(f2[: overlap_len + search_len]).view(1, 1, -1)
    corr = F.conv1d(key, q)
    energy = F.conv1d(key ** 2, torch.ones_like(q)) + 1e-8
    return int((corr / torch.sqrt(energy)).argmax(dim=-1))


@pytest.mark.parametrize("true_offset", [0, 7, 120, 319])
def test_sola_offset_matches_reference(true_offset):
    rng = np.random.RandomState(true_offset + 1)
    t = np.arange(16000) / 32000.0
    f2 = (0.3 * np.sin(2 * np.pi * 220 * t)
          + 0.1 * np.sin(2 * np.pi * 733 * t)
          + 0.02 * rng.randn(t.size)).astype(np.float32)
    overlap = 3200
    f1 = f2[true_offset: true_offset + overlap].copy()

    ref = _ref_sola_offset(f1, f2, overlap)
    assert ref == true_offset  # the formula recovers the planted shift
    aligned, off = dsp.sola_align(f1, f2, overlap)
    assert off == ref
    assert len(aligned) == len(f2) - off
    # cross-fade endpoints: starts at f1, converges to aligned f2
    assert aligned[0] == pytest.approx(f1[0], abs=1e-5)
    np.testing.assert_allclose(aligned[overlap:], f2[off + overlap:],
                               rtol=1e-6)


def test_sola_native_matches_numpy():
    lib = native_lib()
    if lib is None:
        pytest.skip("native lib not built")
    rng = np.random.RandomState(3)
    f2 = rng.randn(8000).astype(np.float32)
    overlap = 1600
    key = f2[: overlap + 320]
    win = np.lib.stride_tricks.sliding_window_view(key, overlap)
    f1 = f2[55: 55 + overlap].copy()
    corr = win @ f1
    energy = np.sqrt((win ** 2).sum(axis=1) + 1e-8)
    assert lib.sola_offset(f1, key, overlap) == int(np.argmax(corr / energy))


def test_viterbi_native_matches_numpy(monkeypatch):
    if native_lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.RandomState(0)
    attn = rng.rand(2, 40, 10).astype(np.float32)  # [heads, frames, phones]
    native_path = dsp.viterbi_monotonic(attn)

    monkeypatch.setenv("GSV_DISABLE_NATIVE", "1")
    native_lib.cache_clear()
    try:
        numpy_path = dsp.viterbi_monotonic(attn)
    finally:
        native_lib.cache_clear()
    np.testing.assert_array_equal(np.asarray(native_path),
                                  np.asarray(numpy_path))
    valid = np.asarray(numpy_path)
    diffs = np.diff(valid[valid >= 0])
    assert np.all((diffs == 0) | (diffs == 1))
