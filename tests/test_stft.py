"""DSP parity and property tests (spectrogram vs torch.stft; resampler)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gsv_tts_tpu.ops import stft

torch = pytest.importorskip("torch")


def test_spectrogram_matches_torch_stft():
    rng = np.random.RandomState(0)
    audio = rng.randn(1, 4000).astype(np.float32)
    n_fft, hop, win = 512, 128, 512
    ref = torch.stft(torch.tensor(audio), n_fft, hop, win,
                     window=torch.hann_window(win), center=True,
                     pad_mode="reflect", return_complex=True).abs().numpy()
    ours = np.asarray(stft.spectrogram(jnp.asarray(audio), n_fft, hop, win))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_spectrogram_padded_window():
    rng = np.random.RandomState(1)
    audio = rng.randn(1, 3210).astype(np.float32)
    n_fft, hop, win = 1024, 320, 640
    ref = torch.stft(torch.tensor(audio), n_fft, hop, win,
                     window=torch.hann_window(win), center=True,
                     pad_mode="reflect", return_complex=True).abs().numpy()
    ours = np.asarray(stft.spectrogram(jnp.asarray(audio), n_fft, hop, win))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("sr0,sr1", [(32000, 16000), (44100, 16000), (16000, 48000)])
def test_resample_preserves_tone(sr0, sr1):
    """A pure tone must keep its frequency and amplitude after resampling."""
    t = np.arange(int(sr0 * 0.5)) / sr0
    f = 440.0
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = stft.resample(x, sr0, sr1)
    assert abs(len(y) - int(np.ceil(len(x) * sr1 / sr0))) <= 1
    # dominant frequency via FFT
    spec = np.abs(np.fft.rfft(y[len(y) // 4: len(y) // 4 + 4096] *
                              np.hanning(4096)))
    peak = np.argmax(spec) * sr1 / 4096
    assert abs(peak - f) <= sr1 / 4096  # within one FFT bin
    mid = y[len(y) // 4: -len(y) // 4]
    assert 0.95 < np.max(np.abs(mid)) < 1.05


def test_resample_identity():
    x = np.random.RandomState(2).randn(2, 100).astype(np.float32)
    np.testing.assert_array_equal(stft.resample(x, 16000, 16000), x)


def test_mel_distance_zero_for_identical():
    x = np.random.RandomState(3).randn(32000).astype(np.float32)
    assert stft.mel_distance(x, x) == 0.0
    y = x + 0.1 * np.random.RandomState(4).randn(32000).astype(np.float32)
    assert stft.mel_distance(x, y) > 0.01
