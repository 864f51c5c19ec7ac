# coding: utf-8
"""DSP pipeline tests: STFT/iSTFT roundtrip, mel basis, Griffin-Lim
reconstruction quality, dB helpers (reference tests/test_audio.py)."""
import numpy as np
import pytest

import jax.numpy as jnp

from deepvoice3_pytorch_tpu.dsp import stft as dsp
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor


class HP:
    sample_rate = 22050
    fft_size = 1024
    hop_size = 256
    num_mels = 80
    fmin = 125
    fmax = 7600
    preemphasis = 0.97
    min_level_db = -100
    ref_level_db = 20
    power = 1.4
    griffin_lim_iters = 30
    rescaling = False
    allow_clipping_in_normalization = True


def _test_signal(T=22050, sr=22050):
    t = np.arange(T) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t) +
         0.3 * np.sin(2 * np.pi * 440 * t) * np.exp(-t * 2) +
         0.05 * np.random.RandomState(0).randn(T))
    return x.astype(np.float32)


def test_db_roundtrip():
    x = np.abs(np.random.RandomState(0).rand(100).astype(np.float32)) + 1e-3
    y = dsp.db_to_amp(dsp.amp_to_db(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_normalize_roundtrip():
    S = np.random.RandomState(0).uniform(-100, 0, (50,)).astype(np.float32)
    out = dsp.denormalize(dsp.normalize(jnp.asarray(S)))
    np.testing.assert_allclose(np.asarray(out), S, atol=1e-4)


def test_preemphasis_roundtrip():
    x = _test_signal(4096)
    y = dsp.inv_preemphasis(dsp.preemphasis(jnp.asarray(x), 0.97), 0.97)
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_preemphasis_matches_lfilter():
    from scipy.signal import lfilter
    x = _test_signal(2048)
    got = np.asarray(dsp.preemphasis(jnp.asarray(x), 0.97))
    want = lfilter([1, -0.97], [1], x).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
    got_inv = np.asarray(dsp.inv_preemphasis(jnp.asarray(want), 0.97))
    want_inv = lfilter([1], [1, -0.97], want).astype(np.float32)
    np.testing.assert_allclose(got_inv, want_inv, atol=1e-3)


def test_stft_istft_roundtrip():
    x = _test_signal(8192)
    win = jnp.asarray(dsp.sqrt_hann_window(1024))
    spec = dsp.stft(jnp.asarray(x), 1024, 256, win)
    y = np.asarray(dsp.istft(spec, 1024, 256, win, length=8192))
    # interior must reconstruct near-perfectly (COLA)
    np.testing.assert_allclose(y[1024:-1024], x[1024:-1024], atol=1e-3)


def test_stft_batched():
    x = np.stack([_test_signal(4096), _test_signal(4096)[::-1].copy()])
    win = jnp.asarray(dsp.sqrt_hann_window(1024))
    spec = dsp.stft(jnp.asarray(x), 1024, 256, win)
    assert spec.shape[0] == 2 and spec.shape[-1] == 513
    single = dsp.stft(jnp.asarray(x[1]), 1024, 256, win)
    np.testing.assert_allclose(np.asarray(spec[1]), np.asarray(single),
                               atol=1e-5)


def test_mel_basis_properties():
    w = dsp.mel_basis(22050, 1024, 80, 125, 7600)
    assert w.shape == (80, 513)
    assert (w >= 0).all()
    # every filter has some support, band edges respected
    assert (w.sum(axis=1) > 0).all()
    freqs = np.linspace(0, 22050 / 2, 513)
    active = w.sum(axis=0) > 0
    assert freqs[active].min() >= 100 and freqs[active].max() <= 7700


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("librosa"),
    reason="librosa not installed")
def test_mel_basis_matches_librosa():
    import librosa
    want = librosa.filters.mel(sr=22050, n_fft=1024, n_mels=80, fmin=125,
                               fmax=7600)
    got = dsp.mel_basis(22050, 1024, 80, 125, 7600)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_griffin_lim_reconstruction():
    """GL from magnitude-only must reconstruct a close magnitude spectrum."""
    x = _test_signal(16384)
    win = jnp.asarray(dsp.sqrt_hann_window(1024))
    mag = jnp.abs(dsp.stft(jnp.asarray(x), 1024, 256, win))
    y = dsp.griffin_lim(mag, 1024, 256, win, n_iters=40)
    mag2 = jnp.abs(dsp.stft(y, 1024, 256, win))
    n = min(mag.shape[-2], mag2.shape[-2])
    err = np.linalg.norm(np.asarray(mag[:n] - mag2[:n])) / \
        np.linalg.norm(np.asarray(mag[:n]))
    assert err < 0.15, f"spectral convergence error {err}"


def test_audio_processor_end_to_end(tmp_path):
    hp = HP()
    ap = AudioProcessor(hp)
    x = _test_signal(22050)
    linear = ap.spectrogram(x)
    mel = ap.melspectrogram(x)
    assert linear.shape[0] == 513 and mel.shape[0] == 80
    assert linear.shape[1] == mel.shape[1]
    assert 0.0 <= linear.min() and linear.max() <= 1.0

    wav = ap.inv_spectrogram(linear)
    assert wav.ndim == 1 and len(wav) > 0.8 * len(x)
    # reconstruction carries the dominant 220 Hz component
    spec = np.abs(np.fft.rfft(wav * np.hanning(len(wav))))
    freqs = np.fft.rfftfreq(len(wav), 1 / hp.sample_rate)
    peak = freqs[np.argmax(spec)]
    assert abs(peak - 220) < 15, f"peak at {peak} Hz"

    p = tmp_path / "x.wav"
    ap.save_wav(wav, str(p))
    back = ap.load_wav(str(p))
    assert abs(len(back) - len(wav)) < 4


def test_audio_processor_batched_inversion():
    ap = AudioProcessor(HP())
    x = np.stack([_test_signal(8192), _test_signal(8192)])
    linear, mel = ap.both_spectrograms(x)
    assert linear.shape[0] == 2 and linear.shape[-1] == 513
    wavs = ap.inv_spectrogram_batch(linear)
    assert wavs.shape[0] == 2


def test_spsi_phase_shapes_and_batching():
    """spsi_phase is shape-polymorphic: (n, F) and (B, n, F) agree per
    item, output is finite, and the frame-axis integration is an
    inclusive cumsum (frame 0 already carries one hop of advance)."""
    rs = np.random.RandomState(0)
    m = rs.rand(2, 37, 513).astype(np.float32)  # odd frame count
    phi_b = np.asarray(dsp.spsi_phase(jnp.asarray(m), 1024, 256))
    assert phi_b.shape == m.shape and np.isfinite(phi_b).all()
    phi_0 = np.asarray(dsp.spsi_phase(jnp.asarray(m[0]), 1024, 256))
    np.testing.assert_allclose(phi_b[0], phi_0, rtol=1e-6)
    # inclusive integration: frame f phase ~ (f+1) * hop * omega
    np.testing.assert_allclose(phi_b[:, 1] - phi_b[:, 0],
                               phi_b[:, 0], rtol=0.51)


def test_spsi_phase_silence_and_flat_are_finite():
    """All-zero and flat magnitudes hit the interpolation guard
    (denom == 0): p must clamp to 0, phases stay finite."""
    for m in (np.zeros((5, 513), np.float32),
              np.ones((5, 513), np.float32)):
        phi = np.asarray(dsp.spsi_phase(jnp.asarray(m), 1024, 256))
        assert np.isfinite(phi).all()
        # flat spectrum => p == 0 => omega = 2*pi*k/fft exactly
        k = np.arange(513)
        want = np.cumsum(np.tile(256 * 2 * np.pi * k / 1024, (5, 1)),
                         axis=0)
        np.testing.assert_allclose(phi, want.astype(np.float32), rtol=1e-4)


def test_spsi_pure_tone_phase_advance():
    """A stationary pure tone's estimated phase advances by ~hop*omega_true
    per frame at the peak bin — the property that makes the init good."""
    sr, f0 = 22050, 440.0
    x = np.sin(2 * np.pi * f0 * np.arange(4 * 1024) / sr).astype(np.float32)
    win = jnp.asarray(dsp.sqrt_hann_window(1024))
    S = jnp.abs(dsp.stft(jnp.asarray(x), 1024, 256, win))
    phi = np.asarray(dsp.spsi_phase(S, 1024, 256))
    peak = int(np.argmax(np.asarray(S)[5]))
    d = np.diff(phi[3:9, peak])
    want = 256 * 2 * np.pi * f0 / sr
    np.testing.assert_allclose(d, want, rtol=0.02)
