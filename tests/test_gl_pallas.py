# coding: utf-8
"""Pallas Griffin-Lim kernel vs the XLA-scan implementation: both must
reach the same magnitude-consistent reconstruction (waveforms can differ
immaterially at the two boundary frames — see dsp/gl_pallas.py docstring)."""

import numpy as np

import jax.numpy as jnp

from deepvoice3_pytorch_tpu.dsp import stft as dsp
from deepvoice3_pytorch_tpu.dsp.gl_pallas import griffin_lim_pallas

FFT, HOP = 1024, 256


def _mag_batch():
    t = np.arange(22050) / 22050.0
    w1 = (0.5 * np.sin(2 * np.pi * 440 * t)
          + 0.2 * np.sin(2 * np.pi * 950 * t)).astype(np.float32)
    w2 = (0.4 * np.sin(2 * np.pi * 220 * t)
          * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    win = jnp.asarray(dsp.sqrt_hann_window(FFT))
    S = jnp.stack([jnp.abs(dsp.stft(jnp.asarray(w), FFT, HOP, win))
                   for w in (w1, w2)])
    return S, win


def _spec_err(wav, target_mag, win):
    m = jnp.abs(dsp.stft(wav, FFT, HOP, win))
    n = min(m.shape[-2], target_mag.shape[-2])
    return float(jnp.abs(m[..., :n, :] - target_mag[..., :n, :]).mean())


def test_pallas_gl_matches_xla_quality():
    S, win = _mag_batch()
    wav_x = dsp.griffin_lim(S, FFT, HOP, win, n_iters=30)
    wav_p = griffin_lim_pallas(S, FFT, HOP, win, n_iters=30, interpret=True)
    assert wav_p.shape == wav_x.shape
    assert np.isfinite(np.asarray(wav_p)).all()

    # Phase retrieval is non-unique: the two implementations converge to
    # different but equally-valid phase solutions (boundary seeding differs).
    # The quality criterion is spectral consistency with the target
    # magnitudes — they must match within a few percent.
    err_x = _spec_err(wav_x, S, win)
    err_p = _spec_err(wav_p, S, win)
    assert err_p < err_x * 1.05, (err_p, err_x)

    # deterministic
    wav_p2 = griffin_lim_pallas(S, FFT, HOP, win, n_iters=30, interpret=True)
    assert (np.asarray(wav_p) == np.asarray(wav_p2)).all()


def test_pallas_gl_length_trim():
    S, win = _mag_batch()
    wav = griffin_lim_pallas(S, FFT, HOP, win, n_iters=2, length=5000,
                             interpret=True)
    assert wav.shape == (2, 5000)


def test_pallas_gl_spsi_matches_xla_bf16_carry():
    """With the SPSI init + bf16 carry the kernel computes the SAME
    algorithm as the XLA path (stft.py:griffin_lim with phase_init='spsi',
    carry_dtype='bfloat16') — waveforms must agree to bf16 round-off
    (divergence amplified by a few iterations of the fixed point)."""
    rs = np.random.RandomState(0)
    S = jnp.asarray((rs.rand(2, 37, 513) ** 2).astype(np.float32))
    win = jnp.asarray(dsp.lws_hann_window(FFT, HOP))
    wav_k = np.asarray(griffin_lim_pallas(
        S, FFT, HOP, win, n_iters=4, momentum=0.9, phase_init="spsi",
        center=False, interpret=True))
    wav_x = np.asarray(dsp.griffin_lim(
        S, FFT, HOP, win, n_iters=4, momentum=0.9, phase_init="spsi",
        carry_dtype="bfloat16", center=False))
    assert wav_k.shape == wav_x.shape
    d = np.abs(wav_k - wav_x).max() / max(np.abs(wav_x).max(), 1e-9)
    # the kernel folds windows into its bf16 matrices where the XLA path
    # folds then casts at slightly different points — two bf16 rounding
    # schedules of the same algorithm, divergence amplified by 4 fixed-
    # point iterations (measured 0.075 on this random-magnitude input;
    # quality equivalence is pinned on the golden fixture in
    # tests/test_dsp_golden.py::test_inversion_quality_pallas_kernel)
    assert d < 0.12, d


def test_pallas_gl_init_pin_return_spec():
    """The streaming-window features — explicit init spectrum, pinned
    prefix, returned final spectrum — computed by the kernel must match
    the XLA path (same algorithm, bf16-vs-f32 rounding schedules):
    pinned rows stay exactly at their init values in BOTH, and the
    retrieved suffix agrees to bf16 round-off."""
    rs = np.random.RandomState(1)
    B, n, F = 2, 29, 513
    S = jnp.asarray((rs.rand(B, n, F) ** 2).astype(np.float32))
    win = jnp.asarray(dsp.lws_hann_window(FFT, HOP))
    ang = rs.rand(B, n, F).astype(np.float32) * 2 * np.pi
    init = (S * jnp.cos(ang), S * jnp.sin(ang))
    n_pin = 6

    wav_k, (kre, kim) = griffin_lim_pallas(
        S, FFT, HOP, win, n_iters=4, momentum=0.9, center=False,
        init_spec=init, n_pinned=n_pin, return_spec=True, interpret=True)
    wav_x, (xre, xim) = dsp.griffin_lim(
        S, FFT, HOP, win, n_iters=4, momentum=0.9, center=False,
        carry_dtype="bfloat16", init_spec=init,
        pinned_prefix=(init[0][:, :n_pin], init[1][:, :n_pin]),
        return_spec=True)

    # pinned prefix held at its init values (bf16 for the kernel's carry)
    want = np.asarray(init[0][:, :n_pin])
    assert np.abs(np.asarray(kre)[:, :n_pin] - want).max() \
        <= np.abs(want).max() * 0.01
    np.testing.assert_allclose(np.asarray(xre)[:, :n_pin], want, rtol=2e-2,
                               atol=1e-5)

    # same fixed point up to bf16 rounding-schedule divergence
    assert wav_k.shape == wav_x.shape
    d = np.abs(np.asarray(wav_k) - np.asarray(wav_x)).max() \
        / max(np.abs(np.asarray(wav_x)).max(), 1e-9)
    assert d < 0.12, d


def test_pallas_gl_block_items_matches_single():
    """block_items=G batches G items per grid step; the per-item math
    (OLA, re-framing, SPSI cumsum) is G static loops of the G=1 code —
    the same algorithm in the same op order. Results agree to GEMM
    ulp-level: the backend may BLOCK a matmul differently at G*n rows
    than at n rows (e.g. with excess-precision FMA contraction on CPU),
    and the GL fixed point amplifies that over iterations — measured
    4.7e-4 after 4 iterations on this input. Covers the pad-to-16 frame
    path (odd n), the streaming configuration (init+pin+return_spec),
    and the zero/spsi inits."""
    rs = np.random.RandomState(2)
    B, n, F = 4, 21, 513            # odd n exercises the tile padding
    S = jnp.asarray((rs.rand(B, n, F) ** 2).astype(np.float32))
    win = jnp.asarray(dsp.lws_hann_window(FFT, HOP))

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        return np.abs(a - b).max() <= 5e-3 * max(np.abs(a).max(), 1e-9)

    for pi in ("zero", "spsi"):
        w1 = griffin_lim_pallas(S, FFT, HOP, win, n_iters=4,
                                phase_init=pi, interpret=True,
                                block_items=1)
        w4 = griffin_lim_pallas(S, FFT, HOP, win, n_iters=4,
                                phase_init=pi, interpret=True,
                                block_items=4)
        assert close(w1, w4), pi

    ang = rs.rand(B, n, F).astype(np.float32) * 2 * np.pi
    init = (S * jnp.cos(ang), S * jnp.sin(ang))
    w1, (re1, im1) = griffin_lim_pallas(
        S, FFT, HOP, win, n_iters=4, center=False, init_spec=init,
        n_pinned=5, return_spec=True, interpret=True, block_items=1)
    w2, (re2, im2) = griffin_lim_pallas(
        S, FFT, HOP, win, n_iters=4, center=False, init_spec=init,
        n_pinned=5, return_spec=True, interpret=True, block_items="auto")
    assert close(w1, w2)
    assert close(re1, re2) and close(im1, im2)
    assert re1.shape == (B, n, F)
    # pinned rows are held at their (magnitude-reimposed) init values in
    # BOTH paths — exact, not just close: the pin is a where(), not math
    assert (np.asarray(re2)[:, :5] == np.asarray(re1)[:, :5]).all()


def test_pallas_gl_2d_input_squeeze():
    S, win = _mag_batch()
    wav_b = griffin_lim_pallas(S, FFT, HOP, win, n_iters=2, interpret=True)
    wav_1 = griffin_lim_pallas(S[0], FFT, HOP, win, n_iters=2,
                               interpret=True)
    assert wav_1.ndim == 1
    assert np.allclose(np.asarray(wav_1), np.asarray(wav_b[0]))
