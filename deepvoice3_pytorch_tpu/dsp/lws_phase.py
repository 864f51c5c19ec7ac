# coding: utf-8
"""On-device LWS (local weighted sums) phase retrieval.

TPU-native implementation of the algorithm family behind the reference's
vocoder (`lws.run_lws`, reference audio.py:37-43): iterate the spectrogram-
consistency projection truncated to a LOCAL time-frequency neighborhood,
re-imposing the given magnitudes each step. The local weights are the
numerically-extracted twisted-convolution kernels of G = STFT o iSTFT
(dsp/reference_model.py:consistency_kernels): exact by linearity, with the
twist structure K_r[dn, dm] indexed by the source frame index mod
k = fft // hop.

Why this shape on TPU: unlike Griffin-Lim, the LWS inner loop needs NO
FFT/DFT at all — each iteration is 63 (= (2k-1) x (2*dm_max+1)) rolled
complex multiply-adds over the (B, F, fft) spectrum, pure VPU work that XLA
fuses into a handful of elementwise kernels inside one lax.scan. Only the
final iSTFT touches the MXU (dense iDFT matmuls, dsp/stft.py:irdft).

Conventions: computation runs on the FULL spectrum in the absolute-phase
convention (where G's kernel is position-independent). The lift/restore
phase factor e^{-2pi i m n H / N} is periodic — it depends only on
(m * n) mod k — so it is computed on device from int32 residues instead of
shipping an (F, fft) complex table. Hermitian symmetry (real signal) is
preserved automatically: magnitudes are Hermitian, the kernel derives from
a real-signal operator, and the magnitude re-imposition keeps it.

Default phase retrieval stays momentum Griffin-Lim (measured to converge
at least as well per iteration — tests/test_dsp_golden.py); this module is
the parity option (hparams.phase_retrieval = "lws").
"""

from functools import lru_cache

import numpy as np
import jax.numpy as jnp
from jax import lax

from . import stft as dsp


@lru_cache(maxsize=8)
def _host_kernels(fft_size, hop, window_key, dm_max=4):
    """Extract + cache the twisted consistency kernels (numpy, f64)."""
    from . import reference_model as ref
    window = np.frombuffer(window_key, dtype=np.float64)
    return ref.consistency_kernels(fft_size, hop, window, dm_max=dm_max)


def _coef_rows(kers, F):
    """Per-output-row complex coefficients for each (dn, dm) tap:
    coef[dn, dm, n] = K_{(n-dn) mod k}[dn, dm], zeroed where the source row
    n - dn falls outside [0, F) so a circular jnp.roll is exact."""
    k, n_dn, n_dm = kers.shape
    dn_max = (n_dn - 1) // 2
    rows = np.arange(F)
    coef = np.zeros((n_dn, n_dm, F), np.complex128)
    for i, dn in enumerate(range(-dn_max, dn_max + 1)):
        c = kers[(rows - dn) % k, i, :].T            # (n_dm, F)
        valid = (rows - dn >= 0) & (rows - dn < F)
        coef[i] = c * valid[None, :]
    return coef


def lws_run(mag, fft_size, hop, window_np, *, n_iters=60, momentum=0.9,
            center=True, mats=None, dm_max=4):
    """Phase retrieval from |S|: (..., F, n_bins) -> waveform (..., T).

    mag is in the frame-relative half-spectrum layout of dsp.stft().
    window_np: the (host, float) analysis window used by the STFT.
    center selects only the final trim (like dsp.griffin_lim)."""
    if fft_size % hop != 0:
        # The twisted-convolution structure (kernel indexed by frame mod
        # k, lift factor periodic in (m*n) mod k) exists only when
        # hop | fft_size; for other hops the consistency operator's
        # period is fft_size/gcd(fft_size, hop) frames and this local
        # truncation is silently wrong. Momentum Griffin-Lim (the
        # default phase_retrieval) handles any hop.
        raise ValueError(
            "lws phase retrieval requires hop to divide fft_size "
            "(got fft=%d hop=%d); use phase_retrieval='gl'"
            % (fft_size, hop))
    if mats is None:
        mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft_size))
    window_np = np.asarray(window_np, np.float64)
    kers = _host_kernels(fft_size, hop, window_np.tobytes(), dm_max=dm_max)
    k = fft_size // hop
    dn_max = k - 1

    *lead, F, n_bins = mag.shape
    assert n_bins == fft_size // 2 + 1
    coef = _coef_rows(kers, F)                       # (n_dn, n_dm, F)
    coef_re = jnp.asarray(coef.real, jnp.float32)
    coef_im = jnp.asarray(coef.imag, jnp.float32)

    # full-spectrum Hermitian magnitudes (..., F, fft)
    M = jnp.concatenate(
        [mag, mag[..., fft_size // 2 - 1:0:-1]], axis=-1).astype(jnp.float32)

    # absolute-phase twist: e^{-2pi i (m n H mod N)/N} = e^{-2pi i (mn mod k)/k}
    m_idx = jnp.arange(fft_size, dtype=jnp.int32) % k
    n_idx = jnp.arange(F, dtype=jnp.int32) % k
    resid = (n_idx[:, None] * m_idx[None, :]) % k    # (F, fft)
    ang = -2.0 * jnp.pi * resid.astype(jnp.float32) / k
    tw_re, tw_im = jnp.cos(ang), jnp.sin(ang)        # lift factor
    # restore factor is the conjugate (tw_re, -tw_im)

    def local_G(re, im):
        out_re = jnp.zeros_like(re)
        out_im = jnp.zeros_like(im)
        for i, dn in enumerate(range(-dn_max, dn_max + 1)):
            re_n = jnp.roll(re, dn, axis=-2)
            im_n = jnp.roll(im, dn, axis=-2)
            for j in range(coef.shape[1]):
                dm = j - (coef.shape[1] - 1) // 2
                cr = coef_re[i, j][:, None]
                ci = coef_im[i, j][:, None]
                sr = jnp.roll(re_n, dm, axis=-1)
                si = jnp.roll(im_n, dm, axis=-1)
                out_re = out_re + cr * sr - ci * si
                out_im = out_im + cr * si + ci * sr
        return out_re, out_im

    eps = 1e-16

    def body(carry, _):
        re, im, pre, pim = carry
        g_re, g_im = local_G(re, im)
        a_re = g_re + momentum * (g_re - pre)
        a_im = g_im + momentum * (g_im - pim)
        norm = jnp.maximum(jnp.sqrt(a_re * a_re + a_im * a_im), eps)
        return (M * a_re / norm, M * a_im / norm, g_re, g_im), None

    z = jnp.zeros_like(M)
    (re, im, _, _), _ = lax.scan(body, (M, z, z, z), None, length=n_iters)

    # back to frame-relative half spectrum, then iSTFT via iDFT matmuls:
    # S_rel = S_abs * conj(twist), twist = tw_re + i tw_im
    re_rel = re * tw_re + im * tw_im
    im_rel = im * tw_re - re * tw_im
    re_h = re_rel[..., :n_bins]
    im_h = im_rel[..., :n_bins]
    win = jnp.asarray(window_np.astype(np.float32))
    frames = dsp.irdft(re_h, im_h, mats) * win
    y = dsp._ola_raw(frames, fft_size, hop, win)
    if center:
        y = y[..., fft_size // 2:]
    return y[..., :hop * F]
