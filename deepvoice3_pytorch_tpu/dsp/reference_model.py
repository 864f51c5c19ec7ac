# coding: utf-8
"""Clean-room numpy golden model of the reference DSP pipeline.

The reference (r9y9/deepvoice3_pytorch audio.py) extracts features and
inverts spectrograms through the `lws` C++ extension:

    spectrogram(y)    = normalize(amp_to_db(|lws.stft(preemphasis(y))|)
                                  - ref_level_db)            (audio.py:31-34)
    melspectrogram(y) = same with a librosa Slaney mel basis  (audio.py:46-51)
    inv_spectrogram   = denorm -> amp -> **power -> lws.run_lws phase
                        retrieval -> lws.istft -> inv preemph (audio.py:37-43)

`lws` is not installable in this environment (no network egress), so this
module is a from-scratch numpy model of that pipeline built from the
published algorithm (Le Roux et al., "Fast signal reconstruction from
magnitude STFT spectrogram based on spectrogram consistency", and the lws
package documentation). It exists ONLY for verification: golden fixtures
(tools/make_dsp_goldens.py -> tests/data/dsp_golden_*.npy) and the parity
tests in tests/test_dsp_golden.py are generated/checked against it. It is
deliberately independent of dsp/stft.py — float64, FFT-based, different
code paths — so agreement between the two is evidence, not tautology.

Documented convention assumptions (cannot be validated against the real
lws binary offline; recorded in DESIGN.md):
  * analysis window = sqrt(symmetric Hann), scaled so the steady-state
    overlap-add of its square is 1 (perfect reconstruction with the same
    window as synthesis dual);
  * causal framing: frame i covers samples [i*hop, i*hop + fft); the tail
    is zero-padded; frame count = ceil(T / hop);
  * batch-mode phase retrieval = fixed-point iteration of the spectrogram
    consistency projection with the given magnitudes re-imposed each step
    (the family lws, Griffin-Lim, and fast GL all belong to).
"""

import numpy as np

__all__ = [
    "analysis_window", "stft", "istft", "spectrogram", "melspectrogram",
    "inv_spectrogram", "mel_filterbank", "consistency_kernels",
    "run_lws", "spectral_convergence",
]


# ---------------------------------------------------------------------------
# window / framing (lws conventions)
# ---------------------------------------------------------------------------


def analysis_window(fft_size, hop):
    """sqrt(symmetric Hann) normalized so steady-state OLA(w^2) == 1."""
    n = np.arange(fft_size)
    a = np.sqrt(0.5 - 0.5 * np.cos(2.0 * np.pi * n / (fft_size - 1)))
    t0 = fft_size // 2
    k = fft_size // hop
    c = sum(a[t0 - j * hop] ** 2 for j in range(-k + 1, k)
            if 0 <= t0 - j * hop < fft_size)
    return a / np.sqrt(c)


def _frame_count(T, hop):
    return int(np.ceil(T / hop))


def _pad_for_frames(x, n_frames, fft_size, hop):
    need = (n_frames - 1) * hop + fft_size
    return np.concatenate([x, np.zeros(need - len(x))]) if need > len(x) \
        else x[:need]


def stft(x, fft_size, hop, window=None):
    """Causal-framing magnitude-layout STFT: (T,) -> complex (F, n_bins),
    frame-relative phase (plain rfft of each windowed frame)."""
    if window is None:
        window = analysis_window(fft_size, hop)
    x = np.asarray(x, np.float64)
    F = _frame_count(len(x), hop)
    xp = _pad_for_frames(x, F, fft_size, hop)
    frames = np.stack([xp[i * hop:i * hop + fft_size] for i in range(F)])
    return np.fft.rfft(frames * window, axis=-1)


def istft(S, fft_size, hop, T=None, window=None):
    """Inverse with canonical-dual synthesis (pointwise OLA(w^2) division)."""
    if window is None:
        window = analysis_window(fft_size, hop)
    F = S.shape[0]
    need = (F - 1) * hop + fft_size
    frames = np.fft.irfft(S, n=fft_size, axis=-1)
    y = np.zeros(need)
    norm = np.zeros(need)
    for i in range(F):
        y[i * hop:i * hop + fft_size] += frames[i] * window
        norm[i * hop:i * hop + fft_size] += window ** 2
    y = y / np.maximum(norm, 1e-12)
    return y[:T] if T is not None else y[:F * hop]


# ---------------------------------------------------------------------------
# feature chain (reference audio.py:31-51, 79-93 formulas)
# ---------------------------------------------------------------------------


def _amp_to_db(x, min_level_db):
    min_level = np.exp(min_level_db / 20.0 * np.log(10.0))
    return 20.0 * np.log10(np.maximum(min_level, x))


def _normalize(S, min_level_db):
    return np.clip((S - min_level_db) / -min_level_db, 0.0, 1.0)


def _preemphasis(x, coef):
    x = np.asarray(x, np.float64)
    return np.concatenate([x[:1], x[1:] - coef * x[:-1]])


def mel_filterbank(sample_rate, fft_size, n_mels, fmin, fmax):
    """Slaney-normalized triangular mel filterbank (librosa.filters.mel
    defaults: htk=False, norm='slaney'), built by np.interp over band
    edges — an independent construction from dsp/stft.py's ramps formula."""
    def hz2mel(f):
        f = np.atleast_1d(np.asarray(f, np.float64))
        lin = f / (200.0 / 3)
        brk = 1000.0 / (200.0 / 3)
        log_step = np.log(6.4) / 27.0
        out = np.where(f >= 1000.0,
                       brk + np.log(np.maximum(f, 1.0) / 1000.0) / log_step,
                       lin)
        return out

    def mel2hz(m):
        m = np.atleast_1d(np.asarray(m, np.float64))
        brk = 1000.0 / (200.0 / 3)
        log_step = np.log(6.4) / 27.0
        return np.where(m >= brk,
                        1000.0 * np.exp(log_step * (m - brk)),
                        (200.0 / 3) * m)

    n_bins = fft_size // 2 + 1
    freqs = np.arange(n_bins) * sample_rate / fft_size
    edges = mel2hz(np.linspace(hz2mel(fmin)[0], hz2mel(fmax)[0], n_mels + 2))
    fb = np.zeros((n_mels, n_bins))
    for j in range(n_mels):
        lo, ct, hi = edges[j], edges[j + 1], edges[j + 2]
        tri = np.interp(freqs, [lo, ct, hi], [0.0, 1.0, 0.0],
                        left=0.0, right=0.0)
        fb[j] = tri * (2.0 / (hi - lo))  # Slaney area normalization
    return fb


def spectrogram(y, hp):
    """Normalized linear spectrogram, reference layout (n_bins, F)."""
    D = stft(_preemphasis(y, hp.preemphasis), hp.fft_size, hp.hop_size).T
    S = _amp_to_db(np.abs(D), hp.min_level_db) - hp.ref_level_db
    return _normalize(S, hp.min_level_db)


def melspectrogram(y, hp):
    D = stft(_preemphasis(y, hp.preemphasis), hp.fft_size, hp.hop_size).T
    mel_w = mel_filterbank(hp.sample_rate, hp.fft_size, hp.num_mels,
                           hp.fmin, hp.fmax)
    S = _amp_to_db(mel_w @ np.abs(D), hp.min_level_db) - hp.ref_level_db
    return _normalize(S, hp.min_level_db)


# ---------------------------------------------------------------------------
# phase retrieval (models lws.run_lws batch mode) + quality metric
# ---------------------------------------------------------------------------


def _stft_full(x, fft_size, hop, window):
    """Full-spectrum STFT in the absolute-phase convention used for the
    consistency-kernel analysis (S~[n,m] = sum_u x(u) a(u-nH) e^{-2pi i mu/N})."""
    F = _frame_count(len(x), hop)
    xp = _pad_for_frames(np.asarray(x, np.complex128), F, fft_size, hop)
    frames = np.stack([xp[i * hop:i * hop + fft_size] for i in range(F)])
    S = np.fft.fft(frames * window, axis=-1)
    m = np.arange(fft_size)[None, :]
    n = np.arange(F)[:, None]
    return S * np.exp(-2j * np.pi * m * (n * hop) / fft_size)


def _istft_full(S, fft_size, hop, T, window):
    F = S.shape[0]
    m = np.arange(fft_size)[None, :]
    n = np.arange(F)[:, None]
    frames = np.fft.ifft(S * np.exp(2j * np.pi * m * (n * hop) / fft_size),
                         axis=-1)
    need = (F - 1) * hop + fft_size
    y = np.zeros(need, np.complex128)
    norm = np.zeros(need)
    for i in range(F):
        y[i * hop:i * hop + fft_size] += frames[i] * window
        norm[i * hop:i * hop + fft_size] += window ** 2
    return (y / np.maximum(norm, 1e-12))[:T]


def consistency_kernels(fft_size, hop, window=None, dm_max=4):
    """Numerically extract the LOCAL spectrogram-consistency kernels: the
    linear operator G = STFT o iSTFT restricted to a (2k-1) x (2*dm_max+1)
    neighborhood. G is a twisted convolution — the kernel depends on the
    SOURCE frame index mod k (k = fft/hop): K_r[dn, dm] with
    (G S)[n, m] = sum_{dn,dm} K_{(n-dn) mod k}[dn, dm] * S[n-dn, m-dm]
    (m circular over the full spectrum). These are the weights the LWS
    algorithm's local updates use; extraction is exact by linearity
    (impulse responses at interior positions), validated in
    tests/test_dsp_golden.py against the full operator.

    Returns complex (k, 2k-1, 2*dm_max+1)."""
    if window is None:
        window = analysis_window(fft_size, hop)
    k = fft_size // hop
    dn_max = k - 1
    Fn = 6 * k          # enough interior frames
    T = hop * Fn - hop // 2   # hop does not divide T: frame count exact
    m0 = fft_size // 3
    kers = np.zeros((k, 2 * dn_max + 1, 2 * dm_max + 1), np.complex128)
    for r in range(k):
        n0 = 3 * k + r
        Z = np.zeros((Fn, fft_size), np.complex128)
        Z[n0, m0] = 1.0
        G = _stft_full(_istft_full(Z, fft_size, hop, T, window),
                       fft_size, hop, window)
        for dn in range(-dn_max, dn_max + 1):
            for dm in range(-dm_max, dm_max + 1):
                kers[r, dn + dn_max, dm + dm_max] = \
                    G[n0 + dn, (m0 + dm) % fft_size]
    return kers


def _local_consistency(S, kers):
    """Apply the truncated twisted-convolution consistency operator to a
    full-spectrum (F, fft) array."""
    k, n_dn, n_dm = kers.shape
    dn_max, dm_max = (n_dn - 1) // 2, (n_dm - 1) // 2
    resid = np.arange(S.shape[0]) % k
    out = np.zeros_like(S)
    for dn in range(-dn_max, dn_max + 1):
        Sn = np.roll(S, dn, axis=0)
        if dn > 0:
            Sn[:dn] = 0
        elif dn < 0:
            Sn[dn:] = 0
        coef = kers[(resid - dn) % k, dn + dn_max]      # (F, n_dm)
        for dm in range(-dm_max, dm_max + 1):
            out += coef[:, dm + dm_max, None] * np.roll(Sn, dm, axis=1)
    return out


def run_lws(mag, fft_size, hop, *, n_iters=100, window=None, local=True,
            momentum=0.0, kers=None):
    """Phase retrieval from half-spectrum magnitudes (F, n_bins) by
    fixed-point iteration of the (local if `local` else full) consistency
    projection with magnitude re-imposition — the LWS batch-mode family.
    Returns complex (F, n_bins) in frame-relative layout (stft())."""
    if window is None:
        window = analysis_window(fft_size, hop)
    F, n_bins = mag.shape
    T = F * hop
    # lift to full spectrum (Hermitian), absolute-phase convention
    m = np.arange(fft_size)[None, :]
    n = np.arange(F)[:, None]
    to_abs = np.exp(-2j * np.pi * m * (n * hop) / fft_size)
    full_mag = np.concatenate(
        [mag, mag[:, fft_size // 2 - 1:0:-1]], axis=1)
    S = full_mag.astype(np.complex128)      # zero-phase init
    if local and kers is None:
        kers = consistency_kernels(fft_size, hop, window)
    prev = np.zeros_like(S)
    for _ in range(n_iters):
        C = (_local_consistency(S, kers) if local else
             _stft_full(_istft_full(S, fft_size, hop, T, window),
                        fft_size, hop, window))
        if momentum:
            C, prev = C + momentum * (C - prev), C
        S = full_mag * C / np.maximum(np.abs(C), 1e-16)
    # back to frame-relative half spectrum
    S_rel = S * np.conj(to_abs)
    return S_rel[:, :n_bins]


def inv_spectrogram(spec, hp, *, n_iters=100, local=False, momentum=0.99):
    """Full reference inversion chain (audio.py:37-43): denormalize ->
    dB->amp -> **power -> phase retrieval -> istft -> inverse preemphasis.
    spec: reference layout (n_bins, F) normalized."""
    db = np.clip(spec, 0, 1) * -hp.min_level_db + hp.min_level_db
    S = np.power(10.0, (db + hp.ref_level_db) * 0.05) ** hp.power
    D = run_lws(S.T, hp.fft_size, hp.hop_size, n_iters=n_iters, local=local,
                momentum=momentum)
    y = istft(D, hp.fft_size, hp.hop_size)
    out = np.zeros_like(y)
    prev = 0.0
    for i in range(len(y)):            # y[n] = x[n] + coef * y[n-1]
        prev = y[i] + hp.preemphasis * prev
        out[i] = prev
    return out


def spectral_convergence(wav, target_mag, fft_size, hop, window=None):
    """||  |STFT(wav)| - M ||_F / || M ||_F — the standard phase-retrieval
    quality metric (lower is better)."""
    M = np.abs(stft(wav, fft_size, hop, window))
    n = min(M.shape[0], target_mag.shape[0])
    return (np.linalg.norm(M[:n] - target_mag[:n])
            / np.linalg.norm(target_mag[:n]))
