# coding: utf-8
"""On-device DSP: STFT / iSTFT / mel / Griffin-Lim as batched XLA FFT
pipelines.

TPU-native replacement for the reference's lws C++ extension
(reference audio.py:9,31-55): the forward STFT feeds feature extraction, and
iterative phase retrieval (Griffin-Lim with momentum — the same
fixed-point family as LWS) reconstructs waveforms, all inside jit. Batched:
every function takes (..., T) signals and vectorizes over leading dims.

Overlap-add exploits fft_size % hop == 0 (1024/256 in every preset): each
output block receives exactly fft_size//hop frame chunks, so iSTFT is a
reshape + K shifted adds instead of a scatter — fully vectorized on the VPU.
"""

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# windows / mel basis (host-side constants)
# ---------------------------------------------------------------------------


def hann_window(n, dtype=np.float32):
    """Periodic Hann (matches scipy.signal.get_window('hann', n))."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(dtype)


def sqrt_hann_window(n, dtype=np.float32):
    return np.sqrt(hann_window(n, np.float64)).astype(dtype)


def hann_window_symmetric(n, dtype=np.float64):
    """Symmetric Hann (matches np.hanning: zeros at both endpoints)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / (n - 1))) \
        .astype(dtype)


def lws_hann_window(n, hop, dtype=np.float32):
    """LWS-convention analysis window: sqrt of a *symmetric* Hann, scaled
    so the steady-state overlap-add of its square is 1 (the perfect-
    reconstruction normalization an analysis/synthesis window pair needs
    when both are the same window).

    This models the window the reference's vocoder uses —
    ``lws.lws(fft_size, hop_size, mode="speech")`` (reference audio.py:54-55)
    builds a sqrt-Hann pair normalized for perfect reconstruction. The
    absolute scale matters: features are normalized dB
    (amp_to_db - ref_level_db), so a window scale factor shifts every
    feature by a constant. Validated against the committed clean-room
    golden model (dsp/reference_model.py, tests/test_dsp_golden.py).
    """
    a = np.sqrt(hann_window_symmetric(n, np.float64))
    t0 = n // 2
    k = n // hop
    c = sum(a[t0 - j * hop] ** 2 for j in range(-k + 1, k)
            if 0 <= t0 - j * hop < n)
    return (a / np.sqrt(c)).astype(dtype)


def _hz_to_mel(f):
    """Slaney mel scale (librosa htk=False default)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_basis(sample_rate, fft_size, n_mels=80, fmin=125, fmax=7600,
              dtype=np.float32):
    """Slaney-normalized triangular mel filterbank, matching
    librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) defaults
    (reference audio.py:71-76)."""
    if fmax is None:
        fmax = sample_rate / 2
    n_freqs = fft_size // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax),
                                   n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(dtype)  # (n_mels, n_freqs)


# ---------------------------------------------------------------------------
# DFT-as-matmul kernels (TPU path)
#
# The TPU has no FFT unit; XLA's FFT lowering produces huge programs whose
# compile time explodes when composed into larger graphs (measured: minutes
# to >25 min for Griffin-Lim at batch 32). At fft_size ~1k a dense DFT is a
# pair of (fft, n_bins) real matmuls — exactly what the MXU is for: compile
# is trivial and runtime beats the FFT lowering at these sizes.
# ---------------------------------------------------------------------------


def _dft_matrices(fft_size, dtype=np.float32):
    """Real/imag forward-DFT matrices (fft, n_bins) for rfft semantics."""
    n = np.arange(fft_size)[:, None].astype(np.float64)
    k = np.arange(fft_size // 2 + 1)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * n * k / fft_size
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _idft_matrices(fft_size, dtype=np.float32):
    """Real/imag inverse matrices (n_bins, fft) such that
    x = Sr @ inv_re + Si @ inv_im reproduces irfft for a spectrum with
    Hermitian symmetry (interior bins counted twice)."""
    n_bins = fft_size // 2 + 1
    k = np.arange(n_bins)[:, None].astype(np.float64)
    n = np.arange(fft_size)[None, :].astype(np.float64)
    ang = 2.0 * np.pi * k * n / fft_size
    w = np.full((n_bins, 1), 2.0)
    w[0, 0] = 1.0
    if fft_size % 2 == 0:
        w[-1, 0] = 1.0
    inv_re = (w * np.cos(ang) / fft_size).astype(dtype)
    inv_im = (-w * np.sin(ang) / fft_size).astype(dtype)
    return inv_re, inv_im


def dft_mats(fft_size, dtype=np.float32):
    """(fwd_re, fwd_im, inv_re, inv_im) as numpy arrays.

    IMPORTANT: pass these into jitted functions as runtime ARGUMENTS, not
    closed-over constants — multi-MB literals in the HLO send the TPU AOT
    compile from ~1 min to >35 min (measured)."""
    re_m, im_m = _dft_matrices(fft_size, dtype)
    inv_re, inv_im = _idft_matrices(fft_size, dtype)
    return re_m, im_m, inv_re, inv_im


def rdft(frames, mats):
    """rfft via MXU matmuls. frames (..., fft) -> (re, im) (..., bins)."""
    re = jnp.matmul(frames, mats[0], preferred_element_type=jnp.float32)
    im = jnp.matmul(frames, mats[1], preferred_element_type=jnp.float32)
    return re, im


def irdft(re, im, mats):
    """irfft via MXU matmuls. (re, im) (..., bins) -> frames (..., fft)."""
    return (jnp.matmul(re, mats[2], preferred_element_type=jnp.float32)
            + jnp.matmul(im, mats[3], preferred_element_type=jnp.float32))


# ---------------------------------------------------------------------------
# framing / stft / istft
# ---------------------------------------------------------------------------


def _frame(x, fft_size, hop, center=True):
    """(..., T) -> (..., n_frames, fft_size); center=True reflect-pads by
    fft_size//2 on both sides (librosa-style).

    When fft_size % hop == 0 (1024/256 in every preset) framing is k shifted
    strided views stacked on a new axis — slices and reshapes only, no
    gather (XLA gathers at this size are slow to compile and run on TPU)."""
    if center:
        pad = fft_size // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)],
                    mode="reflect")
    T = x.shape[-1]
    n_frames = 1 + (T - fft_size) // hop
    if fft_size % hop == 0:
        k = fft_size // hop
        n_blocks = T // hop
        z = x[..., :n_blocks * hop].reshape(*x.shape[:-1], n_blocks, hop)
        chunks = [z[..., c:c + n_frames, :] for c in range(k)]
        return jnp.concatenate(chunks, axis=-1)
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(fft_size)[None, :])
    return x[..., idx]


def stft(x, fft_size, hop, window, center=True):
    """Batched STFT. x: (..., T) -> complex (..., n_frames, fft_size//2+1).

    center=False expects the caller to have padded the signal (used for
    batched preprocessing where per-utterance reflect padding happens on host
    so ragged batches stay exact)."""
    frames = _frame(x, fft_size, hop, center=center) * window
    return jnp.fft.rfft(frames, n=fft_size, axis=-1)


def num_frames(length, fft_size, hop):
    """Frame count of a centered STFT over a length-`length` signal."""
    return 1 + length // hop


def lws_num_frames(length, hop):
    """Frame count of the lws-convention (causal, tail-padded) STFT:
    ceil(length / hop) — every sample covered, no centering (matches the
    reference vocoder's lws.stft frame count)."""
    return -(-length // hop)


def lws_pad(x, fft_size, hop):
    """Zero-pad the tail so causal framing covers ceil(T/hop) frames:
    frame i reads x[i*hop : i*hop + fft_size] (lws framing convention).
    Works on numpy or jax arrays; T is static."""
    T = x.shape[-1]
    need = (lws_num_frames(T, hop) - 1) * hop + fft_size
    if need == T:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, need - T)]
    if isinstance(x, np.ndarray):
        return np.pad(x, pad)
    return jnp.pad(x, pad)


def istft(spec, fft_size, hop, window, length=None, center=True):
    """Inverse STFT with overlap-add + squared-window COLA normalization.

    spec: complex (..., n_frames, fft_size//2+1) -> (..., T).
    center=True trims the fft//2 analysis padding (centered framing);
    center=False assumes lws-convention causal framing (output starts at
    sample 0 of the analysis timeline).
    """
    frames = jnp.fft.irfft(spec, n=fft_size, axis=-1) * window
    y = _overlap_add(frames, fft_size, hop)
    # squared-window normalization
    wsq = jnp.broadcast_to((window * window)[None, :],
                           (frames.shape[-2], fft_size))
    norm = _overlap_add(wsq, fft_size, hop)
    y = y / jnp.maximum(norm, 1e-8)
    if center:
        y = y[..., fft_size // 2:]
    if length is not None:
        y = y[..., :length]
    else:
        y = y[..., :hop * frames.shape[-2]]
    return y


def _overlap_add(frames, fft_size, hop):
    """(..., n_frames, fft_size) -> (..., n_frames*hop + fft_size - hop)."""
    if fft_size % hop == 0:
        k = fft_size // hop
        *lead, n_frames, _ = frames.shape
        chunks = frames.reshape(*lead, n_frames, k, hop)
        out_blocks = n_frames + k - 1
        y = jnp.zeros((*lead, out_blocks, hop), frames.dtype)
        for c in range(k):
            y = y.at[..., c:c + n_frames, :].add(chunks[..., :, c, :])
        return y.reshape(*lead, out_blocks * hop)
    # generic fallback: position scatter-add
    n_frames = frames.shape[-2]
    T = (n_frames - 1) * hop + fft_size
    idx = (jnp.arange(n_frames)[:, None] * hop +
           jnp.arange(fft_size)[None, :]).reshape(-1)
    flat = frames.reshape(*frames.shape[:-2], -1)
    return jnp.zeros((*frames.shape[:-2], T), frames.dtype).at[..., idx].add(
        flat)


# ---------------------------------------------------------------------------
# Griffin-Lim (momentum-accelerated) — on-device phase retrieval
# ---------------------------------------------------------------------------


def _ola_raw(frames, fft_size, hop, window):
    """Overlap-add of already-windowed frames + squared-window COLA
    normalization, WITHOUT any trim: returns the full analysis-timeline
    signal of length (n_frames-1)*hop + fft_size. Frame i of the input
    corresponds to samples [i*hop, i*hop + fft_size) of the output."""
    y = _overlap_add(frames, fft_size, hop)
    wsq = jnp.broadcast_to((window * window)[None, :],
                           (frames.shape[-2], fft_size))
    norm = _overlap_add(wsq, fft_size, hop)
    return y / jnp.maximum(norm, 1e-8)


def spsi_phase(magnitude, fft_size, hop):
    """Phase-advance initial phase estimate for Griffin-Lim, in the spirit
    of single-pass spectrogram inversion (Beauregard et al. 2015) but
    simplified to its measured-best core: every bin gets its true
    instantaneous frequency by quadratic interpolation of the magnitude
    triplet around it, and its phase advances by hop*omega per frame
    (a cumsum over the frame axis — frame-relative convention, so a
    stationary partial advances omega*hop between hops).

    Classic SPSI additionally phase-locks non-peak bins to their nearest
    spectral peak; measured on the golden corpus that locking is both
    *worse* (spectral convergence 0.1484 vs 0.1442 at 16 iterations when
    GL refinement follows — locking discards per-bin frequency detail GL
    can use) and ~8 ms/batch more expensive (two associative segment-fill
    scans over the bin axis). So this keeps only the per-bin
    interpolated-frequency integration: two shifts, one cumsum — cost is
    far below one GL iteration, and spsi@16 matches zero-phase@30 quality
    (sweep recorded in tools/gl_iters_sweep.py --spsi).

    Used as the Griffin-Lim initialization (phase_init="spsi").

    magnitude: (..., n_frames, n_bins) -> phases, same shape (radians).
    """
    m = magnitude
    F = m.shape[-1]
    left = jnp.concatenate([m[..., :1], m[..., :-1]], axis=-1)
    right = jnp.concatenate([m[..., 1:], m[..., -1:]], axis=-1)
    # quadratic (parabolic) peak interpolation of the log-less magnitude
    # triplet: offset p in [-1/2, 1/2] bins from the integer bin centre
    denom = left - 2.0 * m + right
    p = jnp.where(jnp.abs(denom) > 1e-12,
                  0.5 * (left - right) / jnp.where(
                      jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    p = jnp.clip(p, -0.5, 0.5)
    k = jnp.arange(F, dtype=m.dtype)
    omega = 2.0 * jnp.pi * (k + p) / fft_size          # rad / sample
    return jnp.cumsum(hop * omega, axis=-2)            # over frames


def griffin_lim(magnitude, fft_size, hop, window, *, n_iters=60,
                momentum=0.99, length=None, mats=None, center=True,
                matmul_dtype=None, phase_init=None, carry_dtype=None,
                init_spec=None, return_spec=False, pinned_prefix=None):
    """Phase retrieval from |S| via fast Griffin-Lim (Perraudin et al. 2013),
    the momentum-accelerated fixed point of the same consistency projection
    LWS solves locally (reference audio.py:37-43's run_lws; quality
    equivalence measured in tests/test_dsp_golden.py). Runs entirely on
    device as a lax.scan whose body is a handful of MXU matmuls: the
    DFT/iDFT are dense matrix products (rdft/irdft above) — on TPU this
    both compiles in ~1min (XLA's FFT lowering blows up compile time when
    composed) and keeps the hot loop on the MXU.

    The loop re-frames the raw overlap-add signal directly on the analysis
    timeline (no trim/re-pad), so the iteration is framing-convention
    agnostic — identical semantics to the whole-loop Pallas kernel
    (dsp/gl_pallas.py). `center` only selects the final trim: True drops
    the fft//2 centered-analysis padding, False returns the lws-convention
    causal-framing waveform (sample 0 = frame 0, tap 0).

    magnitude: (..., n_frames, n_freqs) non-negative.
    mats: dft_mats(fft_size) passed as runtime values — jitted callers MUST
        thread them through as arguments (see dft_mats docstring).
    carry_dtype: store the scan carry AND the frames/x/f2 intermediates in
        this dtype (bfloat16 is the production default via
        hparams.griffin_lim_carry_dtype). Unlike matmul_dtype — which
        casts operands inside the loop and measured NEUTRAL because every
        cast is a full extra HBM pass — the bf16 carry makes every matmul
        consume native-bf16 operands with the converts fused into the
        producing elementwise epilogues, and halves the loop's HBM
        traffic: measured 29.2 -> 24.5 ms at (32, 600, 513) x 16 iters on
        v5e at equal-or-better golden-fixture quality (sc 0.1395 vs
        0.1442 f32; tools/gl_bf16carry_probe.py). Momentum, magnitude
        projection, and the final synthesis stay f32.
    Returns waveform (..., T).
    """
    if mats is None:
        mats = tuple(jnp.asarray(m) for m in dft_mats(fft_size))
    S = magnitude.astype(jnp.float32)
    eps = 1e-16

    # Two exact loop-body transforms, measured on v5e at 32x600x513/60 it:
    #  * fold the synthesis/analysis windows INTO the DFT matrices (scale
    #    irdft columns / rdft rows by the window) — removes two full
    #    (B, F, fft) elementwise passes per iteration: 92.9 -> 87.6 ms;
    #  * hoist the loop-invariant COLA norm out of the scan.
    # (Measured non-wins, kept out: packing the 4 matmuls into 2 via
    # [re|im] concat is 7% slower — the per-iter concat materializes an
    # extra tensor; bf16 matmul inputs change nothing — the loop is
    # bandwidth-bound, not MXU-bound.)
    m_inv_re = mats[2] * window[None, :]      # irdft-then-window
    m_inv_im = mats[3] * window[None, :]
    m_fwd_re = window[:, None] * mats[0]      # window-then-rdft
    m_fwd_im = window[:, None] * mats[1]
    # matmul_dtype=bfloat16: run the four per-iteration DFT matmuls with
    # bf16 operands (f32 accumulation via preferred_element_type) — the
    # loop is f32-MXU-throughput-bound at ~1.35 ms/iter, so halving the
    # matmul cost is the remaining lever; phase/magnitude arithmetic stays
    # f32. Quality/speed measured by tools/gl_bf16_probe.py before wiring
    # any default.
    cd = jnp.dtype(carry_dtype) if carry_dtype is not None else None
    md = jnp.dtype(matmul_dtype) if matmul_dtype is not None else None
    if cd is not None:
        # bf16-carry mode: matrices become the operand dtype outright (no
        # in-loop casts), and the loop's big tensors live at half width
        m_inv_re, m_inv_im = m_inv_re.astype(cd), m_inv_im.astype(cd)
        m_fwd_re, m_fwd_im = m_fwd_re.astype(cd), m_fwd_im.astype(cd)
    elif md is not None:
        m_inv_re, m_inv_im = m_inv_re.astype(md), m_inv_im.astype(md)
        m_fwd_re, m_fwd_im = m_fwd_re.astype(md), m_fwd_im.astype(md)
    n_frames = S.shape[-2]
    wsq = jnp.broadcast_to((window * window)[None, :], (n_frames, fft_size))
    inv_norm = 1.0 / jnp.maximum(_overlap_add(wsq, fft_size, hop), 1e-8)
    inv_norm_c = inv_norm.astype(cd) if cd is not None else inv_norm

    def _mm(a, b):
        if cd is None and md is not None:
            a = a.astype(md)
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)

    def project(re, im):
        frames = _mm(re, m_inv_re) + _mm(im, m_inv_im)   # f32 accumulation
        if cd is not None:
            frames = frames.astype(cd)     # fuses into the matmul epilogue
        x = _overlap_add(frames, fft_size, hop) * inv_norm_c
        f2 = _frame(x, fft_size, hop, center=False)
        return _mm(f2, m_fwd_re), _mm(f2, m_fwd_im)      # f32 out

    if pinned_prefix is not None:
        # boundary condition for streaming windows: the first n_pin frames
        # are already-emitted audio — hold them fixed through every
        # iteration so the retrieved suffix stays consistent with what was
        # played (streaming.StreamingVocoder)
        pin_re = pinned_prefix[0].astype(jnp.float32)
        pin_im = pinned_prefix[1].astype(jnp.float32)
        n_pin = pin_re.shape[-2]

        def _pin(re, im):
            re = jnp.concatenate([pin_re.astype(re.dtype),
                                  re[..., n_pin:, :]], axis=-2)
            im = jnp.concatenate([pin_im.astype(im.dtype),
                                  im[..., n_pin:, :]], axis=-2)
            return re, im
    else:
        def _pin(re, im):
            return re, im

    def body(carry, _):
        c_re, c_im, tp_re, tp_im = carry
        t_re, t_im = project(c_re, c_im)
        # momentum + magnitude projection in f32 regardless of carry dtype
        a_re = t_re + momentum * (t_re - tp_re.astype(jnp.float32))
        a_im = t_im + momentum * (t_im - tp_im.astype(jnp.float32))
        mag = jnp.maximum(jnp.sqrt(a_re * a_re + a_im * a_im), eps)
        c_re, c_im = S * a_re / mag, S * a_im / mag
        c_re, c_im = _pin(c_re, c_im)
        if cd is not None:
            c_re, c_im = c_re.astype(cd), c_im.astype(cd)
            t_re, t_im = t_re.astype(cd), t_im.astype(cd)
        return (c_re, c_im, t_re, t_im), None

    z = jnp.zeros_like(S, dtype=cd if cd is not None else S.dtype)
    if init_spec is not None:
        # explicit (re, im) start — the streaming vocoder seeds each window
        # with the previous window's retrieved phase for continuity
        # (streaming.StreamingVocoder); magnitudes are re-imposed here so
        # callers may pass a raw spectrum
        i_re, i_im = (a.astype(jnp.float32) for a in init_spec)
        mag0 = jnp.maximum(jnp.sqrt(i_re * i_re + i_im * i_im), eps)
        c0_re, c0_im = S * i_re / mag0, S * i_im / mag0
    elif phase_init == "spsi":
        phi = spsi_phase(S, fft_size, hop)
        c0_re, c0_im = S * jnp.cos(phi), S * jnp.sin(phi)
    else:
        c0_re, c0_im = S, jnp.zeros_like(S)  # zero phase (classic)
    if cd is not None:
        c0_re, c0_im = c0_re.astype(cd), c0_im.astype(cd)
    (c_re, c_im, _, _), _ = lax.scan(body, (c0_re, c0_im, z, z), None,
                                     length=n_iters)
    # final synthesis in f32
    frames = _mm(c_re, m_inv_re) + _mm(c_im, m_inv_im)
    y = _overlap_add(frames, fft_size, hop) * inv_norm
    if center:
        y = y[..., fft_size // 2:]
    T = length if length is not None else hop * S.shape[-2]
    y = y[..., :T]
    if return_spec:
        return y, (c_re.astype(jnp.float32), c_im.astype(jnp.float32))
    return y


# ---------------------------------------------------------------------------
# dB / normalization helpers (reference audio.py:79-93)
# ---------------------------------------------------------------------------


def amp_to_db(x, min_level_db=-100.0):
    min_level = math.exp(min_level_db / 20.0 * math.log(10.0))
    return 20.0 * jnp.log10(jnp.maximum(min_level, x))


def db_to_amp(x):
    return jnp.power(10.0, x * 0.05)


def normalize(S, min_level_db=-100.0):
    return jnp.clip((S - min_level_db) / -min_level_db, 0.0, 1.0)


def denormalize(S, min_level_db=-100.0):
    return (jnp.clip(S, 0.0, 1.0) * -min_level_db) + min_level_db


# ---------------------------------------------------------------------------
# first-order IIR via associative scan (preemphasis inverse, on device)
# ---------------------------------------------------------------------------


def preemphasis(x, coef=0.97):
    """y[n] = x[n] - coef * x[n-1] (nnmnkwii lfilter([1,-coef],[1],x))."""
    x_prev = jnp.pad(x[..., :-1], [(0, 0)] * (x.ndim - 1) + [(1, 0)])
    return x - coef * x_prev


def inv_preemphasis(x, coef=0.97):
    """y[n] = x[n] + coef * y[n-1] — first-order IIR solved in O(log T)
    depth with an associative scan (no per-sample host loop)."""
    a = jnp.full_like(x, coef)

    def combine(l, r):
        a1, b1 = l
        a2, b2 = r
        return a1 * a2, b2 + a2 * b1

    _, y = lax.associative_scan(combine, (a, x), axis=-1)
    return y


def inv_preemphasis_carry(x, coef, y_prev):
    """Streaming inv_preemphasis: continue the IIR from carry y_prev (the
    last output sample of the previous chunk, shape x.shape[:-1]).

    The recurrence is linear, so the chunk solution splits exactly into the
    zero-state response (inv_preemphasis of the chunk alone) plus the
    zero-input response y_prev * coef**(t+1). Returns (y, new_carry)."""
    T = x.shape[-1]
    y = inv_preemphasis(x, coef)
    decay = coef ** jnp.arange(1, T + 1, dtype=x.dtype)
    y = y + y_prev[..., None] * decay
    return y, y[..., -1]
