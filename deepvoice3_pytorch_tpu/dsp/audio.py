# coding: utf-8
"""Host-facing audio API mirroring the reference audio.py surface
(load_wav / save_wav / preemphasis / spectrogram / melspectrogram /
inv_spectrogram / _normalize / _denormalize — reference audio.py:12-93).

The compute path is the on-device stft.py pipeline (jitted, batched); this
module handles file I/O, resampling, and numpy <-> device glue. Unlike the
reference there is no global hparams singleton dependency at import time —
functions take an hparams-like object (anything with the audio attributes).
"""

import os

import numpy as np
from scipy import signal as sp_signal
from scipy.io import wavfile

import jax
import jax.numpy as jnp

from . import stft as dsp


_GL_FALLBACK_LOGGED = set()


def _log_gl_fallback_once(shape):
    key = tuple(shape)
    if key not in _GL_FALLBACK_LOGGED:
        _GL_FALLBACK_LOGGED.add(key)
        import sys
        print("deepvoice3_pytorch_tpu: Pallas GL working set for shape %r "
              "exceeds this device's VMEM budget; using the XLA-scan "
              "Griffin-Lim (same result, slower)" % (key,),
              file=sys.stderr)


class AudioProcessor:
    """Stateful wrapper caching jitted pipelines + constants per config."""

    def __init__(self, hp):
        self.sample_rate = hp.sample_rate
        self.fft_size = hp.fft_size
        self.hop_size = hp.hop_size
        self.num_mels = hp.num_mels
        self.fmin = hp.fmin
        self.fmax = hp.fmax
        self.preemphasis_coef = hp.preemphasis
        self.min_level_db = hp.min_level_db
        self.ref_level_db = hp.ref_level_db
        self.power = getattr(hp, "power", 1.4)
        self.gl_iters = getattr(hp, "griffin_lim_iters", 60)
        self.gl_matmul_dtype = (getattr(hp, "griffin_lim_matmul_dtype", "")
                                or None)
        self.gl_carry_dtype = (getattr(hp, "griffin_lim_carry_dtype", "")
                               or None)
        self.gl_phase_init = getattr(hp, "griffin_lim_phase_init", "zero")
        self.gl_momentum = float(getattr(hp, "griffin_lim_momentum", 0.99))
        self.rescaling = getattr(hp, "rescaling", False)
        self.rescaling_max = getattr(hp, "rescaling_max", 0.999)
        self.allow_clipping = getattr(hp, "allow_clipping_in_normalization",
                                      True)
        # "lws" (default): causal framing + PR-normalized sqrt-Hann — the
        # reference's lws.stft conventions (reference audio.py:31-55),
        # validated against the committed golden model
        # (tests/test_dsp_golden.py). "center": librosa-style centered
        # reflect-padded framing.
        self.stft_mode = getattr(hp, "stft_mode", "lws")
        assert self.stft_mode in ("lws", "center"), self.stft_mode
        # phase retrieval for inv_spectrogram: "gl" (momentum Griffin-Lim,
        # default — measured >= LWS quality at equal iterations) or "lws"
        # (on-device local weighted sums, dsp/lws_phase.py).
        self.phase_retrieval = getattr(hp, "phase_retrieval", "gl")
        if self.phase_retrieval == "lws" and self.fft_size % self.hop_size:
            # fail at construction, not deep in the first inversion:
            # the LWS local operator only exists for hop | fft
            # (dsp/lws_phase.py) — GL handles any hop.
            raise ValueError(
                "phase_retrieval='lws' requires hop_size to divide "
                "fft_size (got fft_size=%d hop_size=%d); use the default "
                "'gl'" % (self.fft_size, self.hop_size))

        # host-side constants; device copies + jitted pipelines are built
        # lazily so CPU-only users (native-DSP preprocessing) never touch
        # the accelerator
        if self.stft_mode == "lws":
            self.window_np = dsp.lws_hann_window(self.fft_size, self.hop_size)
        else:
            self.window_np = dsp.sqrt_hann_window(self.fft_size)
        self.mel_filters_np = dsp.mel_basis(
            self.sample_rate, self.fft_size, self.num_mels, self.fmin,
            self.fmax)
        self._device = None

    @property
    def window(self):
        return self._device_fns()[0]

    @property
    def mel_filters(self):
        return self._device_fns()[1]

    def _device_fns(self):
        if self._device is not None:
            return self._device
        window = jnp.asarray(self.window_np)
        mel_w = jnp.asarray(self.mel_filters_np)

        fft, hop, win = self.fft_size, self.hop_size, window
        mld, rld = float(self.min_level_db), float(self.ref_level_db)
        pre = float(self.preemphasis_coef)
        centered = self.stft_mode == "center"

        @jax.jit
        def _features(y):
            """waveform (..., T) -> (linear (..., n, F), mel (..., n, M))
            both normalized to [0, 1] (reference audio.py:31-51 semantics;
            lws mode: causal framing over the tail-padded signal)."""
            e = dsp.preemphasis(y, pre)
            if not centered:
                e = dsp.lws_pad(e, fft, hop)
            D = jnp.abs(dsp.stft(e, fft, hop, win, center=centered))
            linear = dsp.normalize(dsp.amp_to_db(D, mld) - rld, mld)
            mel_amp = jnp.einsum("mf,...nf->...nm", mel_w, D)
            mel = dsp.normalize(dsp.amp_to_db(mel_amp, mld) - rld, mld)
            return linear, mel

        # The vocoder is three SEPARATE jitted programs chained in Python.
        # Composing them into one jit (even with optimization_barrier
        # fences) sends the TPU AOT compile from ~1 min to >25 min at
        # batch-32 shapes; as separate programs each compiles fast and the
        # extra dispatches are microseconds. The DFT matrices arrive as
        # runtime args — multi-MB HLO constants are their own compile-time
        # blowup (see dsp/stft.py:dft_mats).

        @jax.jit
        def _denorm_pow(spec, power):
            S = dsp.db_to_amp(dsp.denormalize(spec, mld) + rld)
            return S ** power

        # Phase-retrieval backend selection (static at trace time):
        #   * DEFAULT on TPU: the whole-retrieval Pallas kernel — measured
        #     1.68x the XLA-scan loop at batch-32 bench shapes at equal
        #     quality (dsp/gl_pallas.py header). DV3_PALLAS_GL=0 forces
        #     the XLA loop; DV3_PALLAS_GL=1 forces the kernel off-TPU
        #     (interpret mode — correctness only, slow).
        #   * elsewhere (CPU tests, non-lws research configs): the XLA
        #     scan (stft.py:griffin_lim).
        env_gl = os.environ.get("DV3_PALLAS_GL", "")
        use_pallas_gl = (env_gl == "1"
                         or (env_gl != "0"
                             and jax.default_backend() == "tpu"))
        use_lws_phase = self.phase_retrieval == "lws"

        @jax.jit
        def _gl(S, mats):
            if use_lws_phase:
                from .lws_phase import lws_run
                return lws_run(S, fft, hop, self.window_np,
                               n_iters=self.gl_iters, center=centered,
                               mats=mats)
            if use_pallas_gl and S.ndim in (2, 3):
                # graceful degradation: on a small-VMEM device generation
                # the whole-retrieval kernel can't hold its working set —
                # take the XLA-scan path instead of failing (shapes are
                # static at trace time, so this branch compiles away)
                from . import gl_pallas
                if gl_pallas.fits_vmem(S.shape[-2], fft, hop, S.shape[-1]):
                    return gl_pallas.griffin_lim_pallas(
                        S, fft, hop, win, n_iters=self.gl_iters, mats=mats,
                        momentum=self.gl_momentum,
                        phase_init=self.gl_phase_init, center=centered)
                _log_gl_fallback_once(S.shape)
            return dsp.griffin_lim(S, fft, hop, win, n_iters=self.gl_iters,
                                   mats=mats, center=centered,
                                   momentum=self.gl_momentum,
                                   matmul_dtype=self.gl_matmul_dtype,
                                   phase_init=self.gl_phase_init,
                                   carry_dtype=self.gl_carry_dtype)

        @jax.jit
        def _inv_pre(wav):
            return dsp.inv_preemphasis(wav, pre)

        def _inv_spectrogram(spec, power, mats):
            """normalized linear (..., n, F) -> waveform (..., T)."""
            return _inv_pre(_gl(_denorm_pow(spec, power), mats))


        @jax.jit
        def _features_padded(y_padded):
            """Batched features over host-prepadded signals: caller applied
            preemphasis + per-utterance analysis padding (lws mode: none —
            the common zero tail-pad IS the lws convention; center mode:
            reflect pad fft//2 each side), then zero-padded to a common
            length. Frames beyond each utterance's true count are garbage
            and must be sliced off."""
            D = jnp.abs(dsp.stft(y_padded, fft, hop, win, center=False))
            linear = dsp.normalize(dsp.amp_to_db(D, mld) - rld, mld)
            mel_amp = jnp.einsum("mf,...nf->...nm", mel_w, D)
            mel = dsp.normalize(dsp.amp_to_db(mel_amp, mld) - rld, mld)
            return linear, mel

        dft = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))
        self._device = (window, mel_w, _features, _features_padded,
                        _inv_spectrogram, dft)
        return self._device

    @property
    def _features(self):
        return self._device_fns()[2]

    @property
    def _features_padded(self):
        return self._device_fns()[3]

    @property
    def _inv(self):
        return self._device_fns()[4]

    # -- file I/O (host) ----------------------------------------------------

    def load_wav(self, path):
        sr, wav = wavfile.read(path)
        if wav.dtype == np.int16:
            wav = wav.astype(np.float32) / 32768.0
        elif wav.dtype == np.int32:
            wav = wav.astype(np.float32) / 2147483648.0
        elif wav.dtype == np.uint8:
            wav = (wav.astype(np.float32) - 128.0) / 128.0
        else:
            wav = wav.astype(np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=1)
        if sr != self.sample_rate:
            g = np.gcd(int(self.sample_rate), int(sr))
            wav = sp_signal.resample_poly(wav, self.sample_rate // g, sr // g)
        return wav.astype(np.float32)

    def save_wav(self, wav, path):
        wav = np.asarray(wav)
        wav = wav * 32767 / max(0.01, np.max(np.abs(wav)))
        wavfile.write(path, self.sample_rate, wav.astype(np.int16))

    # -- feature extraction (reference audio.py:31-51) ----------------------

    def spectrogram(self, y):
        linear, _ = self._features(jnp.asarray(y))
        return np.asarray(linear).T  # (F, n) like the reference

    def melspectrogram(self, y):
        _, mel = self._features(jnp.asarray(y))
        if not self.allow_clipping:
            m = np.asarray(mel)
            assert m.max() <= 1.0 and m.min() >= 0.0
        return np.asarray(mel).T  # (M, n)

    def both_spectrograms(self, y):
        linear, mel = self._features(jnp.asarray(y))
        return np.asarray(linear), np.asarray(mel)  # (n, F), (n, M)

    def num_frames(self, length):
        """Frame count for a length-`length` waveform under the active
        framing convention (lws: ceil(T/hop); center: 1 + T//hop)."""
        if self.stft_mode == "lws":
            return dsp.lws_num_frames(length, self.hop_size)
        return dsp.num_frames(length, self.fft_size, self.hop_size)

    def batch_features(self, wavs, bucket_samples=16384):
        """TPU-batched feature extraction over a list of ragged waveforms.

        Replaces the reference's per-utterance ProcessPoolExecutor + lws C++
        path (ljspeech.py:25-36): host does preemphasis (+ analysis padding),
        device runs one fused STFT/mel/normalize program per length bucket.
        Returns [(linear (n_i, F), mel (n_i, M))], exact per utterance: in
        lws mode the shared zero tail-pad IS the lws convention (causal
        frames of utterance i read only its samples + trailing zeros); in
        center mode each utterance is reflect-padded individually first.
        """
        pad = self.fft_size // 2
        centered = self.stft_mode == "center"
        prepped, n_frames = [], []
        for w in wavs:
            e = np.asarray(w, np.float32)
            e = np.concatenate([e[:1], e[1:] - self.preemphasis_coef * e[:-1]])
            if centered:
                e = np.pad(e, (pad, pad), mode="reflect")
            else:
                e = dsp.lws_pad(e, self.fft_size, self.hop_size)
            prepped.append(e)
            n_frames.append(self.num_frames(len(w)))

        max_len = max(len(p) for p in prepped)
        max_len = ((max_len + bucket_samples - 1) // bucket_samples) \
            * bucket_samples
        batch = np.zeros((len(prepped), max_len), np.float32)
        for i, p in enumerate(prepped):
            batch[i, :len(p)] = p
        linear, mel = self._features_padded(jnp.asarray(batch))
        linear, mel = np.asarray(linear), np.asarray(mel)
        return [(linear[i, :n], mel[i, :n]) for i, n in enumerate(n_frames)]

    # -- inversion (reference audio.py:37-43) -------------------------------

    @property
    def _dft(self):
        return self._device_fns()[5]

    def inv_spectrogram(self, spectrogram):
        """spectrogram: (F, n) normalized linear -> waveform, like the
        reference; batched (B, n, F) via inv_spectrogram_batch."""
        spec = jnp.asarray(spectrogram).T
        return np.asarray(self._inv(spec, self.power, self._dft))

    def inv_spectrogram_batch(self, spec_bnf):
        return np.asarray(self._inv(jnp.asarray(spec_bnf), self.power,
                                    self._dft))

    def inv_spectrogram_device(self, spec_bnf):
        """Run the (internally jitted) vocoder; the DFT matrices travel as
        runtime args. Do NOT wrap this in another jit — re-tracing would
        re-embed them as giant HLO constants (compile-time blowup)."""
        return self._inv(spec_bnf, self.power, self._dft)

    # -- scalar helpers ------------------------------------------------------

    def _normalize(self, S):
        return np.asarray(dsp.normalize(jnp.asarray(S), self.min_level_db))

    def _denormalize(self, S):
        return np.asarray(dsp.denormalize(jnp.asarray(S), self.min_level_db))

    def preemphasis(self, x):
        return np.asarray(dsp.preemphasis(jnp.asarray(x),
                                          self.preemphasis_coef))

    def inv_preemphasis(self, x):
        return np.asarray(dsp.inv_preemphasis(jnp.asarray(x),
                                              self.preemphasis_coef))
