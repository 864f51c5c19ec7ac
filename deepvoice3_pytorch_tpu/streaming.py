# coding: utf-8
"""Streaming synthesis: incremental text -> audio with bounded latency.

The batch pipeline (synthesis.tts_batch) returns nothing until the whole
utterance is decoded and vocoded. For interactive serving the metric that
matters is **time-to-first-audio** (TTFA): how long before the first
playable samples exist. This module streams the same three stages
chunk-by-chunk:

  1. **Decode** — the whole-loop Pallas kernel (ops/fused_decode.py)
     launched `chunk` frames at a time from the host, carrying its ring
     buffers / fed-back frame / monotonic-attention state between launches
     (the identical carry contract as fused_decode_chunked, driven from
     Python instead of lax.while_loop so the host sees every chunk).
  2. **Converter** — run on a sliding window of decoder outputs with
     enough left/right context (computed from the conv specs' receptive
     field) that every *emitted* linear frame is bit-equal to the
     full-utterance converter output. Emission therefore lags the decoder
     by the converter's lookahead (the stack is non-causal,
     reference deepvoice3.py:501-580).
  3. **Vocoder** — phase-coherent windowed Griffin-Lim (StreamingVocoder):
     each window re-retrieves `gl_context` already-played frames PINNED to
     their emitted spectrum, anchors the new frames' SPSI phase to the
     context, and holds back `gl_lookahead` frames so emissions stay off
     the window's future edge; quality is pinned vs whole-utterance GL in
     tests/test_streaming.py (streamed comes out *better* than the batch
     default). The inverse-preemphasis IIR is continued EXACTLY across
     chunks (host-side scipy lfilter with carried filter state;
     dsp/stft.py:inv_preemphasis_carry is the device-side equivalent for
     in-graph pipelines).

The reference has no streaming path at all — its incremental_forward
decodes frame-by-frame in Python but still vocodes the whole utterance at
the end (reference synthesis.py:42-73).

Typical numbers (one v5e chip, LJSpeech preset, batch 1): first audio in
tens of ms, ~0.4 s of audio per first chunk — see bench.py
extras.streaming.
"""

import math
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .ops import core, fused_decode as fd
from .dsp import stft as dsp

CONV_BUCKET = 16      # converter window length bucket (mel frames)

_GL_FN_CACHE = {}     # AudioProcessor -> jitted window vocoder


# ---------------------------------------------------------------------------
# converter receptive field (exactness contract for windowed application)
# ---------------------------------------------------------------------------


def decoded_samples(cfg, ap, dec_steps):
    """Waveform samples corresponding to `dec_steps` decoder steps:
    dec_steps * r mel frames, upsampled by the converter, hop samples per
    linear frame. THE trim formula for every streaming consumer."""
    up = getattr(cfg.converter, "time_upsampling", 1)
    return int(dec_steps) * cfg.r * up * ap.hop_size


def converter_context(ccfg):
    """(left, right) context in converter-INPUT frames such that output
    frame t depends only on inputs [t - left, t + right].

    Walk the spec list tracking the time-rate multiplier: a conv at an
    upsampled rate needs proportionally fewer input-rate frames. convT
    (kernel 2, stride 2) tiles exactly — output frames 2t, 2t+1 read only
    input t — so it scales the rate without adding context. +1 margin on
    each side guards float rounding of the rate division (the windowed ==
    full equality is asserted in tests/test_streaming.py)."""
    rate = 1.0
    left = right = 0.0
    for s in ccfg.specs:
        if s.kind == "convT":
            # only the tiling case is context-free; an overlapping convT
            # (kw > stride) would make output frames depend on neighbor
            # inputs and silently break the windowed==full contract
            if s.kernel_size != s.stride:
                raise NotImplementedError(
                    "converter_context: convT with kernel_size != stride "
                    "(%d != %d) needs explicit receptive-field handling"
                    % (s.kernel_size, s.stride))
            rate *= s.stride
        elif s.kernel_size > 1:
            span = (s.kernel_size - 1) * s.dilation
            if s.causal:
                left += span / rate
            else:
                left += (span / 2.0) / rate
                right += (span / 2.0) / rate
    return int(math.ceil(left)) + 1, int(math.ceil(right)) + 1


# ---------------------------------------------------------------------------
# jitted stage programs
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "max_total"))
def _prepare_prog(params, cfg, x, pos, lengths, spk, *, max_total):
    """Everything launch-invariant, one program: speaker embed, encoder,
    padding mask, fused-decode inputs (projected K/V, position table,
    speaker biases), and the zero decode carry."""
    fam = cfg.family
    B = x.shape[0]
    speaker_embed = None
    if spk is not None:
        speaker_embed = core.embedding_apply(params["embed_speakers"], spk)
    encoder_out = fam.encoder_apply(params["encoder"], cfg.encoder, x,
                                    speaker_embed=speaker_embed)
    Tk = encoder_out[0].shape[1]
    mask = (core.get_mask_from_lengths(lengths, Tk)
            if lengths is not None else None)
    fi = fam.fused_decode_inputs(params["decoder"], cfg.decoder, encoder_out,
                                 pos, max_total,
                                 speaker_embed=speaker_embed)
    prep = fd._Prepared(params["decoder"], cfg.decoder, fi["projected_kv"],
                        mask, w_query=fi["w_query"],
                        speaker_bias=fi["speaker_bias"],
                        fpe_raw=fi["fpe_raw"])
    la0, bufs0 = prep.zero_carry()
    prev0 = jnp.zeros((B, cfg.decoder.in_dim * cfg.decoder.r), jnp.float32)
    arrays = dict(projected_kv=fi["projected_kv"], fpe_table=fi["fpe_table"],
                  w_query=fi["w_query"], speaker_bias=fi["speaker_bias"],
                  mask=mask, speaker_embed=speaker_embed)
    return arrays, (prev0, la0, bufs0)


@partial(jax.jit, static_argnames=("cfg", "steps", "fpe_raw", "interpret"))
def _chunk_prog(params, cfg, projected_kv, mask, w_query, speaker_bias,
                fpe_table, t0, prev, la, bufs, *, steps, fpe_raw, interpret):
    """One `steps`-frame launch of the fused decoder from carry.

    Rebuilds the launch plan in-graph from the runtime params (weight
    folding is a few MB of elementwise work — hoisting it here keeps the
    decoder weights as program *arguments*, never multi-MB HLO constants;
    see DESIGN.md §4)."""
    prep = fd._Prepared(params, cfg, projected_kv, mask, w_query=w_query,
                        speaker_bias=speaker_bias, fpe_raw=fpe_raw)
    fpe_c = lax.dynamic_slice_in_dim(fpe_table, t0, steps, axis=0)
    (o, a, d, s), (prev2, la2, bufs2) = prep.launch(
        fpe_c, prev, la, bufs, steps, interpret)
    return (o, a, d, s), (prev2, la2, bufs2)


@partial(jax.jit, static_argnames=("cfg",))
def _conv_window_prog(params, cfg, window, spk):
    """Converter on a mel-frame window -> linear frames (window * up)."""
    from .builder import model_postnet
    return model_postnet(params, cfg, window, speaker_ids=spk)


# ---------------------------------------------------------------------------
# streaming vocoder (windowed Griffin-Lim + crossfade + exact IIR carry)
# ---------------------------------------------------------------------------


class StreamingVocoder:
    """Incremental normalized-linear-spectrogram -> waveform.

    push(frames) consumes (B, n, F) new linear frames and returns the next
    (B, m) samples; flush() vocodes the held-back lookahead and returns
    the final samples. Each Griffin-Lim window is
    [gl_context emitted frames | emission | gl_lookahead future frames],
    retrieved with THREE continuity devices (each measured on the golden
    fixture, see _build_gl):
      * the context frames are seeded with the previous window's final
        retrieved spectrum and PINNED through every iteration (already-
        played audio is immutable — the suffix must stay consistent
        with it; dsp/stft.py griffin_lim(pinned_prefix=...));
      * the new frames' SPSI init is phase-anchored to the context's last
        frame (per-bin), so integration continues across windows instead
        of restarting at zero;
      * lookahead keeps emitted samples out of the window's future edge.
    Adjacent emissions are additionally crossfaded over `xfade` samples
    (near-identity under pinning; belt and braces). The inverse-
    preemphasis IIR runs over the final crossfaded stream on the host
    (scipy lfilter with carried state), sample-exact with the
    non-streaming vocoder given the same GL output."""

    def __init__(self, ap, gl_context=16, gl_lookahead=8, xfade=None):
        assert ap.stft_mode == "lws", (
            "streaming vocoder requires the lws (causal) framing "
            "convention: per-window sample offsets are frame-aligned")
        self.ap = ap
        self.hop = ap.hop_size
        self.gl_context = int(gl_context)
        self.gl_lookahead = int(gl_lookahead)
        self.xfade = self.hop if xfade is None else int(xfade)
        assert self.xfade <= self.gl_context * self.hop
        self._lin_tail = None       # (B, <=gl_context, F) emitted context
        self._prev_spec = None      # (re, im) retrieved spectrum of _lin_tail
        self._pending = None        # (B, <=gl_lookahead, F) not yet emitted
        self._raw_tail = None       # (B, xfade) host, pre-IIR
        self._had_tail = False      # a previous emission exists (crossfade)
        self._zi = None             # lfilter state (per batch row)
        self._ramp = np.linspace(0.0, 1.0, self.xfade, endpoint=False,
                                 dtype=np.float32)
        # the jitted window vocoder is cached per AudioProcessor: a fresh
        # jit wrapper per stream would re-trace (and look up / re-compile)
        # every program on every utterance — measured ~1 s of TTFA
        if ap not in _GL_FN_CACHE:
            _GL_FN_CACHE[ap] = self._build_gl(ap)
        self._gl_fn = _GL_FN_CACHE[ap]

    @staticmethod
    def _build_gl(ap):
        """Jitted per-window vocoder: denorm+pow -> phase-coherent GL.

        Each window's initial phase is the SPSI estimate shifted (per bin)
        so the context region's last frame lines up with the PREVIOUS
        window's retrieved phase; the context frames themselves are seeded
        with that retrieved spectrum exactly. Without the anchoring,
        per-window SPSI integrates phase from zero at each window start,
        so adjacent windows retrieve mutually incoherent phases and the
        crossfades interfere destructively (measured on the golden
        fixture: sc 0.173 streamed vs 0.144 whole; anchored windows close
        the gap — pinned by tests/test_streaming.py)."""
        fft, hop = ap.fft_size, ap.hop_size
        win = ap.window
        mld, rld = ap.min_level_db, ap.ref_level_db
        # Small windows need more iterations than the whole-utterance
        # default: the batch path's 16 rides a globally-settled SPSI init,
        # while a window's anchored init must re-converge locally. Measured
        # on the golden fixture (87 frames, 8 seams): 16 iters streams at
        # sc 0.1635 vs whole 0.1442; 32 iters streams at 0.1372 vs whole
        # 0.1343 — the seam penalty collapses to ~2% and the stream BEATS
        # the batch default. Cost is proportional to window size, so the
        # extra iterations are cheap.
        iters, momentum = max(ap.gl_iters, 32), ap.gl_momentum
        # On TPU the window retrieval runs as the whole-retrieval Pallas
        # kernel (dsp/gl_pallas.py) with the anchored init passed in and
        # the context frames pinned in-kernel — same boundary semantics as
        # the XLA path, which stays the CPU/fallback implementation
        # (DV3_PALLAS_GL=0 forces it on TPU, as for the batch vocoder).
        env_gl = os.environ.get("DV3_PALLAS_GL", "")
        use_pallas = (env_gl != "0"
                      and jax.default_backend() == "tpu")

        @jax.jit
        def vocode(spec, power, mats, prev_spec):
            S = dsp.db_to_amp(dsp.denormalize(spec, mld) + rld) ** power
            phi = dsp.spsi_phase(S, fft, hop)
            if prev_spec is not None:
                pre, pim = prev_spec
                n_ctx = pre.shape[1]
                delta = (jnp.arctan2(pim[:, -1], pre[:, -1])
                         - phi[:, n_ctx - 1])
                phi = phi + delta[:, None, :]
                i_re = jnp.concatenate(
                    [pre, (S * jnp.cos(phi))[:, n_ctx:]], axis=1)
                i_im = jnp.concatenate(
                    [pim, (S * jnp.sin(phi))[:, n_ctx:]], axis=1)
            else:
                i_re, i_im = S * jnp.cos(phi), S * jnp.sin(phi)
            if use_pallas:
                from .dsp import gl_pallas

                # small-VMEM device generations: degrade to the XLA-scan
                # path (identical boundary semantics) instead of failing
                if gl_pallas.fits_vmem(S.shape[1], fft, hop, S.shape[2],
                                       with_init=True, return_spec=True):
                    n_pin = 0 if prev_spec is None else prev_spec[0].shape[1]
                    return gl_pallas.griffin_lim_pallas(
                        S, fft, hop, win, n_iters=iters, momentum=momentum,
                        mats=mats, center=False, init_spec=(i_re, i_im),
                        n_pinned=n_pin, return_spec=True)
                from .dsp.audio import _log_gl_fallback_once
                _log_gl_fallback_once(S.shape)
            return dsp.griffin_lim(S, fft, hop, win, n_iters=iters,
                                   momentum=momentum, mats=mats,
                                   center=False,
                                   init_spec=(i_re, i_im), return_spec=True,
                                   pinned_prefix=prev_spec)

        return vocode

    def _iir(self, x):
        from scipy.signal import lfilter

        coef = self.ap.preemphasis_coef
        if self._zi is None:
            self._zi = np.zeros((x.shape[0], 1), np.float32)
        y, self._zi = lfilter([1.0], [1.0, -coef], x, axis=-1, zi=self._zi)
        return y.astype(np.float32)

    def _vocode_async(self, emit, future):
        """Device half of a window vocode: dispatch GL over
        [context | emit | future], update the device-side carry (context
        frames + their retrieved spectrum), return an opaque token.
        No host sync happens here — callers can overlap other host round
        trips with the GL device time and _finish() later."""
        parts = [p for p in (self._lin_tail, emit, future)
                 if p is not None and p.shape[1] > 0]
        window = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 1)
        n_ctx = 0 if self._lin_tail is None else self._lin_tail.shape[1]
        n_emit = emit.shape[1]
        wav_win, spec_out = self._gl_fn(window, self.ap.power, self.ap._dft,
                                        self._prev_spec)
        # retrieved spectrum of the frames that are now emitted context
        self._prev_spec = tuple(
            c[:, max(0, n_ctx + n_emit - self.gl_context):n_ctx + n_emit]
            for c in spec_out)
        self._lin_tail = (emit if self._lin_tail is None else
                          jnp.concatenate([self._lin_tail, emit], axis=1)
                          )[:, -self.gl_context:]
        lo, hi = n_ctx * self.hop, (n_ctx + n_emit) * self.hop
        if self._had_tail:
            # a negative start would silently wrap to the array tail and
            # corrupt the seam — the emitted context must cover the
            # crossfade (the pipeline defaults guarantee it; a custom
            # xfade can violate it)
            assert lo >= self.xfade, (
                "crossfade (%d samples) exceeds the emitted context "
                "(%d samples)" % (self.xfade, lo))
            token = (wav_win[:, lo - self.xfade:hi], True)
        else:
            token = (wav_win[:, :hi], False)
        self._had_tail = True
        return token

    def _finish_raw(self, token):
        """Host half: fetch the window's samples, crossfade with the held
        tail; returns PRE-IIR samples. Must be called in dispatch order."""
        wav, had_tail = token
        raw = np.asarray(wav)
        head = None
        if had_tail:
            head, raw = raw[:, :self.xfade], raw[:, self.xfade:]
        assert raw.shape[1] >= self.xfade, (
            "emission shorter than the crossfade: %d < %d"
            % (raw.shape[1], self.xfade))
        out = []
        if head is not None:
            out.append(self._raw_tail * (1.0 - self._ramp)
                       + head * self._ramp)
        # explicit end index rather than the negative-slice idiom: with
        # xfade=0 (crossfade disabled) raw[:, :-0] would emit NOTHING and
        # hold back the whole window
        cut = raw.shape[1] - self.xfade
        out.append(raw[:, :cut])
        self._raw_tail = raw[:, cut:]
        return np.concatenate(out, axis=1)

    def push_async(self, lin_new):
        """Dispatch the vocode of new frames; returns a token for
        finish(), or None when everything was absorbed into the lookahead
        buffer. Device-only — no host sync."""
        frames = (lin_new if self._pending is None
                  else jnp.concatenate([self._pending, lin_new], axis=1))
        if frames.shape[1] <= self.gl_lookahead:
            self._pending = frames
            return None
        if self.gl_lookahead:
            emit = frames[:, :-self.gl_lookahead]
            self._pending = frames[:, -self.gl_lookahead:]
        else:
            emit, self._pending = frames, None
        return self._vocode_async(emit, self._pending)

    def finish(self, token):
        """Complete a push_async; (B, 0) for a None token."""
        if token is None:
            B = 1 if self._pending is None else self._pending.shape[0]
            return np.zeros((B, 0), np.float32)
        return self._iir(self._finish_raw(token))

    def push(self, lin_new):
        """lin_new: (B, n, F) normalized linear frames, contiguous with all
        previous pushes. Returns (B, m) float32 samples (m can be 0)."""
        return self.finish(self.push_async(lin_new))

    def flush(self):
        """Vocode the held-back lookahead + emit the crossfade tail; the
        stream is complete after this. Returns (B, m) or None."""
        outs = []
        if self._pending is not None and self._pending.shape[1] > 0:
            outs.append(self._finish_raw(self._vocode_async(self._pending,
                                                            None)))
            self._pending = None
        if self._raw_tail is not None:
            outs.append(self._raw_tail)
            self._raw_tail = None
        if not outs:
            return None
        return self._iir(np.concatenate(outs, axis=1))


# ---------------------------------------------------------------------------
# converter-window + vocoder emission state for one stream (any batch)
# ---------------------------------------------------------------------------


class StreamEmitter:
    """Post-decode half of a stream: accumulates postnet-input frames,
    runs the windowed converter with receptive-field context, and drives a
    StreamingVocoder. Shared by tts_stream (whole-batch streams) and
    serving.ContinuousBatcher (one emitter per slot).

    feed_async(pin) dispatches the always-valid emission for new frames
    (device work only; overlap host syncs with it), feed_finish(token)
    completes it; finish() emits the held-back converter lookahead and the
    vocoder tail."""

    def __init__(self, params, cfg, ap, spk, *, gl_context=16,
                 gl_lookahead=8, xfade=None):
        self.params = params
        self.cfg = cfg
        self.spk = spk
        self.up = getattr(cfg.converter, "time_upsampling", 1)
        self.ctx_l, self.ctx_r = converter_context(cfg.converter)
        self.vocoder = StreamingVocoder(ap, gl_context=gl_context,
                                        gl_lookahead=gl_lookahead,
                                        xfade=xfade)
        self.mel_hist = None    # (B, M, D) device
        self.M = 0              # postnet frames accumulated
        self.e_m = 0            # postnet frames emitted

    def _conv_emit(self, emit_to_m):
        """Converter on a bucketed window; exact linear frames for mel
        region [e_m, emit_to_m). Window = [ws, M) with ws <= e_m-ctx_l (or
        0 = true sequence start), so every emitted frame has its full
        receptive field inside the window."""
        W = self.M - max(0, self.e_m - self.ctx_l)
        Wb = min(self.M, -(-W // CONV_BUCKET) * CONV_BUCKET)
        ws = self.M - Wb
        window = lax.slice_in_dim(self.mel_hist, ws, self.M, axis=1)
        lin_win = _conv_window_prog(self.params, self.cfg, window, self.spk)
        return lax.slice_in_dim(lin_win, (self.e_m - ws) * self.up,
                                (emit_to_m - ws) * self.up, axis=1)

    def feed_async(self, pin):
        """pin: (B, steps*r, D) new postnet-input frames. Dispatches the
        emission [e_m, M-ctx_r); returns a token for feed_finish (None
        when nothing is emittable yet)."""
        self.mel_hist = (pin if self.mel_hist is None
                         else jnp.concatenate([self.mel_hist, pin], axis=1))
        self.M += pin.shape[1]
        emit_to = self.M - self.ctx_r
        if emit_to <= self.e_m:
            return None
        lin_new = self._conv_emit(emit_to)
        return (emit_to, lin_new, self.vocoder.push_async(lin_new))

    def feed_finish(self, token):
        """Returns (audio (B, m), lin_new or None)."""
        if token is None:
            B = 1 if self.mel_hist is None else self.mel_hist.shape[0]
            return np.zeros((B, 0), np.float32), None
        emit_to, lin_new, tok = token
        audio = self.vocoder.finish(tok)
        self.e_m = emit_to
        return audio, lin_new

    def finish(self):
        """Final emissions: the held-back converter lookahead [e_m, M) and
        the vocoder's own lookahead + crossfade tail. Returns
        (audio (B, m), lin_last or None)."""
        parts, lin_last = [], None
        if self.M > self.e_m:
            lin_last = self._conv_emit(self.M)
            parts.append(self.vocoder.push(lin_last))
            self.e_m = self.M
        tail = self.vocoder.flush()
        if tail is not None:
            parts.append(tail)
        if not parts:
            B = 1 if self.mel_hist is None else self.mel_hist.shape[0]
            return np.zeros((B, 0), np.float32), lin_last
        return np.concatenate(parts, axis=1), lin_last


# ---------------------------------------------------------------------------
# the streaming synthesizer
# ---------------------------------------------------------------------------


def tts_stream(params, cfg, ap, frontend_mod, texts, *, speaker_ids=None,
               p=0.0, max_decoder_steps=200, chunk=None, first_chunk=16,
               gl_context=16, gl_lookahead=8, xfade=None, pad_to=8,
               interpret=None,
               emit_linear=False, emit_alignment=False):
    """Generator: batched text -> incremental audio chunks.

    Yields dicts:
      audio          (B, m) float32 samples (next contiguous piece)
      sample_start   stream offset of audio[:, 0]
      decoded_steps  (B,) per-sample decoded lengths — on the LAST chunk
                     only (None before); trailing frames of shorter
                     samples are the model's post-done output, exactly as
                     in tts_batch before its per-sample trim
      final          True on the last chunk
      linear         (B, n, F) emitted linear frames (emit_linear=True
                     only, for tests)
      alignment      (B, dec_steps, Tk) attention over the whole decode —
                     LAST chunk only, emit_alignment=True (one deferred
                     device fetch; the stream itself never needs it)

    The decoder runs `first_chunk` frames in the first launch (lower
    TTFA), then `chunk` (default ops/fused_decode.DEFAULT_CHUNK) per
    launch, stopping at the reference's done-latch rule
    (deepvoice3.py:469-473) at chunk granularity — identical decode
    results to fused_decode_chunked with matching chunk boundaries."""
    if chunk is None:
        chunk = fd.DEFAULT_CHUNK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    from .synthesis import _prepare_batch

    x, pos, lengths = _prepare_batch(frontend_mod, texts, p, pad_to)
    B = x.shape[0]
    x, pos, lengths = jnp.asarray(x), jnp.asarray(pos), jnp.asarray(lengths)
    spk = (None if speaker_ids is None
           else jnp.asarray(np.asarray(speaker_ids)))

    dcfg = cfg.decoder
    r = dcfg.r
    _, ctx_r = converter_context(cfg.converter)
    min_steps = dcfg.min_decoder_steps
    assert first_chunk * r > ctx_r, (
        "first_chunk too small for the converter lookahead: %d*%d <= %d"
        % (first_chunk, r, ctx_r))

    # Graceful degradation: when the whole batch's fused-decode working
    # set (weights + K/V + ring buffers) exceeds the VMEM budget, split the
    # decode into per-launch sub-batches that fit instead of refusing to
    # stream (decode rows are per-sample independent, so sub-batching is
    # exact). Post-decode stages are batch-agnostic and stay whole-batch.
    g = B
    while g > 1 and fd.vmem_bytes_estimate(
            params["decoder"], dcfg, g, x.shape[1]) > fd.VMEM_BUDGET_BYTES:
        g = (g + 1) // 2
    if fd.vmem_bytes_estimate(params["decoder"], dcfg, g, x.shape[1]) \
            > fd.VMEM_BUDGET_BYTES:
        raise ValueError(
            "fused streaming decode cannot fit even a single sample in "
            "this device's VMEM budget (folded weights + K/V alone exceed "
            "it); use the non-streaming scan path (tts_batch fused=False)")
    if g < B:
        import sys
        print("deepvoice3_pytorch_tpu: streaming decode batch %d exceeds "
              "the VMEM budget; splitting into sub-batches of %d"
              % (B, g), file=sys.stderr)

    # decode schedule: first_chunk, then fixed chunks (2 compiled programs)
    schedule = [min(first_chunk, max_decoder_steps)]
    while sum(schedule) < max_decoder_steps:
        schedule.append(min(chunk, max_decoder_steps - sum(schedule)))
    max_total = sum(schedule)

    arrays, (prev, la, bufs) = _prepare_prog(params, cfg, x, pos, lengths,
                                             spk, max_total=max_total)
    fpe_raw = arrays["w_query"] is not None

    # per-launch groups (usually one covering the whole batch)
    group_slices = [slice(i, min(i + g, B)) for i in range(0, B, g)]

    def _slice_launch_arrays(sl):
        kv = [None if p is None else (p[0][sl], p[1][sl])
              for p in arrays["projected_kv"]]
        mask = None if arrays["mask"] is None else arrays["mask"][sl]
        wq = (None if arrays["w_query"] is None
              else arrays["w_query"][sl])
        sp = (None if arrays["speaker_bias"] is None
              else [b[sl] for b in arrays["speaker_bias"]])
        return kv, mask, wq, sp

    group_arrays = [_slice_launch_arrays(sl) for sl in group_slices]
    group_carry = [(prev[sl], la[sl], tuple(bf[sl] for bf in bufs))
                   for sl in group_slices]

    def _launch_chunk(t0, steps):
        parts = []
        for gi, (kv, mask_g, wq, sp) in enumerate(group_arrays):
            pv, lg, bf = group_carry[gi]
            out_g, group_carry[gi] = _chunk_prog(
                params["decoder"], dcfg, kv, mask_g, wq, sp,
                arrays["fpe_table"], t0, pv, lg, bf,
                steps=steps, fpe_raw=fpe_raw, interpret=interpret)
            parts.append(out_g)
        if len(parts) == 1:
            return parts[0]
        return tuple(jnp.concatenate([p[i] for p in parts], axis=0)
                     for i in range(4))

    emitter = StreamEmitter(params, cfg, ap, spk, gl_context=gl_context,
                            gl_lookahead=gl_lookahead, xfade=xfade)

    align_rows = []        # device (B, steps, Tk) per chunk (opt-in)
    done_rows = []         # host (B, steps) per chunk
    latched = np.zeros((B,), bool)
    dec_steps = 0          # decoder steps decoded so far
    sample_start = 0

    for steps in schedule:
        o, a, d, s = _launch_chunk(jnp.int32(dec_steps), steps)

        # postnet input frames for this chunk, (B, steps*r, D) — the same
        # reshape builder.model_decode applies to the full decode buffers
        if cfg.use_decoder_state_for_postnet_input:
            pin = s.reshape(B, steps * r, -1)
        else:
            pin = o.reshape(B, steps * r, -1)
        if emit_alignment:
            align_rows.append(a)
        dec_steps += steps

        # dispatch the always-valid emission [e_m, M-ctx_r) BEFORE reading
        # the done flags: the (B, steps) device->host fetch (a full tunnel
        # round trip on remote harnesses) then overlaps the converter + GL
        # device time instead of serializing ahead of it
        token = emitter.feed_async(pin)

        # done latch, host side (the (B, steps) fetch IS the stream control)
        d_host = np.asarray(d)                          # (B, steps)
        gstep = dec_steps - steps + np.arange(1, steps + 1)
        done_rows.append((d_host > 0.5) & (gstep[None, :] > min_steps))
        latched |= done_rows[-1].any(axis=1)
        stop = bool(latched.all()) or dec_steps >= max_total

        audio, lin_new = emitter.feed_finish(token)
        out = {"audio": audio, "sample_start": sample_start,
               "final": False, "decoded_steps": None}
        if emit_linear:
            out["linear"] = (np.asarray(lin_new) if lin_new is not None
                             else np.zeros((B, 0, 1), np.float32))
        sample_start += audio.shape[1]
        if not stop:
            if token is not None:
                yield out
            continue

        # final emissions: the held-back converter lookahead + vocoder tail
        tail, lin_last = emitter.finish()
        out["audio"] = np.concatenate([out["audio"], tail], axis=1)
        if emit_linear and lin_last is not None:
            lin_prev = (out["linear"] if out["linear"].shape[1]
                        else np.zeros((B, 0, lin_last.shape[2]), np.float32))
            out["linear"] = np.concatenate(
                [lin_prev, np.asarray(lin_last)], axis=1)
        # per-sample decoded lengths, decode_while's rule: frames kept
        # through the first done-latch frame (inclusive)
        done_all = np.concatenate(done_rows, axis=1)[:, :dec_steps]
        first = np.where(latched, done_all.argmax(axis=1) + 1, dec_steps)
        out["decoded_steps"] = first.astype(np.int32)
        out["final"] = True
        if emit_alignment:
            out["alignment"] = np.asarray(
                jnp.concatenate(align_rows, axis=1))
        yield out
        return
