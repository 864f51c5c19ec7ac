# coding: utf-8
"""Continuous batching for streaming TTS serving.

One utterance per request wastes the chip: the fused decode kernel costs
nearly the same for batch 8 as for batch 1 (per-step work is tiny; the
sequential grid dominates). ContinuousBatcher keeps a fixed-size slot
batch decoding continuously and admits NEW utterances into free slots at
chunk boundaries — the TTS analogue of continuous batching in LLM serving.

What makes mid-stream admission exact:

  * the decode kernel's carry (fed-back frame, ring buffers, monotonic
    last_attended) is per-slot — admission resets one batch row;
  * attention K/V, the padding mask, per-sample position rates and
    speaker biases are per-slot rows — admission scatters the new
    utterance's values into row `slot`;
  * the query-position encoding is per-slot via the kernel's
    fpe_per_sample mode (ops/fused_decode.py): each slot gathers the
    rows of its OWN local positions (raw angles for the deepvoice3
    family, finished encodings for nyanko), so a slot admitted at
    global chunk 7 decodes exactly like a fresh stream at chunk 0
    (equality pinned by tests/test_serving.py).

Downstream of the decoder the post-decode stages are GROUPED ACROSS
SLOTS: every active slot advances by the same decode chunk, so slots at
the same emission phase share identical converter-window and
Griffin-Lim-window shapes. Each step() groups active slots by that
static shape signature and runs ONE fused converter+vocoder program per
group — in steady state all slots share one signature, so a step is TWO
device programs total regardless of slot count: (1) decode kernel with
the history roll and local-position advance fused in, (2) converter +
windowed GL + done-flag packing fused together, followed by a single
blocking fetch. The step is dispatch-bound, not compute-bound: each
program launch costs ~12 ms of serial host time and a blocking fetch
~28 ms through the dev tunnel (tools/cb_gap_probe.py), so launch COUNT
is the budget. Round 3 ran 2 + 2*n_slots batch-1 launches (aggregate
RTF 8.5x), round 4 grouped them into 4-5 full-width launches (34-48x),
and the fused two-launch step is what remains.

Every grouped program runs at the FULL slot-batch width S and restricts
its state updates with a runtime (S,) membership mask — group
membership is DATA, never a shape. The first design gathered each
group's rows (shapes specialized on group size), which compiled a fresh
program for every (signature, group-size) pair the staggered arrivals
produced — measured as a compile storm: 8 staggered requests saw
~16 s TTFA each while the chip sat idle waiting on remote compiles
(BENCH extras history, round 4). With mask-static programs a slot
admitted at any phase replays the same signature SEQUENCE the warmup
request already compiled, so admission never waits on a compile. The
wasted compute on non-member rows is the steady state anyway (all slots
active, one signature).

Texts are admitted at BUCKETED lengths: the slot arrays' text dimension
starts at `text_pad` tokens and grows (one recompile per new bucket) up
to the model's max_positions — a 100-token sentence is a bucket growth,
not an error (reference synthesizes any length up to max_positions,
synthesis.py:42-73, hparams.py:62).

The reference has no serving layer at all (its synthesis.py writes files
after full synthesis, reference synthesis.py:42-73).
"""

import queue
import threading
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .ops import core, fused_decode as fd
from . import streaming


@jax.jit
def _restore_rows(cur, snap, b):
    """Rewind slot `b`'s emission-state rows to the step-start snapshot
    (history, GL tails, retrieved spectrum, lookahead). The pipelined
    done latch lands one chunk late, so a retiring slot has one extra
    chunk merged into its rows; snapshots are free (jax arrays are
    immutable — the snapshot is a reference), and the restore makes the
    retire flush bit-identical to an unpipelined stream's. The slot
    index is a traced scalar: one compile covers every slot."""
    return tuple(c.at[b].set(s[b]) for c, s in zip(cur, snap))


@jax.jit
def _admit_scatter(arrays, carry, ctx_scale, spk, local, b, kv_row,
                   mask_row, wq_row, sp_row, scale_val, spk_val):
    """ONE program for every per-slot admission write: scatter the new
    utterance's K/V, mask, rates and biases into row `b` of the slot
    arrays and zero the slot's decode carry. The slot index is DATA (a
    traced scalar), not a Python constant — eager `.at[b].set` calls
    specialized a separate program per slot index, which made every
    first admission into a fresh slot stall ~0.4 s on remote compiles
    (measured: 8 staggered requests all got first audio at the same
    +3 s mark while slots 1-7 compiled their scatter sets)."""
    kv, mask, wq, sp = arrays
    kv = [None if p is None else
          (p[0].at[b].set(pr[0][0]), p[1].at[b].set(pr[1][0]))
          for p, pr in zip(kv, kv_row)]
    mask = mask.at[b].set(mask_row[0])
    if wq is not None:
        wq = wq.at[b].set(wq_row[0])
    if sp is not None:
        sp = [a.at[b].set(r0[0]) for a, r0 in zip(sp, sp_row)]
    prev, la, bufs = carry
    prev = prev.at[b].set(jnp.zeros_like(prev[0]))
    la = la.at[b].set(jnp.zeros_like(la[0]))
    bufs = tuple(a.at[b].set(jnp.zeros_like(a[0])) for a in bufs)
    ctx_scale = ctx_scale.at[b].set(scale_val)
    if spk is not None:
        spk = spk.at[b].set(spk_val)
    local = local.at[b].set(0)
    return [kv, mask, wq, sp], (prev, la, bufs), ctx_scale, spk, local


@partial(jax.jit, static_argnames=("cfg",))
def _admit_prog(params, cfg, x, pos, length, spk):
    """Per-request launch-invariant state (batch 1, family-generic):
    projected attention K/V, padding mask, query position rate (raw-angle
    families), speaker biases."""
    fam = cfg.family
    speaker_embed = None
    if spk is not None:
        speaker_embed = core.embedding_apply(params["embed_speakers"], spk)
    encoder_out = fam.encoder_apply(params["encoder"], cfg.encoder, x,
                                    speaker_embed=speaker_embed)
    Tk = encoder_out[0].shape[1]
    mask = core.get_mask_from_lengths(length, Tk)
    fi = fam.fused_decode_inputs(params["decoder"], cfg.decoder, encoder_out,
                                 pos, 1, speaker_embed=speaker_embed)
    return fi["projected_kv"], mask, fi["w_query"], fi["speaker_bias"]


@partial(jax.jit, static_argnames=("cfg", "steps", "fpe_raw", "interpret",
                                   "use_state"))
def _slot_chunk_prog(params, cfg, projected_kv, mask, wq, speaker_bias,
                     ctx_scale, fpe_table, local_steps, prev, la, bufs,
                     hist, *, steps, fpe_raw, interpret, use_state):
    """One `steps`-frame launch over the slot batch, every slot at its own
    local position: gather each slot's position rows from the table
    (clamped like the scan path's jnp.take) and run the kernel in
    fpe_per_sample mode. Raw angles (deepvoice3 family) get the per-slot
    rate applied in-kernel; nyanko's table stores finished encodings and
    the gathered rows are used directly. ctx_scale keeps each slot's
    attention context scale frozen at its admission text bucket (the
    reference scales by sqrt(padded memory length), so a text-dimension
    growth must not change an active slot's decode).

    The post-decode history roll and the per-slot local-step counters are
    FUSED into this program: each extra program launch costs ~12 ms of
    serial host time through the dev tunnel (tools/cb_gap_probe.py), so
    the step keeps its launch count minimal — this program returns the
    done flags, the rolled converter-history window, the advanced local
    counters and the decode carry in one dispatch, and the host never
    uploads the (S,) local positions again."""
    prep = fd._Prepared(params, cfg, projected_kv, mask, w_query=wq,
                        speaker_bias=speaker_bias, fpe_raw=fpe_raw,
                        fpe_per_sample=True, ctx_scale=ctx_scale)
    pos = local_steps[:, None] + jnp.arange(1, steps + 1,
                                            dtype=jnp.int32)[None, :]
    pos = jnp.clip(pos, 0, fpe_table.shape[0] - 1)
    fpe_rows = jnp.take(fpe_table, pos, axis=0)        # (S, steps, C)
    (o, a, d, s), carry = prep.launch(fpe_rows, prev, la, bufs, steps,
                                      interpret)
    pin = s if use_state else o
    S, H, D = hist.shape
    pin = pin.reshape(S, -1, D)                        # (S, steps*r, D)
    n = pin.shape[1]
    if n >= H:
        hist = pin[:, -H:]
    else:
        hist = jnp.concatenate([hist[:, n:], pin], axis=1)
    # retired-but-unreused slots keep counting garbage; cap far above any
    # real decode so the int32 can never wrap (admission resets to 0)
    local_steps = jnp.minimum(local_steps + steps, 1 << 30)
    return d, hist, local_steps, carry


class _Slot:
    __slots__ = ("out_q", "local_steps", "done_rows", "latched", "emitted",
                 "n_total", "prev_phase", "M", "e_m", "n_ctx", "n_pend")

    def __init__(self, out_q):
        self.out_q = out_q
        self.local_steps = 0
        self.done_rows = []
        self.latched = False
        self.emitted = 0          # samples delivered so far
        self.n_total = None       # decoded-length sample cap once latched
        self.prev_phase = None    # (M, e_m, n_ctx, n_pend) before the
        # latest dispatch — the retire path rewinds to it when the
        # pipelined done latch lands one chunk late
        # post-decode emission phase (mirrors streaming.StreamEmitter +
        # StreamingVocoder, but the state arrays are slot-batched)
        self.M = 0                # postnet-input frames accumulated
        self.e_m = 0              # postnet-input frames emitted
        self.n_ctx = 0            # valid GL context frames (<= gl_context)
        self.n_pend = 0           # lookahead lin frames held back


class BacklogFull(RuntimeError):
    """Admission control: the waiting queue is at max_backlog. Callers
    should shed the request (serve.py answers HTTP 503 + Retry-After)
    rather than queue unboundedly — a TTS stream admitted minutes late is
    worthless to the listener AND still costs chip time."""


class _EmitEngine:
    """Slot-batched post-decode pipeline: converter windows + phase-
    coherent windowed Griffin-Lim, grouped across slots.

    Device state (S = n_slots):
      hist     (S, H, D)   last H postnet-input frames per slot
      lin_tail (S, GC, F)  emitted GL context frames, right-aligned
      prev_re/prev_im (S, GC, F) retrieved spectrum of lin_tail
      pend     (S, GLA, F) held-back lookahead frames, right-aligned
    Host state: raw_tail (S, xfade) pre-IIR crossfade tails, zi (S, 1)
    inverse-preemphasis IIR states.

    The per-window math is IDENTICAL to streaming.StreamEmitter +
    StreamingVocoder (same window compositions, same pinned-context
    anchored-SPSI retrieval) — equality vs fresh tts_stream is pinned by
    tests/test_serving.py. Only the batching differs: each program
    computes ALL S slot rows and merges results into the state arrays
    under a (S,) membership mask, so program identity depends only on
    the window signature (see the module docstring: group size as a
    shape caused a compile storm)."""

    def __init__(self, params, cfg, ap, n_slots, chunk_frames, *,
                 gl_context, gl_lookahead, xfade, multispeaker):
        self.params, self.cfg, self.ap = params, cfg, ap
        self.S = n_slots
        self.cr = chunk_frames                      # postnet frames / step
        self.up = getattr(cfg.converter, "time_upsampling", 1)
        self.ctx_l, self.ctx_r = streaming.converter_context(cfg.converter)
        self.GC = int(gl_context)
        self.GLA = int(gl_lookahead)
        self.hop = ap.hop_size
        self.xfade = self.hop if xfade is None else int(xfade)
        assert self.xfade <= self.GC * self.hop
        self.D = cfg.converter.in_dim
        self.F = ap.fft_size // 2 + 1
        self.multispeaker = multispeaker
        CB = streaming.CONV_BUCKET
        self.H = -(-(self.cr + self.ctx_l + self.ctx_r) // CB) * CB
        f32 = jnp.float32
        S = n_slots
        self.hist = jnp.zeros((S, self.H, self.D), f32)
        self.lin_tail = jnp.zeros((S, self.GC, self.F), f32)
        self.prev_re = jnp.zeros((S, self.GC, self.F), f32)
        self.prev_im = jnp.zeros((S, self.GC, self.F), f32)
        self.pend = jnp.zeros((S, max(self.GLA, 1), self.F), f32)
        self.spk = jnp.zeros((S,), jnp.int32) if multispeaker else None
        self.raw_tail = np.zeros((S, self.xfade), np.float32)
        self.zi = np.zeros((S, 1), np.float32)
        # step-level raw accumulator: every in-step GL program right-pads
        # its raw samples to m_max and merges them under the membership
        # mask, so a step fetches ONE (S, m_max) array no matter how many
        # phase groups it dispatched (each per-group fetch through the
        # dev tunnel costs a full round trip AND S*m bytes at full slot
        # width; the accumulator restores sync-stream fetch cost).
        # m_max covers any in-step emission: cr postnet frames upsampled,
        # plus the crossfade head. Larger windows (retire flush) return
        # raw directly — decided statically per program.
        self.m_max = self.cr * self.up * self.hop + self.xfade
        self.raw_buf = jnp.zeros((S, self.m_max), f32)
        self._mask_cache = {}
        self.ramp = np.linspace(0.0, 1.0, self.xfade, endpoint=False,
                                dtype=np.float32)
        # jitted window vocoder shared with the streaming pipeline
        # (same cache -> same programs as fresh streams)
        if ap not in streaming._GL_FN_CACHE:
            streaming._GL_FN_CACHE[ap] = \
                streaming.StreamingVocoder._build_gl(ap)
        self._voc = streaming._GL_FN_CACHE[ap]
        self._progs = {}

    # -- slot lifecycle ---------------------------------------------------

    def reset_slot(self, b):
        """Host-side resets at admission (the speaker-id scatter rides the
        single jitted _admit_scatter program). Device rows need no reset:
        every read is bounded by the slot's own (M, n_ctx, n_pend)
        counters, so a previous occupant's rows are never touched."""
        self.raw_tail[b] = 0.0
        self.zi[b] = 0.0

    # -- programs (compiled once per static shape signature) ---------------

    def _prog(self, key, builder):
        fn = self._progs.get(key)
        if fn is None:
            fn = self._progs[key] = builder()
        return fn

    def conv_sig(self, slot):
        """Static converter-window signature for this slot's pending
        emission [e_m, emit_to): (window length, emit offsets) — the
        exact formula of streaming.StreamEmitter._conv_emit."""
        M, e_m = slot.M, slot.e_m
        emit_to = M - self.ctx_r
        CB = streaming.CONV_BUCKET
        W = M - max(0, e_m - self.ctx_l)
        Wb = min(M, -(-W // CB) * CB)
        ws = M - Wb
        return (Wb, e_m - ws, emit_to - ws)

    def _conv_body(self, conv_sig):
        """Full-width converter as a PURE function to trace inside the
        vocoder programs: ALL S slot rows through the group's window
        slice (rows outside the group compute garbage that the masked GL
        stage never commits). Fused into the GL/absorb programs rather
        than launched on its own — each separate launch costs ~12 ms of
        serial host dispatch through the dev tunnel (cb_gap_probe), while
        recomputing the full-width converter per phase group costs only
        device FLOPs the step has to spare."""
        from .builder import model_postnet

        Wb, o0, o1 = conv_sig
        up, H = self.up, self.H

        def body(params, cfg, hist, spk):
            window = hist[:, H - Wb:]
            lin = model_postnet(params, cfg, window, speaker_ids=spk)
            return lax.slice_in_dim(lin, o0 * up, o1 * up, axis=1)
        return body

    def _absorb_prog(self, n_pend, n_new, conv=None):
        """Emission absorbed into the lookahead (no GL): with `conv`, the
        converter window is computed in the same program."""
        GLA = self.GLA

        def build():
            conv_body = None if conv is None else self._conv_body(conv)

            def absorb(pend, mask, lin_new):
                if n_pend:
                    frames = jnp.concatenate(
                        [pend[:, GLA - n_pend:], lin_new], axis=1)
                else:
                    frames = lin_new
                pad = GLA - frames.shape[1]
                if pad:
                    z = jnp.zeros((frames.shape[0], pad, self.F),
                                  jnp.float32)
                    frames = jnp.concatenate([z, frames], axis=1)
                return jnp.where(mask[:, None, None], frames, pend)

            if conv is None:
                return jax.jit(absorb)

            @partial(jax.jit, static_argnames=("cfg",))
            def prog(params, cfg, pend, mask, hist, spk):
                return absorb(pend, mask, conv_body(params, cfg, hist, spk))
            return prog
        return self._prog(("absorb", n_pend, n_new, conv), build)

    def _gl_prog(self, sig, row=False, conv=None):
        """(n_ctx, n_pend, n_new, keep_lookahead) -> jitted program:
        vocode ONE batched window over ALL S slot rows, merge the updated
        tails under the (S,) membership mask, return the raw
        (pre-crossfade, pre-IIR) samples for every row (only member rows
        are meaningful).

        row=True (the retire path, always G=1): return ONLY the member
        slot's raw samples as an (m,) vector — the mask-selected row-sum —
        instead of the full (S, m) array or an accumulator merge. Retire
        emissions are fetched immediately and can be wide (the lookahead
        flush), so shrinking the transfer S-fold is the whole point
        (measured: the retire phase was the largest term in the
        continuous-batching step budget, ~40%).

        conv=(Wb, o0, o1): the group's converter window is computed IN
        this program from the rolled history instead of as a separate
        launch (dispatch-bound step: ~12 ms serial host cost per launch).
        Every conv-fused program also takes the chunk's done flags and
        returns them concatenated with the merged raw accumulator, so the
        step's single blocking fetch carries both — the host uses the
        LAST buffered group's packed output and discards the others.
        Packing unconditionally keeps program identity = signature alone:
        a pack-only-when-last variant made the ramp's group count leak
        into program keys, and staggered arrivals then compiled fresh
        pack=False twins of every warmup signature (measured: two ~2 s
        compile stalls mid-ramp, aggregate RTF 15x vs 54x)."""
        n_ctx, n_pend, n_new, keep_la = sig
        GC, GLA, F = self.GC, self.GLA, self.F
        hop, xfade = self.hop, self.xfade
        voc = self._voc
        frames_n = n_pend + n_new
        emit_n = frames_n - (GLA if keep_la else 0)
        assert emit_n > 0, sig
        n_ctx2 = min(GC, n_ctx + emit_n)
        pad = GC - n_ctx2
        m_g = self.raw_width(sig)
        buffered = m_g <= self.m_max
        m_max = self.m_max

        def build():
            conv_body = None if conv is None else self._conv_body(conv)

            def gl_body(raw_buf, lin_tail, prev_re, prev_im, pend, mask,
                        lin_new, power, mats):
                parts = []
                if n_pend:
                    parts.append(pend[:, GLA - n_pend:])
                if n_new:
                    parts.append(lin_new)
                frames = (parts[0] if len(parts) == 1
                          else jnp.concatenate(parts, axis=1))
                if keep_la and GLA:
                    emit = frames[:, :emit_n]
                    new_pend = frames[:, emit_n:]
                else:
                    emit, new_pend = frames, None
                wparts, tail_g = [], None
                if n_ctx:
                    tail_g = lin_tail[:, GC - n_ctx:]
                    wparts.append(tail_g)
                wparts.append(emit)
                if new_pend is not None:
                    wparts.append(new_pend)
                window = (wparts[0] if len(wparts) == 1
                          else jnp.concatenate(wparts, axis=1))
                prev = None
                if n_ctx:
                    prev = (prev_re[:, GC - n_ctx:],
                            prev_im[:, GC - n_ctx:])
                wav_win, spec_out = voc(window, power, mats, prev)

                S = emit.shape[0]
                m3 = mask[:, None, None]

                def right_align(a):
                    if pad:
                        z = jnp.zeros((S, pad, F), jnp.float32)
                        return jnp.concatenate([z, a], axis=1)
                    return a

                tail_seq = (emit if tail_g is None
                            else jnp.concatenate([tail_g, emit], axis=1))
                tail_seq = tail_seq[:, -n_ctx2:]
                lin_tail = jnp.where(m3, right_align(tail_seq), lin_tail)
                lo_s = n_ctx + emit_n - n_ctx2
                prev_re = jnp.where(m3, right_align(
                    spec_out[0][:, lo_s:n_ctx + emit_n]), prev_re)
                prev_im = jnp.where(m3, right_align(
                    spec_out[1][:, lo_s:n_ctx + emit_n]), prev_im)
                if GLA:
                    if new_pend is not None:
                        pend = jnp.where(m3, new_pend, pend)
                    else:
                        pend = jnp.where(m3, 0.0, pend)
                lo, hi = n_ctx * hop, (n_ctx + emit_n) * hop
                if n_ctx:               # a previous emission exists
                    raw = wav_win[:, lo - xfade:hi]
                else:
                    raw = wav_win[:, :hi]
                if row:
                    # single-slot emission: ship only the member row
                    # (where, not multiply: non-member rows can be junk)
                    raw = jnp.where(mask[:, None], raw, 0.0).sum(0)
                elif buffered:
                    # right-align into the step accumulator (host slices
                    # each slot's trailing raw_width(sig) samples back out)
                    if raw.shape[1] < m_max:
                        z = jnp.zeros((S, m_max - raw.shape[1]),
                                      jnp.float32)
                        raw = jnp.concatenate([z, raw], axis=1)
                    raw = jnp.where(mask[:, None], raw, raw_buf)
                return raw, lin_tail, prev_re, prev_im, pend

            if conv is None:
                return jax.jit(gl_body)

            @partial(jax.jit, static_argnames=("cfg",))
            def prog(params, cfg, raw_buf, lin_tail, prev_re, prev_im,
                     pend, mask, hist, spk, power, mats, d):
                lin_new = conv_body(params, cfg, hist, spk)
                out = gl_body(raw_buf, lin_tail, prev_re, prev_im, pend,
                              mask, lin_new, power, mats)
                if row:
                    return out
                raw = out[0]
                packed = jnp.concatenate(
                    [d.reshape(raw.shape[0], -1).astype(jnp.float32), raw],
                    axis=1)
                return (raw, packed) + out[1:]
            return prog
        return self._prog(("gl", row, conv) + sig, build)

    # -- dispatch / completion ---------------------------------------------

    def _mask(self, idx_np):
        """Device membership mask for a slot-index set, memoized: a step
        re-dispatches the same groups every chunk, and each uncached mask
        is a host->device transfer on the step path. The mask is
        order-invariant, so the key is the SORTED index set — bounding the
        cache at 2^S distinct subsets instead of one entry per index
        ordering ever seen (long-lived engines with churning admissions
        would otherwise leak device arrays)."""
        key = np.sort(idx_np).tobytes()
        m = self._mask_cache.get(key)
        if m is None:
            if len(self._mask_cache) >= 4096:   # hard bound for big S
                self._mask_cache.clear()
            h = np.zeros((self.S,), bool)
            h[idx_np] = True
            m = self._mask_cache[key] = jnp.asarray(h)
        return m

    def raw_width(self, gl_sig):
        """Samples this GL signature emits (pre-crossfade raw width)."""
        n_ctx, n_pend, n_new, keep_la = gl_sig
        emit_n = n_pend + n_new - (self.GLA if keep_la else 0)
        return emit_n * self.hop + (self.xfade if n_ctx else 0)

    def dispatch_gl(self, gl_sig, idx_np, lin_new=None, row=False,
                    conv=None, d=None):
        """ONE launch for a group sharing `gl_sig` (full slot width;
        `idx_np` only builds the membership mask); chains the
        slot-batched state arrays. With `conv` the group's converter
        window is computed inside the same program (in-step emissions
        pass conv instead of lin_new); `d` (only with conv) makes this
        launch additionally return the chunk's done flags packed with
        the merged raw accumulator — the step's single fetch payload.

        Returns (emitted, packed): emitted is None (absorbed into the
        lookahead), the string "buf" (raw merged into the step
        accumulator self.raw_buf — the normal in-step case), or the
        device raw samples directly: the member slot's (m,) row when
        row=True (the retire path), else the full-width array (in-step
        emissions wider than m_max — shouldn't happen by construction).
        packed is the done+raw device array when `d` was given and the
        emission merged into the accumulator, else None."""
        n_ctx, n_pend, n_new, keep_la = gl_sig
        frames_n = n_pend + n_new
        mask = self._mask(idx_np)
        if keep_la and frames_n <= self.GLA:       # absorb, no GL
            prog = self._absorb_prog(n_pend, n_new, conv)
            if conv is None:
                self.pend = prog(self.pend, mask, lin_new)
            else:
                self.pend = prog(self.params, self.cfg, self.pend, mask,
                                 self.hist, self.spk)
            return None, None
        assert d is None or (conv is not None and not row)
        prog = self._gl_prog(gl_sig, row, conv)
        if conv is None:
            out = prog(self.raw_buf, self.lin_tail, self.prev_re,
                       self.prev_im, self.pend, mask, lin_new,
                       self.ap.power, self.ap._dft)
        else:
            out = prog(self.params, self.cfg, self.raw_buf, self.lin_tail,
                       self.prev_re, self.prev_im, self.pend, mask,
                       self.hist, self.spk, self.ap.power, self.ap._dft, d)
        if conv is not None and not row:     # packed done+raw variant
            raw = out[0]
            packed = out[1] if d is not None else None
            self.lin_tail, self.prev_re, self.prev_im, self.pend = out[2:]
        else:
            raw, packed = out[0], None
            self.lin_tail, self.prev_re, self.prev_im, self.pend = out[1:]
        if not row and self.raw_width(gl_sig) <= self.m_max:
            self.raw_buf = raw
            return "buf", packed
        return raw, packed

    def complete_group(self, idx_np, raw_dev, had_tail):
        """Fetch one group's device raw and run the host half."""
        return self.complete_rows(idx_np, np.asarray(raw_dev)[idx_np],
                                  had_tail)

    def fetch_packed(self, raws):
        """Fetch several (m_i,) device vectors in ONE host transfer:
        concatenate on device (a tiny jitted program memoized per width
        tuple), fetch once, split on host. Returns the list of host
        rows in order."""
        if not raws:
            return []
        if len(raws) == 1:
            return [np.asarray(raws[0])]
        widths = tuple(int(r.shape[0]) for r in raws)

        def build():
            return jax.jit(lambda *rs: jnp.concatenate(rs))
        packed = np.asarray(self._prog(("pack",) + widths, build)(*raws))
        out, o = [], 0
        for w in widths:
            out.append(packed[o:o + w])
            o += w
        return out

    def complete_rows(self, idx_np, raw, had_tail):
        """Host half for one group's already-fetched (G, m) raw samples:
        crossfade with the held tails, inverse-preemphasis IIR with
        carried state. Returns (G, m') float32 ready-to-play samples
        (callers apply per-slot trims)."""
        from scipy.signal import lfilter

        if had_tail:
            head, rest = raw[:, :self.xfade], raw[:, self.xfade:]
            assert rest.shape[1] >= self.xfade, (rest.shape, self.xfade)
            blend = (self.raw_tail[idx_np] * (1.0 - self.ramp)
                     + head * self.ramp)
            cut = rest.shape[1] - self.xfade
            out = np.concatenate([blend, rest[:, :cut]], axis=1)
            self.raw_tail[idx_np] = rest[:, cut:]
        else:
            assert raw.shape[1] >= self.xfade, (raw.shape, self.xfade)
            cut = raw.shape[1] - self.xfade
            out = raw[:, :cut]
            self.raw_tail[idx_np] = raw[:, cut:]
        coef = self.ap.preemphasis_coef
        zi = self.zi[idx_np]
        y, zi2 = lfilter([1.0], [1.0, -coef], out, axis=-1, zi=zi)
        self.zi[idx_np] = zi2
        return y.astype(np.float32)

    def flush_tail(self, b):
        """Emit slot b's held crossfade tail through the IIR (the final
        samples of a retiring stream)."""
        out = self.raw_tail[b:b + 1].copy()   # view! copy before the reset
        self.raw_tail[b] = 0.0
        from scipy.signal import lfilter

        coef = self.ap.preemphasis_coef
        y, zi2 = lfilter([1.0], [1.0, -coef], out, axis=-1,
                         zi=self.zi[b:b + 1])
        self.zi[b:b + 1] = zi2
        return y.astype(np.float32)


class ContinuousBatcher:
    """Fixed-slot continuous-batching streaming synthesizer.

    submit(text) returns a queue delivering ("audio", (m,) float32)
    items followed by ("end", decoded_steps). step() advances every
    active slot by one decode chunk and admits pending requests; run it
    from a worker loop (serve.py --slots) or call it directly.

    Supports both model families (deepvoice3's raw-angle position mode
    and nyanko's finished-encoding mode) and any text length up to the
    model's max_positions (bucketed slot arrays that grow on demand)."""

    def __init__(self, params, cfg, ap, frontend_mod, *, n_slots=4,
                 text_pad=64, chunk=16, max_decoder_steps=200,
                 gl_context=16, gl_lookahead=8, xfade=None, interpret=None,
                 max_backlog=None):
        dcfg = cfg.decoder
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.params, self.cfg, self.ap = params, cfg, ap
        self.frontend = frontend_mod
        self.n_slots = n_slots
        # text_pad = starting text bucket AND growth granularity; the
        # hard cap is the model's position table
        self.text_bucket = max(8, int(text_pad))
        self.text_cap = dcfg.max_positions - 1
        self.max_decoder_steps = max_decoder_steps
        # default cap: 8 waiting requests per slot — at that depth a new
        # request's first audio is already ~a full utterance away
        self.max_backlog = 8 * n_slots if max_backlog is None else max_backlog
        self.interpret = interpret
        self.r = dcfg.r
        self.min_steps = dcfg.min_decoder_steps
        _, ctx_r = streaming.converter_context(cfg.converter)
        if chunk * self.r <= ctx_r:
            # the converter lookahead must fit inside one chunk's frames;
            # bump instead of failing (nyanko's non-causal highway stack
            # has a deep receptive field at r=1)
            chunk = ctx_r // self.r + 1
        self.chunk = chunk

        # position-row mode: the deepvoice3 family stores raw angles in
        # its query-position table (per-slot rates applied in-kernel);
        # nyanko stores finished encodings — both gather per-slot local
        # positions (fused_decode fpe_per_sample)
        self.fpe_raw = not hasattr(dcfg, "audio_encoder")
        self.fpe_table = params["decoder"]["embed_query_positions"]["w"]
        self.multispeaker = "embed_speakers" in params

        self.emit = _EmitEngine(params, cfg, ap, n_slots, chunk * self.r,
                                gl_context=gl_context,
                                gl_lookahead=gl_lookahead, xfade=xfade,
                                multispeaker=self.multispeaker)

        self._lock = threading.Lock()
        self._admission_lock = threading.Lock()
        self._waiting = queue.Queue()
        self._slots = [None] * n_slots
        self._tk = 0                 # current text bucket (slot arrays)
        self._arrays = None          # slot-batched kv/mask/wq/sp
        self._carry = None           # (prev, la, bufs)
        # per-slot attention context scale, frozen at admission
        self._ctx_scale = jnp.ones((n_slots,), jnp.float32)
        # per-slot local decode positions, device-resident (reset by the
        # admission scatter, advanced inside the fused decode program)
        self._local = jnp.zeros((n_slots,), jnp.int32)
        # cumulative per-phase wall time inside step(), for attributing
        # the serving-vs-synchronized gap (read via timing())
        self._phase_s = {"admit": 0.0, "decode_dispatch": 0.0,
                         "emit_dispatch": 0.0, "done_fetch": 0.0,
                         "complete": 0.0, "retire": 0.0}
        self._steps_run = 0
        # software pipeline (depth 1): the in-flight step awaiting its
        # device->host harvest, and the step-start emission-state
        # snapshot the retire path rewinds to
        self._pending = None
        self._emit_snap = None
        self._last_retired = 0
        # optional per-step log for gap attribution (tools/cb_gap_probe.py):
        # (wall_s, n_active, n_admitted, n_conv_groups, n_gl_launches,
        #  n_retired) per step() when step_log is a list
        self.step_log = None
        self._last_emit_counts = (0, 0)

    def timing(self):
        """Cumulative host wall-clock per step() phase since construction:
        {phase: total_ms}, plus n_steps. decode/emit dispatch are async
        program launches; done_fetch and complete carry the two per-step
        device syncs (decode flags, raw-sample accumulator)."""
        with self._lock:   # step() mutates _phase_s under the same lock;
            # snapshotting under it keeps the per-phase totals consistent
            # with n_steps when stats() reads from the request thread.
            out = {k: round(v * 1e3, 1) for k, v in self._phase_s.items()}
            out["n_steps"] = self._steps_run
        return out

    # -- request side -------------------------------------------------------

    def submit(self, text, speaker_id=None, p=0.0):
        """Thread-safe: enqueue a request; returns the delivery queue.

        Queue items: ("audio", (m,) float32), then ("end", decoded_steps);
        ("error", exception) if the engine failed the request."""
        seq = np.asarray(self.frontend.text_to_sequence(text, p=p), np.int32)
        if len(seq) > self.text_cap:
            raise ValueError(
                "text of %d tokens exceeds the model's max_positions-1=%d"
                % (len(seq), self.text_cap))
        # speaker-ness must be uniform across the slot batch: the slot
        # arrays are allocated once, with or without speaker-bias rows
        if self.multispeaker and speaker_id is None:
            raise ValueError("multi-speaker model: speaker_id is required")
        if not self.multispeaker and speaker_id is not None:
            raise ValueError("single-speaker model: speaker_id must be None")
        out_q = queue.Queue()
        # admission is check+put under its own lock so concurrent submits
        # from ThreadingHTTPServer threads cannot race past max_backlog
        # (the engine lock is NOT used here: step() holds it for a whole
        # decode chunk and submit must stay fast)
        with self._admission_lock:
            if self._waiting.qsize() >= self.max_backlog:
                raise BacklogFull(
                    "waiting queue at max_backlog=%d; shed this request"
                    % self.max_backlog)
            self._waiting.put((seq, speaker_id, out_q))
        return out_q

    def waiting(self):
        """Waiting-queue depth (what max_backlog admission compares to)."""
        return self._waiting.qsize()

    def active_slots(self):
        with self._lock:
            return sum(s is not None for s in self._slots)

    def pending(self):
        return self.active_slots() + self._waiting.qsize()

    # -- engine side ----------------------------------------------------

    def _bucket(self, n):
        b = self.text_bucket
        return min(-(-max(n, 1) // b) * b, max(self.text_cap, b))

    def _init_slot_arrays(self, kv_row, mask_row, wq_row, sp_row):
        """Allocate the slot-batched arrays from the first admission's
        row shapes (zeros elsewhere; inactive slots decode garbage that is
        never read)."""
        S = self.n_slots
        # keep the per-layer structure: non-attention layers are None
        kv = [None if p is None else
              (jnp.zeros((S,) + p[0].shape[1:], p[0].dtype),
               jnp.zeros((S,) + p[1].shape[1:], p[1].dtype))
              for p in kv_row]
        mask = jnp.ones((S,) + mask_row.shape[1:], mask_row.dtype)
        wq = jnp.ones((S,), jnp.float32) if wq_row is not None else None
        sp = None if sp_row is None else [
            jnp.zeros((S,) + b.shape[1:], b.dtype) for b in sp_row]
        self._arrays = [kv, mask, wq, sp]
        prep = fd._Prepared(self.params["decoder"], self.cfg.decoder,
                            kv, mask, w_query=wq, speaker_bias=sp,
                            fpe_raw=self.fpe_raw, fpe_per_sample=True)
        la0, bufs0 = prep.zero_carry()
        prev0 = jnp.zeros((S, self.cfg.decoder.in_dim * self.r), jnp.float32)
        self._carry = (prev0, la0, bufs0)

    def _grow_tk(self, tk_new):
        """Grow the slot arrays' text dimension to a larger bucket: K/V
        rows pad with zeros, the mask pads with True (padded) — the
        attention softmax over the grown region is exactly 0, so active
        slots decode identically after the growth. The decode program
        recompiles once per bucket."""
        if self._arrays is None:
            self._tk = tk_new
            return
        kv, mask, wq, sp = self._arrays
        grow = tk_new - mask.shape[1]
        assert grow > 0

        def pad1(a):
            z = jnp.zeros(a.shape[:1] + (grow,) + a.shape[2:], a.dtype)
            return jnp.concatenate([a, z], axis=1)

        kv = [None if p is None else (pad1(p[0]), pad1(p[1])) for p in kv]
        mask = jnp.concatenate(
            [mask, jnp.ones(mask.shape[:1] + (grow,), mask.dtype)], axis=1)
        self._arrays = [kv, mask, wq, sp]
        self._tk = tk_new

    def _admit(self, slot, seq, speaker_id, out_q):
        tk_req = self._bucket(len(seq))
        if tk_req > self._tk:
            self._grow_tk(tk_req)
        x = np.zeros((1, tk_req), np.int32)
        pos = np.zeros((1, tk_req), np.int32)
        x[0, :len(seq)] = seq
        pos[0, :len(seq)] = np.arange(1, len(seq) + 1)
        length = np.array([len(seq)], np.int32)
        spk = (None if speaker_id is None
               else jnp.asarray([speaker_id], jnp.int32))
        kv_row, mask_row, wq_row, sp_row = _admit_prog(
            self.params, self.cfg, jnp.asarray(x), jnp.asarray(pos),
            jnp.asarray(length), spk)
        if self._arrays is None:
            if self._tk > tk_req:       # pre-grown by an earlier submit
                kv_row, mask_row = self._pad_rows(kv_row, mask_row,
                                                  self._tk)
            self._tk = max(self._tk, tk_req)
            self._init_slot_arrays(kv_row, mask_row, wq_row, sp_row)
        elif self._tk > tk_req:
            kv_row, mask_row = self._pad_rows(kv_row, mask_row, self._tk)
        # same float expression as the kernel's static-Tk path so the
        # per-slot scale is bit-identical to a fresh stream's
        import math
        scale_val = jnp.float32(tk_req * math.sqrt(1.0 / tk_req))
        b = jnp.int32(slot)
        spk_val = jnp.int32(0 if speaker_id is None else speaker_id)
        (self._arrays, self._carry, self._ctx_scale, self.emit.spk,
         self._local) = _admit_scatter(
            self._arrays, self._carry, self._ctx_scale, self.emit.spk,
            self._local, b, kv_row, mask_row, wq_row, sp_row, scale_val,
            spk_val)
        self.emit.reset_slot(slot)
        self._slots[slot] = _Slot(out_q)

    @staticmethod
    def _pad_rows(kv_row, mask_row, tk):
        """Right-pad a (batch-1) admission's K/V rows and mask to the slot
        arrays' current text bucket (padded region is masked out)."""
        grow = tk - mask_row.shape[1]

        def pad1(a):
            z = jnp.zeros(a.shape[:1] + (grow,) + a.shape[2:], a.dtype)
            return jnp.concatenate([a, z], axis=1)

        mask_row = jnp.concatenate(
            [mask_row, jnp.ones(mask_row.shape[:1] + (grow,),
                                mask_row.dtype)], axis=1)
        return [None if p is None else (pad1(p[0]), pad1(p[1]))
                for p in kv_row], mask_row

    # -- the emission pipeline, grouped across slots ------------------------

    def _gl_sig(self, slot, n_new, keep_la):
        return (slot.n_ctx, slot.n_pend, n_new, keep_la)

    def _apply_gl_result(self, slot, n_new, keep_la):
        """Host bookkeeping mirroring StreamingVocoder.push/flush."""
        frames = slot.n_pend + n_new
        if keep_la and frames <= self.emit.GLA:
            slot.n_pend = frames            # absorbed, nothing emitted
            return 0
        emit_n = frames - (self.emit.GLA if keep_la else 0)
        slot.n_pend = self.emit.GLA if keep_la else 0
        slot.n_ctx = min(self.emit.GC, slot.n_ctx + emit_n)
        return emit_n

    def _put_audio(self, slot, audio_row):
        """Deliver one slot's samples, trimmed to the decoded length once
        the done latch fixed it."""
        if slot.n_total is not None:
            keep = max(0, slot.n_total - slot.emitted)
            audio_row = audio_row[:keep]
        if audio_row.shape[0]:
            slot.out_q.put(("audio", audio_row))
            slot.emitted += audio_row.shape[0]

    def _emit_step(self, active, d):
        """Normal per-step emission for all active slots: ONE fused
        converter+vocoder program per (converter window, GL phase)
        signature pair — the converter is recomputed full-width inside
        each phase group's program instead of launched separately, and
        the chunk's done flags `d` ride the LAST buffered group's
        program so the step's single fetch carries done+raw together
        (the step is dispatch-bound: ~12 ms serial host cost per launch
        through the dev tunnel, cb_gap_probe). Returns (jobs, packed);
        packed is None when no group merged into the accumulator."""
        # group by converter signature (computed BEFORE updating M/e_m),
        # then split by GL signature (slots can be at different vocoder
        # phases even with equal converter windows)
        conv_groups = {}
        for b in active:
            slot = self._slots[b]
            # pre-dispatch phase snapshot: the retire path rewinds to it
            # when the pipelined latch discovers this chunk overshot done
            slot.prev_phase = (slot.M, slot.e_m, slot.n_ctx, slot.n_pend)
            slot.M += self.chunk * self.r
            sig = self.emit.conv_sig(slot)
            conv_groups.setdefault(sig, []).append(b)
        dispatches = []            # (conv_sig, gsig, n_new, slots_np)
        for sig, idx in conv_groups.items():
            n_new = (sig[2] - sig[1]) * self.emit.up
            gl_groups = {}
            for b in idx:
                gsig = self._gl_sig(self._slots[b], n_new, True)
                gl_groups.setdefault(gsig, []).append(b)
            for gsig, slots in gl_groups.items():
                dispatches.append((sig, gsig, n_new,
                                   np.asarray(slots, np.int32)))
        # every fused program packs the done flags with its merged raw
        # accumulator (unconditional, so program identity stays signature-
        # only); the host keeps the LAST buffered group's packed output —
        # its accumulator has every group's merge
        jobs, packed, n_gl = [], None, 0
        for sig, gsig, n_new, slots_np in dispatches:
            raw, pk = self.emit.dispatch_gl(gsig, slots_np, conv=sig, d=d)
            if isinstance(raw, str) and pk is not None:
                packed = pk
            n_gl += 1
            jobs.append((slots_np, [self._slots[b] for b in slots_np],
                         raw, gsig[0] > 0, gsig, n_new))
            # per-slot emission phase advances at DISPATCH time (it is a
            # pure function of the signatures, not of device results), so
            # the NEXT step's signatures can be computed before this
            # step's results are fetched — the pipelined step depends on
            # it (audio delivery alone waits for the fetch)
            for b in slots_np:
                slot = self._slots[b]
                self._apply_gl_result(slot, n_new, True)
                slot.e_m = slot.M - self.emit.ctx_r
        self._last_emit_counts = (len(conv_groups), n_gl)
        return jobs, packed

    def _complete_jobs(self, jobs, raw_host):
        """Deliver one step's emission groups from the already-fetched
        step raw accumulator: crossfade + IIR on host, queue per-slot
        audio. Emission-phase bookkeeping happened at dispatch time
        (_emit_step); this is the fetch-dependent half only, run one
        step later by the pipelined step().

        Rows whose slot has since retired (or been re-admitted) are
        DROPPED before the host half runs: a retiring slot's in-flight
        extra chunk was rewound out of its device state and re-emitted
        exactly by the retire flush, so delivering it would duplicate
        samples — and its crossfade tail / IIR state must stay untouched
        for the slot's next occupant. Identity (`self._slots[b] is
        slot`) is the drop test, so a freshly admitted occupant of the
        same index is immune to its predecessor's in-flight rows."""
        for slots_np, slot_objs, raw, had_tail, gsig, n_new in jobs:
            if raw is None:                  # absorbed into lookahead
                continue
            keep = [i for i, (b, s) in enumerate(zip(slots_np, slot_objs))
                    if self._slots[b] is s]
            if not keep:
                continue
            idx = slots_np[keep]
            if isinstance(raw, str):         # merged into the accumulator
                m_g = self.emit.raw_width(gsig)
                rows = raw_host[idx][:, self.emit.m_max - m_g:]
                audio = self.emit.complete_rows(idx, rows, had_tail)
            else:
                audio = self.emit.complete_group(idx, raw, had_tail)
            for i, b in enumerate(idx):
                self._put_audio(self._slots[b], audio[i])

    def _finish_slot(self, b, n_dec):
        """Retire slot b: emit the held-back converter lookahead
        [e_m, M), flush the vocoder lookahead and crossfade tail —
        the exact StreamEmitter.finish / StreamingVocoder.flush sequence,
        via the same grouped programs at G=1 in row mode (each GL
        returns the member slot's (m,) samples). Both flush programs are
        dispatched BEFORE any fetch, and their rows come back in ONE
        packed transfer — a retirement costs one device sync, not two
        full-width ones (measured as the largest step-budget term)."""
        slot = self._slots[b]
        slot.n_total = streaming.decoded_samples(self.cfg, self.ap, n_dec)
        idx1 = np.asarray([b], np.int32)
        emits = []                        # (gsig, (m,) device raw)
        if slot.M > slot.e_m:
            # final converter emission [e_m, M) — window per the same
            # formula with emit_to = M, converter fused into the GL launch
            CB = streaming.CONV_BUCKET
            W = slot.M - max(0, slot.e_m - self.emit.ctx_l)
            Wb = min(slot.M, -(-W // CB) * CB)
            ws = slot.M - Wb
            sig = (Wb, slot.e_m - ws, slot.M - ws)
            n_new = (sig[2] - sig[1]) * self.emit.up
            # vocoder push (keeps the lookahead back)...
            gsig = self._gl_sig(slot, n_new, True)
            raw, _ = self.emit.dispatch_gl(gsig, idx1, row=True, conv=sig)
            self._apply_gl_result(slot, n_new, True)
            if raw is not None:
                emits.append((gsig, raw))
            slot.e_m = slot.M
        # ...then flush it (vocode [ctx | pend], emit everything)
        if slot.n_pend:
            gsig = self._gl_sig(slot, 0, False)
            raw, _ = self.emit.dispatch_gl(gsig, idx1, None, row=True)
            self._apply_gl_result(slot, 0, False)
            emits.append((gsig, raw))
        # one packed fetch for however many flush emissions there were
        rows = self.emit.fetch_packed([r for _, r in emits])
        for (gsig, _), row in zip(emits, rows):
            audio = self.emit.complete_rows(idx1, row[None], gsig[0] > 0)
            self._put_audio(slot, audio[0])
        # the held crossfade tail is the stream's final samples
        tail = self.emit.flush_tail(b)
        self._put_audio(slot, tail[0])
        slot.out_q.put(("end", n_dec))
        self._slots[b] = None

    def step(self):
        """Admit pending requests, dispatch one decode chunk + emission
        for every active slot, then process the PREVIOUS step's results
        (software pipelining, depth 1): the blocking device->host fetch
        of step N-1's done flags + raw samples happens AFTER step N's
        programs are dispatched, so the ~28 ms tunnel round trip
        overlaps this step's dispatches and device work instead of
        serializing with them (measured: the fetch was the single
        largest term of the dispatch-bound step, cb_gap_probe).

        Pipeline consequences, all bounded by one chunk:
          * a slot's done latch is detected one step late, so it decodes
            one extra (wasted) chunk; the retire path REWINDS its
            emission-state rows to the step-start snapshot and its phase
            counters to prev_phase, flushes exactly like an unpipelined
            stream (equality vs tts_stream is preserved bit-for-bit at
            the window level), and the in-flight extra emission is
            dropped at delivery by _complete_jobs' slot-identity check;
          * first audio arrives one step later than the unpipelined
            engine (TTFA +~1 step wall) — the price of hiding the fetch.

        Returns the number of slots dispatched this call, or (when no
        slot is active) 1 while drain work remains, 0 when idle."""
        with self._lock:
            t0 = time.perf_counter()
            n_admitted = 0
            for b in range(self.n_slots):
                if self._slots[b] is None and not self._waiting.empty():
                    try:
                        seq, sid, out_q = self._waiting.get_nowait()
                    except queue.Empty:
                        break
                    self._admit(b, seq, sid, out_q)
                    n_admitted += 1
            active = [b for b in range(self.n_slots)
                      if self._slots[b] is not None]
            if not active:
                # nothing to dispatch: drain the in-flight step (if any)
                # and the retirements it produces
                worked = self._pending is not None
                self._process_pending(dispatched=False)
                return 1 if worked else 0
            t1 = time.perf_counter()
            self._phase_s["admit"] += t1 - t0
            self._steps_run += 1

            # step-start emission-state snapshot (reference-cheap): the
            # retire path rewinds a late-latched slot's rows to it
            self._emit_snap = (self.emit.hist, self.emit.lin_tail,
                               self.emit.prev_re, self.emit.prev_im,
                               self.emit.pend)
            kv, mask, wq, sp = self._arrays
            prev, la, bufs = self._carry
            # ONE fused launch: decode chunk + history roll + local-step
            # advance (the per-slot local positions live on device and
            # are reset by the admission scatter — no per-step upload)
            d, self.emit.hist, self._local, self._carry = _slot_chunk_prog(
                self.params["decoder"], self.cfg.decoder, kv, mask, wq, sp,
                self._ctx_scale, self.fpe_table, self._local,
                prev, la, bufs, self.emit.hist, steps=self.chunk,
                fpe_raw=self.fpe_raw, interpret=self.interpret,
                use_state=self.cfg.use_decoder_state_for_postnet_input)
            t2 = time.perf_counter()
            self._phase_s["decode_dispatch"] += t2 - t1

            # grouped emission (phase bookkeeping applied at dispatch)
            jobs, packed = self._emit_step(active, d)
            t3 = time.perf_counter()
            self._phase_s["emit_dispatch"] += t3 - t2

            # stash this step's in-flight results and start their host
            # copy early; the blocking harvest happens NEXT step
            fetch = packed if packed is not None else d
            try:
                fetch.copy_to_host_async()
            except (AttributeError, NotImplementedError):
                pass                          # backend without async copy
            entries = [(b, self._slots[b], self._slots[b].local_steps)
                       for b in active]
            for b in active:
                self._slots[b].local_steps += self.chunk
            prev_pending = self._pending
            self._pending = {"jobs": jobs, "fetch": fetch,
                             "has_raw": packed is not None,
                             "entries": entries}
            self._process_pending(dispatched=True, pending=prev_pending)
            if self.step_log is not None:
                self.step_log.append(
                    (time.perf_counter() - t0, len(active), n_admitted,
                     self._last_emit_counts[0], self._last_emit_counts[1],
                     self._last_retired))
            return len(active)

    def _process_pending(self, dispatched, pending="take"):
        """Harvest one in-flight step: fetch its done+raw payload, latch
        done flags, deliver its audio (latch-first so decoded-length
        trims apply to this chunk), then retire done slots immediately.

        `dispatched` says whether the caller stashed a NEW in-flight
        step before this harvest. If it did, a newly latched slot has
        one overshoot chunk in flight: its emission-state rows are
        rewound to the step-start snapshot (device) and its phase
        counters to prev_phase (host) before the flush, so the flush
        emits exactly what an unpipelined stream would — the in-flight
        extra chunk is then dropped at delivery by _complete_jobs'
        identity check. On a drain call (no new dispatch) nothing
        overshot, so no rewind."""
        if pending == "take":
            pending, self._pending = self._pending, None
        self._last_retired = 0
        if pending is None:
            return
        t4 = time.perf_counter()
        retires = []
        payload = np.asarray(pending["fetch"])         # the ONE sync
        if pending["has_raw"]:
            d_host = payload[:, :self.chunk]
            raw_host = payload[:, self.chunk:]
        else:
            d_host, raw_host = payload, None
        for b, slot, base in pending["entries"]:
            if self._slots[b] is not slot:             # already retired
                continue
            gstep = base + np.arange(1, self.chunk + 1)
            row = (d_host[b] > 0.5) & (gstep > self.min_steps)
            slot.done_rows.append(row)
            slot.latched |= bool(row.any())
            processed = base + self.chunk
            if slot.latched or processed >= self.max_decoder_steps:
                done_all = np.concatenate(slot.done_rows)
                n_dec = (int(done_all.argmax()) + 1 if slot.latched
                         else processed)
                # the chunk-granular decode can overshoot the done latch
                # and max_decoder_steps by < one chunk; the reported
                # length and every sample streamed from here are trimmed
                # to the capped decoded length
                n_dec = min(n_dec, self.max_decoder_steps)
                slot.n_total = streaming.decoded_samples(
                    self.cfg, self.ap, n_dec)
                retires.append((b, slot, n_dec))
        t5 = time.perf_counter()
        self._phase_s["done_fetch"] += t5 - t4
        self._complete_jobs(pending["jobs"], raw_host)
        t6 = time.perf_counter()
        self._phase_s["complete"] += t6 - t5
        for b, slot, n_dec in retires:
            if dispatched:
                # rewind the overshoot chunk dispatched this step
                (self.emit.hist, self.emit.lin_tail, self.emit.prev_re,
                 self.emit.prev_im, self.emit.pend) = _restore_rows(
                    (self.emit.hist, self.emit.lin_tail, self.emit.prev_re,
                     self.emit.prev_im, self.emit.pend),
                    self._emit_snap, jnp.int32(b))
                slot.M, slot.e_m, slot.n_ctx, slot.n_pend = slot.prev_phase
            self._finish_slot(b, n_dec)
            self._last_retired += 1
        self._phase_s["retire"] += time.perf_counter() - t6

    def _fail_all(self, exc):
        """Deliver an engine failure to every in-flight and waiting
        request, then reset the slots so the worker can keep serving."""
        with self._lock:
            self._pending = None
            for b in range(self.n_slots):
                if self._slots[b] is not None:
                    self._slots[b].out_q.put(("error", exc))
                    self._slots[b] = None
        while True:
            try:
                _, _, out_q = self._waiting.get_nowait()
            except queue.Empty:
                break
            out_q.put(("error", exc))

    def run_loop(self, stop_event):
        """Worker loop for serve.py: steps while work exists, sleeps
        briefly when idle. An engine error fails the affected requests
        (("error", exc) on their queues) instead of silently killing the
        worker — the loop keeps serving."""
        import time
        import traceback

        while not stop_event.is_set():
            try:
                n = self.step()
            except Exception as e:              # noqa: BLE001
                traceback.print_exc()
                self._fail_all(e)
                n = 0
            if n == 0:
                time.sleep(0.005)
