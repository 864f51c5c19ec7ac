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
    raw-angle rows of its OWN local positions, so a slot admitted at
    global chunk 7 decodes exactly like a fresh stream at chunk 0
    (equality pinned by tests/test_serving.py).

Downstream of the decoder each slot has its own StreamEmitter
(streaming.py): windowed converter + phase-coherent windowed Griffin-Lim,
batch-1 per slot because slots are at different emission phases.

Restrictions: deepvoice3-family decoders (raw-angle position mode) with
non-trainable positional encodings; all texts padded to one fixed length.

The reference has no serving layer at all (its synthesis.py writes files
after full synthesis, reference synthesis.py:42-73).
"""

import queue
import threading
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ops import core, fused_decode as fd
from . import streaming


@partial(jax.jit, static_argnames=("cfg",))
def _admit_prog(params, cfg, x, pos, length, spk):
    """Per-request launch-invariant state (batch 1): projected attention
    K/V, padding mask, query position rate, speaker biases."""
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


@partial(jax.jit, static_argnames=("cfg", "steps", "interpret"))
def _slot_chunk_prog(params, cfg, projected_kv, mask, wq, speaker_bias,
                     fpe_table, local_steps, prev, la, bufs, *, steps,
                     interpret):
    """One `steps`-frame launch over the slot batch, every slot at its own
    local position: gather each slot's raw-angle rows from the table
    (clamped like the scan path's jnp.take) and run the kernel in
    fpe_per_sample mode."""
    prep = fd._Prepared(params, cfg, projected_kv, mask, w_query=wq,
                        speaker_bias=speaker_bias, fpe_raw=True,
                        fpe_per_sample=True)
    pos = local_steps[:, None] + jnp.arange(1, steps + 1,
                                            dtype=jnp.int32)[None, :]
    pos = jnp.clip(pos, 0, fpe_table.shape[0] - 1)
    fpe_rows = jnp.take(fpe_table, pos, axis=0)        # (S, steps, C)
    return prep.launch(fpe_rows, prev, la, bufs, steps, interpret)


class _Slot:
    __slots__ = ("emitter", "out_q", "local_steps", "done_rows", "latched",
                 "emitted")

    def __init__(self, emitter, out_q):
        self.emitter = emitter
        self.out_q = out_q
        self.local_steps = 0
        self.done_rows = []
        self.latched = False
        self.emitted = 0          # samples delivered so far


class BacklogFull(RuntimeError):
    """Admission control: the waiting queue is at max_backlog. Callers
    should shed the request (serve.py answers HTTP 503 + Retry-After)
    rather than queue unboundedly — a TTS stream admitted minutes late is
    worthless to the listener AND still costs chip time."""


class ContinuousBatcher:
    """Fixed-slot continuous-batching streaming synthesizer.

    submit(text) returns a queue delivering ("audio", (m,) float32)
    items followed by ("end", decoded_steps). step() advances every
    active slot by one decode chunk and admits pending requests; run it
    from a worker loop (serve.py --slots) or call it directly."""

    def __init__(self, params, cfg, ap, frontend_mod, *, n_slots=4,
                 text_pad=64, chunk=16, max_decoder_steps=200,
                 gl_context=16, gl_lookahead=8, xfade=None, interpret=None,
                 max_backlog=None):
        dcfg = cfg.decoder
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.params, self.cfg, self.ap = params, cfg, ap
        self.frontend = frontend_mod
        self.n_slots, self.text_pad, self.chunk = n_slots, text_pad, chunk
        self.max_decoder_steps = max_decoder_steps
        # default cap: 8 waiting requests per slot — at that depth a new
        # request's first audio is already ~a full utterance away
        self.max_backlog = 8 * n_slots if max_backlog is None else max_backlog
        self.interpret = interpret
        self.gl_kw = dict(gl_context=gl_context, gl_lookahead=gl_lookahead,
                          xfade=xfade)
        self.r = dcfg.r
        self.min_steps = dcfg.min_decoder_steps
        _, ctx_r = streaming.converter_context(cfg.converter)
        assert chunk * self.r > ctx_r, (
            "chunk too small for the converter lookahead")

        # raw-angle table: fpe_per_sample gathers each slot's local
        # positions from it. The deepvoice3 family stores raw angles
        # (fused_decode_inputs fpe_raw=True); nyanko stores finished
        # encodings and is not supported here.
        assert not hasattr(dcfg, "audio_encoder"), (
            "continuous batching requires the raw-angle position mode "
            "(deepvoice3 family)")
        self.fpe_table = params["decoder"]["embed_query_positions"]["w"]

        self._lock = threading.Lock()
        self._waiting = queue.Queue()
        self._slots = [None] * n_slots
        self._arrays = None          # slot-batched kv/mask/wq/sp
        self._carry = None           # (prev, la, bufs)

    # -- request side -------------------------------------------------------

    def submit(self, text, speaker_id=None, p=0.0):
        """Thread-safe: enqueue a request; returns the delivery queue.

        Queue items: ("audio", (m,) float32), then ("end", decoded_steps);
        ("error", exception) if the engine failed the request."""
        seq = np.asarray(self.frontend.text_to_sequence(text, p=p), np.int32)
        if len(seq) > self.text_pad:
            raise ValueError("text longer than text_pad=%d tokens"
                             % self.text_pad)
        # speaker-ness must be uniform across the slot batch: the slot
        # arrays are allocated once, with or without speaker-bias rows
        multispeaker = "embed_speakers" in self.params
        if multispeaker and speaker_id is None:
            raise ValueError("multi-speaker model: speaker_id is required")
        if not multispeaker and speaker_id is not None:
            raise ValueError("single-speaker model: speaker_id must be None")
        if self._waiting.qsize() >= self.max_backlog:
            raise BacklogFull(
                "waiting queue at max_backlog=%d; shed this request"
                % self.max_backlog)
        out_q = queue.Queue()
        self._waiting.put((seq, speaker_id, out_q))
        return out_q

    def pending(self):
        with self._lock:
            active = sum(s is not None for s in self._slots)
        return active + self._waiting.qsize()

    # -- engine side ----------------------------------------------------

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
        wq = jnp.ones((S,), jnp.float32)
        sp = None if sp_row is None else [
            jnp.zeros((S,) + b.shape[1:], b.dtype) for b in sp_row]
        self._arrays = [kv, mask, wq, sp]
        prep = fd._Prepared(self.params["decoder"], self.cfg.decoder,
                            kv, mask, w_query=wq, speaker_bias=sp,
                            fpe_raw=True, fpe_per_sample=True)
        la0, bufs0 = prep.zero_carry()
        prev0 = jnp.zeros((S, self.cfg.decoder.in_dim * self.r), jnp.float32)
        self._carry = (prev0, la0, bufs0)

    def _admit(self, slot, seq, speaker_id, out_q):
        x = np.zeros((1, self.text_pad), np.int32)
        pos = np.zeros((1, self.text_pad), np.int32)
        x[0, :len(seq)] = seq
        pos[0, :len(seq)] = np.arange(1, len(seq) + 1)
        length = np.array([len(seq)], np.int32)
        spk = (None if speaker_id is None
               else jnp.asarray([speaker_id], jnp.int32))
        kv_row, mask_row, wq_row, sp_row = _admit_prog(
            self.params, self.cfg, jnp.asarray(x), jnp.asarray(pos),
            jnp.asarray(length), spk)
        if self._arrays is None:
            self._init_slot_arrays(kv_row, mask_row, wq_row, sp_row)
        kv, mask, wq, sp = self._arrays
        b = slot
        kv = [None if p is None else
              (p[0].at[b].set(pr[0][0]), p[1].at[b].set(pr[1][0]))
              for p, pr in zip(kv, kv_row)]
        mask = mask.at[b].set(mask_row[0])
        wq = wq.at[b].set(wq_row[0])
        if sp is not None:
            sp = [a.at[b].set(r0[0]) for a, r0 in zip(sp, sp_row)]
        self._arrays = [kv, mask, wq, sp]
        prev, la, bufs = self._carry
        prev = prev.at[b].set(0.0)
        la = la.at[b].set(0)
        bufs = tuple(a.at[b].set(0.0) for a in bufs)
        self._carry = (prev, la, bufs)

        emitter = streaming.StreamEmitter(self.params, self.cfg, self.ap,
                                          spk, **self.gl_kw)
        self._slots[slot] = _Slot(emitter, out_q)

    def step(self):
        """Admit pending requests, decode one chunk for every slot, emit
        per-slot audio. Returns the number of active slots BEFORE
        retirement (0 = nothing to do)."""
        with self._lock:
            for b in range(self.n_slots):
                if self._slots[b] is None and not self._waiting.empty():
                    try:
                        seq, sid, out_q = self._waiting.get_nowait()
                    except queue.Empty:
                        break
                    self._admit(b, seq, sid, out_q)
            active = [b for b in range(self.n_slots)
                      if self._slots[b] is not None]
            if not active:
                return 0

            kv, mask, wq, sp = self._arrays
            prev, la, bufs = self._carry
            local = np.zeros((self.n_slots,), np.int32)
            for b in active:
                local[b] = self._slots[b].local_steps
            (o, a, d, s), self._carry = _slot_chunk_prog(
                self.params["decoder"], self.cfg.decoder, kv, mask, wq, sp,
                self.fpe_table, jnp.asarray(local), prev, la, bufs,
                steps=self.chunk, interpret=self.interpret)

            # dispatch every active slot's emission before the done fetch
            tokens = {}
            for b in active:
                slot = self._slots[b]
                if self.cfg.use_decoder_state_for_postnet_input:
                    pin = s[b:b + 1].reshape(1, self.chunk * self.r, -1)
                else:
                    pin = o[b:b + 1].reshape(1, self.chunk * self.r, -1)
                tokens[b] = slot.emitter.feed_async(pin)

            d_host = np.asarray(d)                     # (S, chunk) sync
            for b in active:
                slot = self._slots[b]
                gstep = slot.local_steps + np.arange(1, self.chunk + 1)
                row = (d_host[b] > 0.5) & (gstep > self.min_steps)
                slot.done_rows.append(row)
                slot.latched |= bool(row.any())
                slot.local_steps += self.chunk

                retire = (slot.latched
                          or slot.local_steps >= self.max_decoder_steps)
                n_total = None
                if retire:
                    done_all = np.concatenate(slot.done_rows)
                    n_dec = (int(done_all.argmax()) + 1 if slot.latched
                             else slot.local_steps)
                    # the chunk-granular decode can overshoot both the
                    # done latch and max_decoder_steps by < one chunk;
                    # the reported length and every sample streamed from
                    # here are trimmed to the capped decoded length
                    n_dec = min(n_dec, self.max_decoder_steps)
                    n_total = streaming.decoded_samples(self.cfg, self.ap,
                                                        n_dec)

                def put(audio_1xm):
                    if n_total is not None:
                        keep = max(0, n_total - slot.emitted)
                        audio_1xm = audio_1xm[:, :keep]
                    if audio_1xm.shape[1]:
                        slot.out_q.put(("audio", audio_1xm[0]))
                        slot.emitted += audio_1xm.shape[1]

                audio, _ = slot.emitter.feed_finish(tokens[b])
                put(audio)
                if retire:
                    tail, _ = slot.emitter.finish()
                    put(tail)
                    slot.out_q.put(("end", n_dec))
                    self._slots[b] = None
            return len(active)

    def _fail_all(self, exc):
        """Deliver an engine failure to every in-flight and waiting
        request, then reset the slots so the worker can keep serving."""
        with self._lock:
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
