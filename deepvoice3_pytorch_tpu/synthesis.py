# coding: utf-8
"""Synthesis API (reference synthesis.py:42-73 tts()).

`tts` synthesizes one utterance; `tts_batch` runs a whole batch of texts
through compiled programs — decode, converter, and Griffin-Lim all
on-device (the ≥20x-real-time path). The pipeline is three programs:

  1. encoder + autoregressive decode (chunked fused Pallas kernel with an
     early-exit done latch, or scan/while),
  2. converter (postnet) on the decoder buffers TRIMMED to the batch's max
     decoded length (bucketed to bound recompiles),
  3. Griffin-Lim vocoder on the correspondingly shorter linear buffer.

The trim means vocoder cost scales with what was actually decoded, not
with max_decoder_steps — on a trained checkpoint decoding ~30 frames out
of a 200-step cap this is ~6x less Griffin-Lim work.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .builder import model_decode, model_postnet
from .dsp.audio import AudioProcessor

# decoder-step bucket for the post-decode trim: max decoded length is
# rounded up to a multiple of this (plus slack for the converter's
# receptive field), bounding the number of converter/vocoder program
# shapes to max_decoder_steps/16 (each bucket compiles once, then caches;
# finer buckets trade a few more one-time compiles for less padded
# Griffin-Lim work — 16 saved ~12% vocoder time at bench decoded lengths)
BUCKET_DEC_STEPS = 16
SLACK_DEC_STEPS = 8

_SHARDED_DECODE_CACHE = {}


def _round_up(n, k):
    return ((n + k - 1) // k) * k


@partial(jax.jit,
         static_argnames=("cfg", "max_decoder_steps", "early_exit", "fused"))
def _decode_prog(params, cfg, x, pos, lengths, spk, *, max_decoder_steps,
                 early_exit, fused):
    return model_decode(params, cfg, x, pos, speaker_ids=spk,
                        input_lengths=lengths,
                        max_decoder_steps=max_decoder_steps,
                        early_exit=early_exit, fused=fused)


@partial(jax.jit, static_argnames=("cfg",))
def _postnet_prog(params, cfg, postnet_inputs, spk):
    return model_postnet(params, cfg, postnet_inputs, speaker_ids=spk)


def _sharded_decode_prog(mesh, cfg, max_decoder_steps, early_exit, has_spk):
    """Data-parallel fused decode: shard_map over the mesh's 'data' axis
    with replicated params — each device runs the whole-loop Pallas kernel
    on its local batch shard (GSPMD cannot partition a single-program
    kernel, so the partitioning is explicit). check_rep=False because
    outputs are only replicated along unmentioned axes trivially."""
    import jax
    from jax.sharding import PartitionSpec as P

    from .parallel import mesh as mesh_lib

    key = (mesh, cfg, max_decoder_steps, early_exit, has_spk)
    if key in _SHARDED_DECODE_CACHE:
        return _SHARDED_DECODE_CACHE[key]

    data = mesh_lib.DATA_AXIS

    def body(params, x, pos, lengths, spk):
        return model_decode(params, cfg, x, pos, speaker_ids=spk,
                            input_lengths=lengths,
                            max_decoder_steps=max_decoder_steps,
                            early_exit=early_exit, fused=True)

    spk_spec = P(data) if has_spk else P()
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(data), P(data), P(data), spk_spec),
        out_specs=(P(data),) * 5, check_vma=False)
    fn = jax.jit(fn)
    _SHARDED_DECODE_CACHE[key] = fn
    return fn


def _prepare_batch(frontend_mod, texts, p=0.0, pad_to=None):
    seqs = [np.asarray(frontend_mod.text_to_sequence(t, p=p), np.int32)
            for t in texts]
    max_len = max(len(s) for s in seqs)
    if pad_to is not None:
        max_len = ((max_len + pad_to - 1) // pad_to) * pad_to
    x = np.zeros((len(seqs), max_len), np.int32)
    pos = np.zeros((len(seqs), max_len), np.int32)
    lengths = np.zeros((len(seqs),), np.int32)
    for i, s in enumerate(seqs):
        x[i, :len(s)] = s
        pos[i, :len(s)] = np.arange(1, len(s) + 1)
        lengths[i] = len(s)
    return x, pos, lengths


def tts_batch(params, cfg, ap: AudioProcessor, frontend_mod, texts, *,
              p=0.0, speaker_ids=None, max_decoder_steps=500,
              early_exit=True, pad_to=8, fused=None, mesh=None):
    """Batched text -> waveform. Returns a list of per-utterance dicts with
    waveform / mel / linear / alignment, trimmed to decoded lengths.

    fused routes decoding through the whole-loop Pallas kernel
    (ops/fused_decode.py); implies fixed-length decoding. Default (None):
    fused on TPU, scan elsewhere (the Pallas kernel only interprets on CPU).

    mesh shards the batch over the mesh's 'data' axis (params replicated)
    for data-parallel synthesis across chips; the batch is padded to a
    multiple of the axis size by repeating row 0 and the pad rows dropped
    from the results. With fused=True the sharding is explicit: shard_map
    runs the whole-loop Pallas kernel per device on its local shard
    (_sharded_decode_prog); without fused, GSPMD partitions the scan.
    Equivalence with single-device synthesis is pinned by
    tests/test_multichip.py::test_dp_synthesis_matches_single_device."""
    if fused is None:
        fused = jax.default_backend() == "tpu"
    x, pos, lengths = _prepare_batch(frontend_mod, texts, p, pad_to)
    spk = None if speaker_ids is None else np.asarray(speaker_ids)

    if mesh is not None:
        from .parallel import mesh as mesh_lib

        n_data = mesh.shape[mesh_lib.DATA_AXIS]
        n_pad_rows = (-x.shape[0]) % n_data
        if n_pad_rows:
            x, pos, lengths = (np.concatenate(
                [a, np.repeat(a[:1], n_pad_rows, axis=0)])
                for a in (x, pos, lengths))
            if spk is not None:
                spk = np.concatenate(
                    [spk, np.repeat(spk[:1], n_pad_rows, axis=0)])
        # one host->device transfer per array: device_put shards the host
        # array directly (jnp.asarray first would commit to device 0 and
        # transfer twice)
        bs = mesh_lib.batch_sharding(mesh)
        x, pos, lengths = (jax.device_put(a, bs)
                           for a in (x, pos, lengths))
        if spk is not None:
            spk = jax.device_put(spk, bs)
        params = jax.device_put(params, mesh_lib.replicated(mesh))
    else:
        x, pos, lengths = jnp.asarray(x), jnp.asarray(pos), \
            jnp.asarray(lengths)
        if spk is not None:
            spk = jnp.asarray(spk)

    if mesh is not None and fused:
        decode_fn = _sharded_decode_prog(mesh, cfg, max_decoder_steps,
                                         early_exit, spk is not None)
        mel, pin, align, done, dec_lengths = decode_fn(params, x, pos,
                                                       lengths, spk)
    else:
        mel, pin, align, done, dec_lengths = _decode_prog(
            params, cfg, x, pos, lengths, spk,
            max_decoder_steps=max_decoder_steps,
            early_exit=early_exit, fused=fused)

    # trim the postnet input to the batch's max decoded length before the
    # converter and vocoder: cost now scales with decoded audio, not with
    # max_decoder_steps. The tiny (B,)-int fetch is the only host sync.
    # Bucketing (+ receptive-field slack) bounds recompiles and keeps the
    # converter's edge frames identical for every real frame.
    # (measured: skipping this fetch for early_exit=False is NOT a win —
    # the done-derived lengths still trim the converter/vocoder work even
    # on fixed-length decodes, which is worth far more than the ~ms sync)
    n_dec_max = int(np.asarray(dec_lengths).max())
    n_bucket = min(max_decoder_steps,
                   _round_up(n_dec_max + SLACK_DEC_STEPS, BUCKET_DEC_STEPS))
    pin = pin[:, :n_bucket * cfg.r]
    linear = _postnet_prog(params, cfg, pin, spk)

    # Griffin-Lim the whole batch on device in one call
    wav_batch = ap.inv_spectrogram_batch(linear)

    results = []
    time_up = getattr(cfg.converter, "time_upsampling", 1)
    for i in range(len(texts)):
        n_dec = int(dec_lengths[i])
        n_mel = n_dec * cfg.r
        n_lin = n_mel * time_up
        n_wav = n_lin * ap.hop_size
        results.append({
            "waveform": np.asarray(wav_batch[i][:n_wav]),
            "mel": np.asarray(ap._denormalize(mel[i][:n_mel])),
            "linear": np.asarray(ap._denormalize(linear[i][:n_lin])),
            "alignment": np.asarray(align[i][:n_dec, :int(lengths[i])]),
            "num_decoder_steps": n_dec,
        })
    return results


def tts(params, cfg, ap, frontend_mod, text, *, p=0.0, speaker_id=None,
        max_decoder_steps=500, fast=True):
    """Single-utterance synthesis mirroring the reference tts() return
    signature: (waveform, alignment, spectrogram, mel)."""
    speaker_ids = None if speaker_id is None else [speaker_id]
    out = tts_batch(params, cfg, ap, frontend_mod, [text], p=p,
                    speaker_ids=speaker_ids,
                    max_decoder_steps=max_decoder_steps,
                    early_exit=fast)[0]
    return out["waveform"], out["alignment"], out["linear"], out["mel"]
