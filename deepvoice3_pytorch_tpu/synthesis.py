# coding: utf-8
"""Synthesis API (reference synthesis.py:42-73 tts()).

`tts` synthesizes one utterance; `tts_batch` runs a whole batch of texts
through one compiled program — decode, converter, and Griffin-Lim all
on-device (the ≥20x-real-time path)."""

import numpy as np
import jax.numpy as jnp

from .builder import model_synthesize
from .dsp.audio import AudioProcessor


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
    from the results. Implies the scan/while decode path (the Pallas
    kernel is a single-program kernel; GSPMD cannot partition it).
    Equivalence with single-device synthesis is pinned by
    tests/test_multichip.py::test_dp_synthesis_matches_single_device."""
    import jax

    if fused is None:
        fused = mesh is None and jax.default_backend() == "tpu"
    if fused and mesh is not None:
        raise ValueError(
            "fused decode cannot be mesh-sharded; use fused=False with mesh")
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

    mel, linear, align, done, dec_lengths = model_synthesize(
        params, cfg, x, pos, speaker_ids=spk,
        input_lengths=lengths,
        max_decoder_steps=max_decoder_steps,
        early_exit=early_exit and not fused, fused=fused)

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
