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
              early_exit=True, pad_to=8, fused=None):
    """Batched text -> waveform. Returns a list of per-utterance dicts with
    waveform / mel / linear / alignment, trimmed to decoded lengths.

    fused routes decoding through the whole-loop Pallas kernel
    (ops/fused_decode.py); implies fixed-length decoding. Default (None):
    fused on TPU, scan elsewhere (the Pallas kernel only interprets on CPU).
    """
    import jax

    if fused is None:
        fused = jax.default_backend() == "tpu"
    x, pos, lengths = _prepare_batch(frontend_mod, texts, p, pad_to)
    spk = None if speaker_ids is None else jnp.asarray(speaker_ids)

    mel, linear, align, done, dec_lengths = model_synthesize(
        params, cfg, jnp.asarray(x), jnp.asarray(pos), speaker_ids=spk,
        input_lengths=jnp.asarray(lengths),
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
