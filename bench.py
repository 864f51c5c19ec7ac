#!/usr/bin/env python
# coding: utf-8
"""Headline benchmark: batched LJSpeech-style synthesis throughput.

Measures the full text->waveform pipeline on one chip — autoregressive
decode (lax.while_loop over ring buffers), converter, and on-device
Griffin-Lim — at batch=32, the BASELINE.json north-star workload
("≥20x real-time batched synthesis incl. Griffin-Lim, 1x TPU v5e chip").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured RTF / 20 (the reference publishes no numbers; 20x
real-time is the north-star bar, so >1.0 beats the target).
"""

import json
import sys
import time

import numpy as np


SENTENCES = [
    "The birch canoe slid on the smooth planks.",
    "Glue the sheet to the dark blue background.",
    "It's easy to tell the depth of a well.",
    "These days a chicken leg is a rare dish.",
    "Rice is often served in round bowls.",
    "The juice of lemons makes fine punch.",
    "The box was thrown beside the parked truck.",
    "The hogs were fed chopped corn and garbage.",
    "Four hours of steady work faced us.",
    "A large size in stockings is hard to sell.",
    "The boy was there when the sun rose.",
    "A rod is used to catch pink salmon.",
    "The source of the huge river is the clear spring.",
    "Kick the ball straight and follow through.",
    "Help the woman get back to her feet.",
    "A pot of tea helps to pass the evening.",
    "Smoky fires lack flame and heat.",
    "The soft cushion broke the man's fall.",
    "The salt breeze came across from the sea.",
    "The girl at the booth sold fifty bonds.",
    "The small pup gnawed a hole in the sock.",
    "The fish twisted and turned on the bent hook.",
    "Press the pants and sew a button on the vest.",
    "The swan dive was far short of perfect.",
    "The beauty of the view stunned the young boy.",
    "Two blue fish swam in the tank.",
    "Her purse was full of useless trash.",
    "The colt reared and threw the tall rider.",
    "It snowed, rained, and hailed the same morning.",
    "Read verse out loud for pleasure.",
    "Hoist the load to your left shoulder.",
    "Take the winding path to reach the lake.",
]


def main():
    import os

    import jax
    import jax.numpy as jnp

    # persistent compilation cache: the axon PJRT supports executable
    # serialization, so repeat bench runs skip the (remote) TPU compile
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepvoice3_pytorch_tpu import builder as b
    from deepvoice3_pytorch_tpu.builder import model_synthesize
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.synthesis import _prepare_batch

    hp = default_hparams()
    # LJSpeech preset dimensions (presets/deepvoice3_ljspeech.json)
    hp.parse("builder=deepvoice3,text_embed_dim=256,encoder_channels=512,"
             "decoder_channels=256,converter_channels=256,"
             "outputs_per_step=1,downsample_step=4,kernel_size=3,"
             "key_projection=true,value_projection=true,"
             "key_position_rate=1.385,griffin_lim_iters=60")

    from deepvoice3_pytorch_tpu.model_builder import build_model
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)

    B = 32
    texts = SENTENCES[:B]
    x, pos, lengths = _prepare_batch(en, texts, 0.0, pad_to=64)

    # fixed decode length so random-weight done flags can't shrink the work:
    # 150 decoder steps x downsample 4 x hop 256 / 22050 Hz = 6.96 s audio
    T_DEC = 150
    seconds_per_utt = T_DEC * cfg.r * cfg.downsample_step * hp.hop_size \
        / hp.sample_rate

    x_d, pos_d = jnp.asarray(x), jnp.asarray(pos)
    lengths_d = jnp.asarray(lengths)

    # Two compiled programs: seq2seq+postnet synthesis (whole-loop Pallas
    # decode) and the Griffin-Lim vocoder. Composing them into one jit sends
    # XLA's optimizer into a tens-of-minutes compile at these shapes
    # (measured on v5e); as two programs each compiles in seconds-to-minutes
    # and the extra dispatch is microseconds.
    def synth(params, x, pos, lengths):
        mel, linear, align, done, dec_len = model_synthesize(
            params, cfg, x, pos, input_lengths=lengths,
            max_decoder_steps=T_DEC, early_exit=False, fused=True)
        return mel, linear, dec_len

    c_synth = jax.jit(synth).lower(params, x_d, pos_d, lengths_d).compile()
    mel, linear, _ = c_synth(params, x_d, pos_d, lengths_d)
    jax.block_until_ready(linear)
    # NOTE: inv_spectrogram_device is internally jitted with the DFT
    # matrices as runtime args — wrapping it in another jit would embed
    # them as giant constants and blow up the remote compile
    c_voc = ap.inv_spectrogram_device

    # warmup + compile (also validates outputs)
    wav = c_voc(linear)
    assert np.isfinite(np.asarray(wav)).all(), "non-finite waveform"

    # time with a device->host fetch of the result: on tunneled backends
    # block_until_ready can return before remote execution finishes, so a
    # materializing transfer is the only trustworthy fence
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        mel, linear, _ = c_synth(params, x_d, pos_d, lengths_d)
        wav = c_voc(linear)
        np.asarray(wav)
        times.append(time.perf_counter() - t0)

    wall = min(times)
    audio_seconds = B * seconds_per_utt
    rtf = audio_seconds / wall

    print(json.dumps({
        "metric": "batched_synthesis_rtf_b32_incl_griffinlim",
        "value": round(rtf, 2),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
