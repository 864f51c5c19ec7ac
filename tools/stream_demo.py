#!/usr/bin/env python
# coding: utf-8
"""Streamed-vs-batch audio demo with committed artifacts.

Trains the deterministic synthetic-language checkpoint (same recipe as
bench.py's trained row: 4000 steps, LJSpeech preset, device-resident
batches), then synthesizes the same held-out sentences through BOTH
pipelines:

  - batch  : synthesis.tts_batch (chunked fused decode + whole-utterance
             Pallas Griffin-Lim)
  - stream : streaming.tts_stream (host-driven chunk decode + windowed
             converter + phase-coherent windowed Griffin-Lim), recording
             the time-to-first-audio per utterance

Artifacts written to --outdir (committed to docs/streaming_demo/):
  {i}_batch.wav / {i}_stream.wav   the audible A/B pair
  {i}.txt                          caption
  metrics.json                     TTFA, chunk timeline, spectral
                                   convergence of both waveforms vs the
                                   model's own predicted magnitudes

Usage:
  python tools/stream_demo.py --outdir docs/streaming_demo
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

DEMO_TEXTS = [
    "the quiet river moved past the old bridge.",
    "a warm wind came over the low green hills.",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--outdir", default="docs/streaming_demo")
    parser.add_argument("--steps", type=int, default=4000)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _LJ_PARSE
    from deepvoice3_pytorch_tpu import streaming, synthesis
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.training import trainer
    from deepvoice3_pytorch_tpu.utils import synthcorpus as sc

    os.makedirs(args.outdir, exist_ok=True)

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    train_texts = sc.make_sentences(48, seed=3)
    kpr = sc.mean_frames_per_char(train_texts, hp.sample_rate, hp.hop_size) \
        / (hp.downsample_step * hp.outputs_per_step)
    hp.parse("key_position_rate=%.4f" % kpr)
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)

    print("training %d steps on the synthetic language..." % args.steps)
    items = sc.build_items(train_texts, hp, ap, en)
    batches = [jax.tree.map(jnp.asarray, b)
               for b in sc.make_batches(items, hp, 16, seed=3)]
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)
    rng = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batches[i % len(batches)], sub)
    loss = float(metrics["loss"])
    print("trained: loss %.4f in %.0f s" % (loss, time.time() - t0))
    params = state.params

    metrics_out = {"train_steps": args.steps, "final_loss": round(loss, 4),
                   "utterances": []}

    # ---- batch pipeline ----
    batch_res = synthesis.tts_batch(params, cfg, ap, en, DEMO_TEXTS,
                                    max_decoder_steps=200)

    # ---- streaming pipeline (one utterance at a time: the latency case),
    # warmed once so TTFA reflects compiled-program serving ----
    for _ in streaming.tts_stream(params, cfg, ap, en, [DEMO_TEXTS[0]],
                                  max_decoder_steps=200):
        pass
    for i, text in enumerate(DEMO_TEXTS):
        gen = streaming.tts_stream(params, cfg, ap, en, [text],
                                   max_decoder_steps=200)
        t0 = time.time()
        chunks = []
        timeline = []
        for c in gen:
            timeline.append({"at_ms": round((time.time() - t0) * 1e3, 1),
                             "samples": int(c["audio"].shape[1])})
            chunks.append(c)
        audio = np.concatenate([c["audio"] for c in chunks], axis=1)[0]
        n_dec = int(chunks[-1]["decoded_steps"][0])
        wav_stream = audio[:streaming.decoded_samples(cfg, ap, n_dec)]
        wav_batch = batch_res[i]["waveform"]

        ap.save_wav(wav_batch, os.path.join(args.outdir,
                                            "%d_batch.wav" % i))
        ap.save_wav(wav_stream, os.path.join(args.outdir,
                                             "%d_stream.wav" % i))
        with open(os.path.join(args.outdir, "%d.txt" % i), "w",
                  encoding="utf-8") as f:
            f.write(text + "\n")

        # quality: spectral convergence of each waveform vs the model's
        # own predicted (denormalized, power-raised) magnitudes
        from deepvoice3_pytorch_tpu.dsp import reference_model as ref
        lin_norm = batch_res[i]["linear"]      # already denormalized dB?
        # tts_batch returns denormalized dB; rebuild |S|^power
        S = np.power(10.0, (lin_norm + hp.ref_level_db) * 0.05) ** hp.power

        def sc_of(wav, n):
            e = ref._preemphasis(np.asarray(wav[:n * ap.hop_size],
                                            np.float64), hp.preemphasis)
            return ref.spectral_convergence(e, S[:n], hp.fft_size,
                                            hp.hop_size)

        n = min(len(wav_stream), len(wav_batch)) // ap.hop_size
        metrics_out["utterances"].append({
            "text": text,
            "ttfa_ms": timeline[0]["at_ms"],
            "chunk_timeline": timeline,
            "decoded_steps": n_dec,
            "sc_batch": round(float(sc_of(wav_batch, n)), 4),
            "sc_stream": round(float(sc_of(wav_stream, n)), 4),
        })
        print("  [%d] ttfa %.0f ms, %d chunks, sc batch/stream %.4f/%.4f"
              % (i, timeline[0]["at_ms"], len(timeline),
                 metrics_out["utterances"][-1]["sc_batch"],
                 metrics_out["utterances"][-1]["sc_stream"]))

    with open(os.path.join(args.outdir, "metrics.json"), "w") as f:
        json.dump(metrics_out, f, indent=1)
    print("wrote", args.outdir)


if __name__ == "__main__":
    main()
