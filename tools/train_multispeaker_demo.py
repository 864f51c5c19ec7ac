#!/usr/bin/env python
# coding: utf-8
"""Multi-speaker learning evidence (deepvoice3_multispeaker builder).

Extends docs/quality_run with the speaker-conditioning story: a 4-speaker
synthetic-language corpus where each speaker scales the formant
frequencies (utils/synthcorpus.speaker_scale — same text timing,
different "voice"). After training, the SAME sentence is synthesized
once per speaker id; speaker conditioning works iff the predicted
spectra shift with the requested speaker and match that speaker's exact
target (the language is deterministic, so per-speaker ground truth is
computable for novel text too).

Artifacts (--outdir, default docs/quality_run_multispeaker):
  - loss_curve.json
  - speaker_specs.png      one row per speaker id: predicted | target
  - speaker{N}.wav         the demo sentence synthesized AS speaker N
                           (predicted linear -> Griffin-Lim), plus
                           speaker{N}_target.wav — the deterministic
                           language's exact rendering for that speaker
  - metrics.json           per-speaker mel L1 vs own target AND vs
                           speaker 0's target (conditioning is learned
                           iff own << cross)

Usage: python tools/train_multispeaker_demo.py --steps 12000
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_SPEAKERS = 4
DEMO_TEXT = "the quiet river moved past the old bridge."


def main():
    pa = argparse.ArgumentParser()
    pa.add_argument("--steps", type=int, default=12000)
    pa.add_argument("--outdir", default="docs/quality_run_multispeaker")
    pa.add_argument("--batch-size", type=int, default=16)
    pa.add_argument("--corpus-size", type=int, default=60,
                    help="sentences per speaker")
    args = pa.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import _LJ_PARSE
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.synthesis import (
        _decode_prog, _postnet_prog, _round_up, _prepare_batch,
        BUCKET_DEC_STEPS, SLACK_DEC_STEPS)
    from deepvoice3_pytorch_tpu.training import trainer
    from deepvoice3_pytorch_tpu.utils import synthcorpus as sc

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    hp.parse("builder=deepvoice3_multispeaker,n_speakers=%d" % N_SPEAKERS)

    sent = sc.make_sentences(args.corpus_size, seed=11)
    texts, spk = [], []
    for s in range(N_SPEAKERS):
        texts += sent
        spk += [s] * len(sent)
    kpr = sc.mean_frames_per_char(sent, hp.sample_rate, hp.hop_size) \
        / (hp.downsample_step * hp.outputs_per_step)
    hp.parse("key_position_rate=%.4f" % kpr)

    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    items = sc.build_items(texts, hp, ap, en, speaker_ids=spk)
    batches = [jax.tree.map(jnp.asarray, b)
               for b in sc.make_batches(items, hp, args.batch_size, seed=11)]
    print("pre-staged %d device batches (multi-speaker)" % len(batches),
          flush=True)

    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)

    losses, steps_l = [], []
    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batches[(i - 1) % len(batches)], sub)
        if i % 100 == 0 or i == args.steps:
            losses.append(float(metrics["loss"]))
            steps_l.append(i)
            if not np.isfinite(losses[-1]):
                raise RuntimeError("non-finite loss at step %d" % i)
        if i % 4000 == 0:
            print("step %d: loss %.4f (%.1f steps/s)" % (
                i, losses[-1], i / (time.perf_counter() - t0)), flush=True)

    with open(os.path.join(args.outdir, "loss_curve.json"), "w") as f:
        json.dump({"steps": steps_l, "loss": losses}, f)

    # --- synthesize DEMO_TEXT once per speaker id ---
    x, pos, lengths = _prepare_batch(en, [DEMO_TEXT] * N_SPEAKERS, 0.0,
                                     pad_to=64)
    x, pos, lengths = jnp.asarray(x), jnp.asarray(pos), jnp.asarray(lengths)
    sids = jnp.arange(N_SPEAKERS, dtype=jnp.int32)
    MAX_STEPS = 200
    mel, pin, align, done, dec_len = _decode_prog(
        state.params, cfg, x, pos, lengths, sids,
        max_decoder_steps=MAX_STEPS, early_exit=True, fused=True)
    lens = np.asarray(dec_len)
    n_bucket = min(MAX_STEPS, _round_up(int(lens.max()) + SLACK_DEC_STEPS,
                                        BUCKET_DEC_STEPS))
    linear = np.asarray(_postnet_prog(state.params, cfg,
                                      pin[:, :n_bucket * cfg.r], sids))
    mel = np.asarray(mel)

    # per-speaker exact targets for the demo text
    tgt = {}
    for s in range(N_SPEAKERS):
        w = sc.synth_wav(DEMO_TEXT, hp.sample_rate, hp.hop_size,
                         speaker_id=s)
        tgt[s] = ap.batch_features([w])[0]      # (linear, mel)

    time_up = getattr(cfg.converter, "time_upsampling", 1)
    own_l1, cross_l1, rows = [], [], []
    for s in range(N_SPEAKERS):
        n_mel = min(int(lens[s]) * cfg.r,
                    len(tgt[s][1]) // hp.downsample_step)
        pm = mel[s][:n_mel]
        own = float(np.abs(
            pm - tgt[s][1][::hp.downsample_step][:n_mel]).mean())
        n0 = min(n_mel, len(tgt[0][1][::hp.downsample_step]))
        cross = float(np.abs(
            pm[:n0] - tgt[0][1][::hp.downsample_step][:n0]).mean())
        own_l1.append(round(own, 4))
        cross_l1.append(round(cross, 4))
        n_lin = int(lens[s]) * cfg.r * time_up
        rows.append((linear[s][:n_lin], tgt[s][0][:n_lin]))

    # per-speaker audio: predicted spectrum vocoded on-device, next to the
    # deterministic language's exact rendering of the same sentence
    for s in range(N_SPEAKERS):
        n_lin = int(lens[s]) * cfg.r * time_up
        wav = np.asarray(ap.inv_spectrogram_batch(
            jnp.asarray(linear[s:s + 1, :n_lin])))[0]
        ap.save_wav(wav, os.path.join(args.outdir, "speaker%d.wav" % s))
        ap.save_wav(sc.synth_wav(DEMO_TEXT, hp.sample_rate, hp.hop_size,
                                 speaker_id=s),
                    os.path.join(args.outdir, "speaker%d_target.wav" % s))
    with open(os.path.join(args.outdir, "demo_text.txt"), "w") as f:
        f.write(DEMO_TEXT + "\n")

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(N_SPEAKERS, 2, figsize=(10, 2.2 * N_SPEAKERS),
                             sharex=True)
    for s, (prd, t) in enumerate(rows):
        for j, (spec, name) in enumerate(((prd, "predicted"),
                                          (t, "target"))):
            ax = axes[s][j]
            ax.imshow(np.asarray(spec).T, aspect="auto", origin="lower",
                      interpolation="none", cmap="magma")
            ax.set_ylabel("spk %d" % s if j == 0 else "")
            if s == 0:
                ax.set_title(name)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "speaker_specs.png"), dpi=110)
    plt.close(fig)

    out = {
        "steps": args.steps,
        "n_speakers": N_SPEAKERS,
        "demo_text": DEMO_TEXT,
        "final_loss": losses[-1],
        "decoded_steps": [int(n) for n in lens],
        "mel_l1_vs_own_speaker_target": own_l1,
        "mel_l1_vs_speaker0_target": cross_l1,
        "conditioning_learned":
            all(o < c for o, c in zip(own_l1[1:], cross_l1[1:])),
    }
    with open(os.path.join(args.outdir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
