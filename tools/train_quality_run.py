#!/usr/bin/env python
# coding: utf-8
"""Train-to-quality evidence run (round-2 verdict weak #4 / next #3).

This environment has no natural-speech corpus (zero egress), so the run
uses the deterministic synthetic language (utils/synthcorpus.py): every
character maps to a fixed spectral unit with a fixed duration, making
text -> features an exact, learnable TTS problem. The run demonstrates,
with committed artifacts, that the framework actually LEARNS the TTS task
the reference demonstrates with its released checkpoints
(reference README.md:51-53): the attention diagonal forms, the loss
converges, the done latch fires at text-determined lengths, and greedy
synthesis reconstructs the target spectra of NOVEL sentences.

Artifacts written to --outdir (committed to docs/quality_run/):
  - loss_curve.png + loss_curve.json      (loss every 50 steps)
  - align_step{N}.png                     (greedy-decode alignment at
                                           milestone steps: diagonal
                                           emerging from uniform)
  - eval_step{N}_*.wav                    (Griffin-Lim audio at the final
                                           step; in-corpus + novel texts)
  - spec_step{N}_*.png                    (predicted vs target linear
                                           spectrogram, final step)
  - metrics.json                          (timestamp ratio, decoded
                                           lengths, mel L1 vs target)

The batches are pre-staged on device once (the dev harness's ~30 MB/s
host->device tunnel would otherwise cap training at ~3.5 steps/s; a
PCIe-attached chip does not have this problem, BASELINE.md).

Usage:
  python tools/train_quality_run.py --steps 30000 --outdir docs/quality_run
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

MILESTONES = (0, 250, 1000, 4000, 10000)

EVAL_IN_CORPUS = 2      # first N eval texts come from the training corpus
EVAL_TEXTS_NOVEL = [
    "the quiet river moved past the old bridge.",
    "small birds sing over the green hills.",
]


def plot_alignment(alignment, path, title=""):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 4))
    im = ax.imshow(alignment.T, aspect="auto", origin="lower",
                   interpolation="none", cmap="magma")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("decoder step")
    ax.set_ylabel("text position")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_specs(pred, target, path, title=""):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(8, 5), sharex=True)
    for ax, s, name in zip(axes, (pred, target), ("predicted", "target")):
        im = ax.imshow(s.T, aspect="auto", origin="lower",
                       interpolation="none", cmap="magma")
        ax.set_ylabel(name)
        fig.colorbar(im, ax=ax)
    axes[0].set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_loss(steps, losses, path):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 3.5))
    ax.plot(steps, losses, lw=1.0)
    ax.set_xlabel("step")
    ax.set_ylabel("total loss")
    ax.set_yscale("log")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def main():
    pa = argparse.ArgumentParser()
    pa.add_argument("--steps", type=int, default=30000)
    pa.add_argument("--outdir", default="docs/quality_run")
    pa.add_argument("--batch-size", type=int, default=16)
    pa.add_argument("--corpus-size", type=int, default=120)
    pa.add_argument("--ckpt-out", default="",
                    help="optionally save the final checkpoint here")
    pa.add_argument("--preset", default="",
                    help="preset JSON (e.g. presets/nyanko_ljspeech.json); "
                         "default: the bench's LJSpeech deepvoice3 config")
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
        _decode_prog, _postnet_prog, _prepare_batch, _round_up,
        BUCKET_DEC_STEPS, SLACK_DEC_STEPS)
    from deepvoice3_pytorch_tpu.training import trainer
    from deepvoice3_pytorch_tpu.utils import synthcorpus as sc

    hp = default_hparams()
    if args.preset:
        with open(args.preset) as f:
            hp.parse_json(f.read())
    else:
        hp.parse(_LJ_PARSE)

    # ---- corpus + the timestamp-ratio calibration the reference does with
    # compute_timestamp_ratio.py (reference compute_timestamp_ratio.py:38-54)
    texts = sc.make_sentences(args.corpus_size, seed=7)
    ap = AudioProcessor(hp)
    items = sc.build_items(texts, hp, ap, en)
    n_out = sum(len(it["mel"]) for it in items)
    n_in = sum(len(it["text"]) for it in items)
    ratio = (n_out / hp.downsample_step / hp.outputs_per_step) / n_in
    print("timestamp ratio (key_position_rate): %.4f" % ratio, flush=True)
    hp.parse("key_position_rate=%.4f" % ratio)

    cfg, params = build_model(hp, en.n_vocab)

    batches = [jax.tree.map(jnp.asarray, b)
               for b in sc.make_batches(items, hp, args.batch_size, seed=7)]
    print("pre-staged %d device batches" % len(batches), flush=True)

    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)

    eval_texts = texts[:EVAL_IN_CORPUS] + EVAL_TEXTS_NOVEL
    x, pos, lengths = _prepare_batch(en, eval_texts, 0.0, pad_to=64)
    x, pos, lengths = jnp.asarray(x), jnp.asarray(pos), jnp.asarray(lengths)
    MAX_STEPS = 200

    def snapshot(step_no, params, final=False):
        mel, pin, align, done, dec_len = _decode_prog(
            params, cfg, x, pos, lengths, None,
            max_decoder_steps=MAX_STEPS, early_exit=True, fused=True)
        lens = np.asarray(dec_len)
        n_dec = int(lens[0])
        plot_alignment(
            np.asarray(align[0])[:max(n_dec, 8), :int(lengths[0])],
            os.path.join(args.outdir, "align_step%06d.png" % step_no),
            title="greedy alignment, step %d" % step_no)
        info = {"step": step_no, "decoded_steps": [int(n) for n in lens],
                "done_latched": bool(lens.max() < MAX_STEPS)}
        if final:
            n_bucket = min(MAX_STEPS,
                           _round_up(int(lens.max()) + SLACK_DEC_STEPS,
                                     BUCKET_DEC_STEPS))
            linear = _postnet_prog(params, cfg, pin[:, :n_bucket * cfg.r],
                                   None)
            wavs = np.asarray(ap.inv_spectrogram_device(linear))
            time_up = getattr(cfg.converter, "time_upsampling", 1)
            mel_l1 = []
            for i, text in enumerate(eval_texts):
                n_lin = int(lens[i]) * cfg.r * time_up
                n_wav = n_lin * hp.hop_size
                tag = "incorpus%d" % i if i < EVAL_IN_CORPUS \
                    else "novel%d" % (i - EVAL_IN_CORPUS)
                ap.save_wav(wavs[i][:n_wav], os.path.join(
                    args.outdir, "eval_step%06d_%s.wav" % (step_no, tag)))
                # predicted-vs-target spectrogram for the in-corpus texts
                # (novel texts have targets too — the language is
                # deterministic — so compare them all)
                tgt_wav = sc.synth_wav(text, hp.sample_rate, hp.hop_size)
                tgt_lin, tgt_mel = ap.batch_features([tgt_wav])[0]
                n_cmp = min(n_lin, len(tgt_lin))
                plot_specs(np.asarray(linear[i])[:n_cmp], tgt_lin[:n_cmp],
                           os.path.join(args.outdir,
                                        "spec_step%06d_%s.png"
                                        % (step_no, tag)),
                           title="%s (step %d)" % (tag, step_no))
                n_melc = min(int(lens[i]) * cfg.r,
                             len(tgt_mel) // hp.downsample_step)
                pred_mel = np.asarray(mel[i])[:n_melc]
                mel_l1.append(float(np.abs(
                    pred_mel - tgt_mel[::hp.downsample_step][:n_melc])
                    .mean()))
            info["eval_mel_l1_vs_target"] = [round(v, 4) for v in mel_l1]
        return info

    losses, loss_steps = [], []
    snaps = [snapshot(0, state.params)]
    print("snapshot 0 done", flush=True)

    rng = jax.random.PRNGKey(0)
    milestones = set(m for m in MILESTONES if 0 < m < args.steps)
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        rng, sub = jax.random.split(rng)
        state, metrics = step_fn(state, batches[(i - 1) % len(batches)], sub)
        if i % 50 == 0 or i == args.steps:
            losses.append(float(metrics["loss"]))
            loss_steps.append(i)
            if not np.isfinite(losses[-1]):
                raise RuntimeError("non-finite loss at step %d" % i)
        if i in milestones:
            snaps.append(snapshot(i, state.params))
            print("step %d: loss %.4f (%.1f steps/s)" % (
                i, losses[-1], i / (time.perf_counter() - t0)), flush=True)

    wall = time.perf_counter() - t0
    snaps.append(snapshot(args.steps, state.params, final=True))
    plot_loss(loss_steps, losses, os.path.join(args.outdir,
                                               "loss_curve.png"))
    with open(os.path.join(args.outdir, "loss_curve.json"), "w") as f:
        json.dump({"steps": loss_steps, "loss": losses}, f)

    metrics_out = {
        "steps": args.steps,
        "batch_size": args.batch_size,
        "corpus_utterances": len(items),
        "key_position_rate": round(ratio, 4),
        "final_loss": losses[-1],
        "steps_per_s": round(args.steps / wall, 1),
        "snapshots": snaps,
        "eval_texts": eval_texts,
        "note": ("synthetic-language corpus (utils/synthcorpus.py); no "
                 "natural-speech data exists in this zero-egress build "
                 "environment — see docs/quality_run/README.md"),
    }
    with open(os.path.join(args.outdir, "metrics.json"), "w") as f:
        json.dump(metrics_out, f, indent=2)
    print(json.dumps({k: v for k, v in metrics_out.items()
                      if k != "snapshots"}), flush=True)

    if args.ckpt_out:
        from deepvoice3_pytorch_tpu.training import checkpoint as ckpt_lib
        os.makedirs(args.ckpt_out, exist_ok=True)
        path = ckpt_lib.save_checkpoint(args.ckpt_out, state.params,
                                        state.opt_state, args.steps, 0)
        print("checkpoint:", path)


if __name__ == "__main__":
    main()
