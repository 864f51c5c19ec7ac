#!/usr/bin/env python
# coding: utf-8
"""Speaker-adaptation evidence (reference train.py:878-897, README.md:317).

The reference documents adaptation as a first-class workflow: start from a
pretrained (multi-speaker) checkpoint, `--restore-parts` it into a fresh
model, and fine-tune on a new speaker's data with `--speaker-id` assigning
that data a speaker slot. This demo runs that exact workflow end to end on
the deterministic synthetic language (the environment has no speech
corpus; per-speaker ground truth is computable, so adaptation success is
measurable, not just audible):

  1. BASE: train `deepvoice3_multispeaker` (4 voices, formant scales
     1.00/1.18/1.36/1.54) for --base-steps; save a checkpoint.
  2. PRE: synthesize the demo sentence as speaker slot 0 — it sounds like
     base speaker 0 and is FAR from the held-out voice's target.
  3. ADAPT: fresh model, `checkpoint.restore_parts(base)` (the CLI's
     `--restore-parts`), fresh optimizer (`--reset-optimizer`), fine-tune
     --adapt-steps on a corpus rendered in a HELD-OUT voice
     (speaker_scale id 5 = 1.90, never seen in base training) assigned to
     slot 0 (the CLI's `--speaker-id 0`).
  4. POST: synthesize slot 0 again — mel L1 vs the held-out voice's exact
     target must collapse (metrics.json: pre vs post).

Equivalent CLI (the artifact README records it):
  python train.py --data-root=<new-speaker features> --speaker-id=0 \
      --restore-parts=<base checkpoint> --reset-optimizer --preset=...

Artifacts (--outdir, default docs/adaptation_run):
  - loss_curve.json       adaptation-phase loss curve (+ base tail)
  - pre_adaptation.wav    slot 0 before adaptation (base voice 0)
  - post_adaptation.wav   slot 0 after adaptation (the held-out voice)
  - new_speaker_target.wav  the held-out voice's exact rendering
  - adaptation_specs.png  pre | post | target linear spectrograms
  - metrics.json          mel L1 vs the new voice's target, pre vs post
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_BASE_SPEAKERS = 4
HELD_OUT_VOICE = 5          # speaker_scale(5) = 1.90 — outside base range
ADAPT_SLOT = 0              # the slot the new data is assigned to
DEMO_TEXT = "the quiet river moved past the old bridge."


def main():
    pa = argparse.ArgumentParser()
    pa.add_argument("--base-steps", type=int, default=8000)
    pa.add_argument("--adapt-steps", type=int, default=3000)
    pa.add_argument("--outdir", default="docs/adaptation_run")
    pa.add_argument("--batch-size", type=int, default=16)
    pa.add_argument("--corpus-size", type=int, default=60,
                    help="sentences per base speaker")
    pa.add_argument("--adapt-corpus-size", type=int, default=40,
                    help="sentences in the new speaker's dataset")
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
    from deepvoice3_pytorch_tpu.training import checkpoint as ckpt_lib
    from deepvoice3_pytorch_tpu.utils import synthcorpus as sc

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    hp.parse("builder=deepvoice3_multispeaker,n_speakers=%d"
             % N_BASE_SPEAKERS)

    sent = sc.make_sentences(args.corpus_size, seed=11)
    kpr = sc.mean_frames_per_char(sent, hp.sample_rate, hp.hop_size) \
        / (hp.downsample_step * hp.outputs_per_step)
    hp.parse("key_position_rate=%.4f" % kpr)

    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)

    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)

    def run_phase(state, batches, n_steps, tag, seed):
        losses, steps_l = [], []
        rng = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()
        for i in range(1, n_steps + 1):
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batches[(i - 1) % len(batches)],
                                     sub)
            if i % 100 == 0 or i == n_steps:
                losses.append(float(metrics["loss"]))
                steps_l.append(i)
                if not np.isfinite(losses[-1]):
                    raise RuntimeError("non-finite %s loss at step %d"
                                       % (tag, i))
            if i % 2000 == 0:
                print("%s step %d: loss %.4f (%.1f steps/s)" % (
                    tag, i, losses[-1], i / (time.perf_counter() - t0)),
                    flush=True)
        return state, steps_l, losses

    def synth_slot0(params):
        """Demo sentence as speaker slot 0 -> (mel, linear, dec_len)."""
        x, pos, lengths = _prepare_batch(en, [DEMO_TEXT], 0.0, pad_to=64)
        x, pos, lengths = (jnp.asarray(x), jnp.asarray(pos),
                           jnp.asarray(lengths))
        sids = jnp.asarray([ADAPT_SLOT], dtype=jnp.int32)
        MAX_STEPS = 200
        mel, pin, align, done, dec_len = _decode_prog(
            params, cfg, x, pos, lengths, sids,
            max_decoder_steps=MAX_STEPS, early_exit=True, fused=True)
        lens = np.asarray(dec_len)
        n_bucket = min(MAX_STEPS,
                       _round_up(int(lens.max()) + SLACK_DEC_STEPS,
                                 BUCKET_DEC_STEPS))
        linear = np.asarray(_postnet_prog(
            params, cfg, pin[:, :n_bucket * cfg.r], sids))
        return np.asarray(mel)[0], linear[0], int(lens[0])

    time_up = getattr(cfg.converter, "time_upsampling", 1)
    tgt_lin, tgt_mel = ap.batch_features(
        [sc.synth_wav(DEMO_TEXT, hp.sample_rate, hp.hop_size,
                      speaker_id=HELD_OUT_VOICE)])[0]
    tgt_mel_ds = tgt_mel[::hp.downsample_step]
    # the base voice occupying the slot pre-adaptation: its own target is
    # the natural L1 FLOOR of this model/corpus (predictions never reach 0
    # L1 even on a trained voice) — the adaptation bar is reaching that
    # floor on the NEW voice, not reaching zero
    base_mel_ds = ap.batch_features(
        [sc.synth_wav(DEMO_TEXT, hp.sample_rate, hp.hop_size,
                      speaker_id=ADAPT_SLOT)])[0][1][::hp.downsample_step]

    def mel_l1_vs(mel_pred, n_dec, target_ds):
        n = min(n_dec * cfg.r, len(target_ds))
        return float(np.abs(mel_pred[:n] - target_ds[:n]).mean())

    def mel_l1_vs_new_target(mel_pred, n_dec):
        return mel_l1_vs(mel_pred, n_dec, tgt_mel_ds)

    # ---- phase 1: base multi-speaker training ----
    base_texts, base_spk = [], []
    for s in range(N_BASE_SPEAKERS):
        base_texts += sent
        base_spk += [s] * len(sent)
    items = sc.build_items(base_texts, hp, ap, en, speaker_ids=base_spk)
    base_batches = [jax.tree.map(jnp.asarray, b)
                    for b in sc.make_batches(items, hp, args.batch_size,
                                             seed=11)]
    print("base: %d device batches" % len(base_batches), flush=True)
    state = trainer.init_train_state(params, opt)
    state, base_steps_l, base_losses = run_phase(
        state, base_batches, args.base_steps, "base", seed=0)

    import tempfile
    ckpt_dir = os.path.join(tempfile.gettempdir(), "dv3_adaptation_ckpt")
    base_ckpt = ckpt_lib.save_checkpoint(
        ckpt_dir, state.params, state.opt_state, args.base_steps, 1)
    print("base checkpoint:", base_ckpt, flush=True)

    # ---- pre-adaptation eval ----
    mel_pre, lin_pre, n_pre = synth_slot0(state.params)
    pre_l1 = mel_l1_vs_new_target(mel_pre, n_pre)
    own_floor_l1 = mel_l1_vs(mel_pre, n_pre, base_mel_ds)

    # ---- phase 2: adaptation (restore_parts + fresh optimizer) ----
    cfg2, params2 = build_model(hp, en.n_vocab)
    params2 = ckpt_lib.restore_parts(base_ckpt, params2)   # --restore-parts
    adapt_sent = sc.make_sentences(args.adapt_corpus_size, seed=23)
    adapt_items = sc.build_items(
        adapt_sent, hp, ap, en,
        speaker_ids=[ADAPT_SLOT] * len(adapt_sent),        # --speaker-id
        voice_ids=[HELD_OUT_VOICE] * len(adapt_sent))
    adapt_batches = [jax.tree.map(jnp.asarray, b)
                     for b in sc.make_batches(adapt_items, hp,
                                              args.batch_size, seed=23)]
    print("adapt: %d device batches" % len(adapt_batches), flush=True)
    state2 = trainer.init_train_state(params2, opt)        # --reset-optimizer
    state2, adapt_steps_l, adapt_losses = run_phase(
        state2, adapt_batches, args.adapt_steps, "adapt", seed=1)

    # ---- post-adaptation eval + artifacts ----
    mel_post, lin_post, n_post = synth_slot0(state2.params)
    post_l1 = mel_l1_vs_new_target(mel_post, n_post)

    def save_wav_from_linear(linear, n_dec, name):
        n_lin = n_dec * cfg.r * time_up
        wav = np.asarray(ap.inv_spectrogram_batch(
            jnp.asarray(linear[None, :n_lin])))[0]
        ap.save_wav(wav, os.path.join(args.outdir, name))

    save_wav_from_linear(lin_pre, n_pre, "pre_adaptation.wav")
    save_wav_from_linear(lin_post, n_post, "post_adaptation.wav")
    ap.save_wav(sc.synth_wav(DEMO_TEXT, hp.sample_rate, hp.hop_size,
                             speaker_id=HELD_OUT_VOICE),
                os.path.join(args.outdir, "new_speaker_target.wav"))
    with open(os.path.join(args.outdir, "demo_text.txt"), "w") as f:
        f.write(DEMO_TEXT + "\n")
    with open(os.path.join(args.outdir, "loss_curve.json"), "w") as f:
        json.dump({"base": {"steps": base_steps_l, "loss": base_losses},
                   "adapt": {"steps": adapt_steps_l,
                             "loss": adapt_losses}}, f)

    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(13, 3.2), sharey=True)
    panels = [(lin_pre[:n_pre * cfg.r * time_up], "pre-adaptation"),
              (lin_post[:n_post * cfg.r * time_up], "post-adaptation"),
              (tgt_lin[:n_post * cfg.r * time_up], "held-out target")]
    for ax, (spec, name) in zip(axes, panels):
        ax.imshow(np.asarray(spec).T, aspect="auto", origin="lower",
                  interpolation="none", cmap="magma")
        ax.set_title(name)
    fig.tight_layout()
    fig.savefig(os.path.join(args.outdir, "adaptation_specs.png"), dpi=110)
    plt.close(fig)

    out = {
        "base_steps": args.base_steps,
        "adapt_steps": args.adapt_steps,
        "held_out_voice_scale": sc.speaker_scale(HELD_OUT_VOICE),
        "base_voice_scales": [sc.speaker_scale(s)
                              for s in range(N_BASE_SPEAKERS)],
        "demo_text": DEMO_TEXT,
        "base_final_loss": base_losses[-1],
        "adapt_final_loss": adapt_losses[-1],
        "mel_l1_vs_new_target_pre": round(pre_l1, 4),
        "mel_l1_vs_new_target_post": round(post_l1, 4),
        # the trained-voice L1 floor: the base model's fit of the voice it
        # actually trained on (slot 0 pre-adaptation vs that voice's target)
        "mel_l1_own_voice_floor": round(own_floor_l1, 4),
        # adaptation succeeded iff the new voice is now fit about as well
        # as a TRAINED voice, and distinctly better than before
        "adaptation_learned": bool(post_l1 < 1.25 * own_floor_l1
                                   and post_l1 < 0.75 * pre_l1),
    }
    with open(os.path.join(args.outdir, "metrics.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
