#!/usr/bin/env python
# coding: utf-8
"""Structural MFU probe (round-3 verdict, weak #6): does reformulating the
kw>1 dilated convs as explicit GEMMs beat XLA's convolution emitter at the
training shapes where the seq2seq half sits at 44% MFU?

Three numerically-equivalent lowerings of every conv in the model
(ops/core.py CONV1D_MODE):
  xla     lax.conv_general_dilated (current default)
  tapsum  kw shifted (B*T,C)x(C,Cout) matmuls summed — no im2col buffer,
          3x activation re-reads from (usually) fused pads
  im2col  one (B*T, kw*C)x(kw*C, Cout) matmul — single big MXU GEMM,
          kw-fold activation materialization

For each mode: compile the FULL train step (b64 bf16, LJSpeech-preset
shapes — the bench_training row) and time it with the materializing-fetch
fence; also time the seq2seq-only step (the 44%-MFU half under test).
Output: one JSON line with ms/step + MFU per mode.

Run on the TPU chip: python tools/conv_gemm_probe.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_step(step_fn, state, batch, rng, n_steps=50):
    import jax

    compiled = step_fn.lower(state, batch, rng).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")
    state2, metrics = compiled(state, batch, rng)
    float(metrics["loss"])                    # materializing warmup fence
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state2, metrics = compiled(state2, batch, rng)
        float(metrics["loss"])
        walls.append((time.perf_counter() - t0) / n_steps)
    del state2
    wall = min(walls)
    mfu = (flops / wall) / 197e12 if np.isfinite(flops) else None
    return {"ms_per_step": round(wall * 1e3, 2),
            "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
            "tflop_per_step": round(flops / 1e12, 3)}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.ops import core
    from deepvoice3_pytorch_tpu.training import trainer
    from bench import _LJ_PARSE

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)

    B, T_lin, T_text = 64, 512, 128
    r, ds = cfg.r, hp.downsample_step
    T_mel, lin_dim = T_lin // ds, hp.fft_size // 2 + 1
    T_dec = T_mel // r
    rs = np.random.RandomState(0)
    batch = {
        "x": rs.randint(1, en.n_vocab, (B, T_text)).astype(np.int32),
        "input_lengths": np.full((B,), T_text, np.int32),
        "mel": rs.rand(B, T_mel, hp.num_mels).astype(np.float32),
        "y": rs.rand(B, T_lin, lin_dim).astype(np.float32),
        "text_positions": np.tile(np.arange(1, T_text + 1),
                                  (B, 1)).astype(np.int32),
        "frame_positions": np.tile(np.arange(1, T_dec + 1),
                                   (B, 1)).astype(np.int32),
        "done": np.zeros((B, T_dec, 1), np.float32),
        "target_lengths": np.full((B,), T_lin, np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    rng = jax.random.PRNGKey(0)

    lc_s2s = lc._replace(train_postnet=False)
    mask_s2s = trainer.trainable_mask(params, cfg, train_postnet=False)

    out = {"shapes": {"B": B, "T_lin": T_lin, "T_text": T_text}}
    for mode in ("xla", "tapsum", "im2col"):
        # the train step re-selects CONV1D_MODE_TRAIN at trace time, so
        # probing a mode means overriding the TRAIN default
        core.CONV1D_MODE_TRAIN = mode
        row = {}
        step_fn = trainer.make_train_step(cfg, lc, opt, mask,
                                          compute_dtype="bfloat16")
        state = trainer.init_train_state(jax.tree.map(jnp.copy, params),
                                         opt)
        row["full"] = time_step(step_fn, state, batch, rng)
        step_fn = trainer.make_train_step(cfg, lc_s2s, opt, mask_s2s,
                                          compute_dtype="bfloat16")
        state = trainer.init_train_state(jax.tree.map(jnp.copy, params),
                                         opt)
        row["seq2seq_only"] = time_step(step_fn, state, batch, rng)
        out[mode] = row
        print(mode, json.dumps(row), file=sys.stderr)
    core.CONV1D_MODE_TRAIN = "tapsum"
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
