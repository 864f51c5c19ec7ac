#!/usr/bin/env python
# coding: utf-8
"""Measure the dropout-mask implementation on the full b64 bf16 train step
(round-4 verdict #4's prescribed attack: the round-3 ablation priced
dropout noise at 1.2 ms/step — 6%).

Two implementations of ops.core.dropout, identical inverted-dropout
semantics (keep-prob quantized to 1/65536 in the bits16 path):
  * bernoulli — jax.random.bernoulli: 32 random bits per element,
    uint->f32 conversion, f32 compare;
  * bits16    — jax.random.bits(uint16) < round(keep * 2^16): a quarter
    of the generated bits, one integer compare.

Run on the TPU host:  python tools/dropout_bits_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax          # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_default_prng_impl", "rbg")

from bench import _LJ_PARSE  # noqa: E402
from deepvoice3_pytorch_tpu.frontend import en  # noqa: E402
from deepvoice3_pytorch_tpu.hparams import default_hparams  # noqa: E402
from deepvoice3_pytorch_tpu.model_builder import build_model  # noqa: E402
from deepvoice3_pytorch_tpu.ops import core  # noqa: E402
from deepvoice3_pytorch_tpu.training import trainer  # noqa: E402


def main():
    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)

    B, T_text, T_lin = 64, 128, 512
    ds, r = hp.downsample_step, cfg.r
    T_mel, T_dec = T_lin // ds, T_lin // ds // r
    rs = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
        "x": rs.randint(1, en.n_vocab, (B, T_text)).astype(np.int32),
        "input_lengths": np.full((B,), T_text, np.int32),
        "mel": rs.rand(B, T_mel, hp.num_mels).astype(np.float32),
        "y": rs.rand(B, T_lin, hp.fft_size // 2 + 1).astype(np.float32),
        "text_positions": np.tile(np.arange(1, T_text + 1),
                                  (B, 1)).astype(np.int32),
        "frame_positions": np.tile(np.arange(1, T_dec + 1),
                                   (B, 1)).astype(np.int32),
        "done": np.zeros((B, T_dec, 1), np.float32),
        "target_lengths": np.full((B,), T_lin, np.int32),
    })
    rng = jax.random.PRNGKey(0)

    results = {}
    for impl in ("bernoulli", "bits16"):
        core.DROPOUT_IMPL = impl
        step_fn = trainer.make_train_step(cfg, lc, opt, mask,
                                          compute_dtype="bfloat16")
        state = trainer.init_train_state(jax.tree.map(jnp.copy, params),
                                         opt)
        compiled = step_fn.lower(state, batch, rng).compile()
        flops = float(compiled.cost_analysis()["flops"])
        state, metrics = compiled(state, batch, rng)
        float(metrics["loss"])    # warmup fence
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(50):
                state, metrics = compiled(state, batch, rng)
            float(metrics["loss"])
            walls.append((time.perf_counter() - t0) / 50)
        ms = sorted(walls)[1] * 1e3      # median-of-3
        results[impl] = (ms, flops)
        print("%-10s %.3f ms/step  (runs %s)  mfu %.1f%%"
              % (impl, ms, ["%.3f" % (w * 1e3) for w in walls],
                 100 * flops / (ms / 1e3) / 197e12), flush=True)
    d = results["bernoulli"][0] - results["bits16"][0]
    print("bits16 saves %.3f ms/step (%.1f%%)"
          % (d, 100 * d / results["bernoulli"][0]))


if __name__ == "__main__":
    main()
