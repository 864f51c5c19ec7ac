#!/usr/bin/env python
# coding: utf-8
"""Measure the Pallas tap-accumulating conv kernel on the full b64 bf16
train step (round-5 structural probe: the attainable-MFU bound priced
XLA tapsum's per-tap HBM round-trips as the largest addressable loss —
tools/mfu_bound.py, DESIGN.md §4.1).

Compares trace-time conv lowerings of the identical step:
  * tapsum — kw shifted GEMMs summed by XLA (round-4 default);
  * pallas — ops/conv_pallas.py: whole tap sum in one kernel, f32
    accumulator on-core, one HBM read of x / one write of y, custom_vjp
    with the same treatment for dgrad and wgrad.

Run on the TPU host:  python tools/conv_pallas_probe.py [batch]
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
from deepvoice3_pytorch_tpu.training import trainer  # noqa: E402


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)

    T_text, T_lin = 128, 512
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
    losses = {}
    for mode in ("tapsum", "pallas"):
        step_fn = trainer.make_train_step(cfg, lc, opt, mask,
                                          compute_dtype="bfloat16",
                                          conv_mode=mode)
        state = trainer.init_train_state(jax.tree.map(jnp.copy, params),
                                         opt)
        print("lowering %s ..." % mode, flush=True)
        lowered = step_fn.lower(state, batch, rng)
        print("compiling %s ..." % mode, flush=True)
        compiled = lowered.compile()
        print("compiled %s" % mode, flush=True)
        flops = float(compiled.cost_analysis()["flops"])
        state, metrics = compiled(state, batch, rng)
        losses[mode] = float(metrics["loss"])    # warmup fence + equivalence
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(50):
                state, metrics = compiled(state, batch, rng)
            float(metrics["loss"])
            walls.append((time.perf_counter() - t0) / 50)
        ms = sorted(walls)[1] * 1e3      # median-of-3
        results[mode] = (ms, flops)
        print("%-8s %.3f ms/step  (runs %s)  mfu %.1f%%  loss@1 %.6f"
              % (mode, ms, ["%.3f" % (w * 1e3) for w in walls],
                 100 * flops / (ms / 1e3) / 197e12, losses[mode]),
              flush=True)
    d = results["tapsum"][0] - results["pallas"][0]
    print("pallas saves %.3f ms/step (%.1f%%); step-1 loss delta %.2e"
          % (d, 100 * d / results["tapsum"][0],
             abs(losses["tapsum"] - losses["pallas"])))


if __name__ == "__main__":
    main()
