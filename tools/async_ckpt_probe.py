#!/usr/bin/env python
# coding: utf-8
"""Measure what async checkpointing buys on the real chip.

Three timings at the LJSpeech-preset bench shapes (batch 16, the
reference recipe — reference train.py:788-809 saves synchronously in the
step loop):

  save_sync_s     wall time of a synchronous save_checkpoint (device->host
                  fetch + serialize + write; the stall the reference-style
                  loop pays every checkpoint_interval)
  save_submit_s   time save_checkpoint(async_save=True) takes to return
                  (HBM snapshot dispatch only -- the stall the step loop
                  now pays)
  overlap         N train steps launched immediately after the async
                  submit, then wait_pending_saves(): total wall vs
                  (steps-only wall + save_sync_s). Near-max(save, steps)
                  total = the write really runs under the compute.

Prints one JSON object; results recorded in DESIGN.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import argparse

    pa = argparse.ArgumentParser()
    pa.add_argument("--batch", type=int, default=16)
    pa.add_argument("--steps", type=int, default=400)
    pa.add_argument("--outdir", default="/tmp/async_ckpt_probe")
    args = pa.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("DV3_PRNG_IMPL", "rbg"))

    from bench import _LJ_PARSE
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.training import trainer, checkpoint as ckpt

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    lr_fn = trainer.make_lr_fn(hp)
    opt = trainer.make_optimizer(hp, lr_fn)
    lc = trainer.loss_config_from_hparams(hp)
    mask = trainer.trainable_mask(params, cfg)
    fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)

    B = args.batch
    r, ds = cfg.r, hp.downsample_step
    T_lin, T_text = 512, 128
    T_mel, lin_dim = T_lin // ds, hp.fft_size // 2 + 1
    T_dec = T_mel // r
    rs = np.random.RandomState(0)
    batch = jax.tree.map(jnp.asarray, {
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
    })
    rng = jax.random.PRNGKey(0)
    compiled = fn.lower(state, batch, rng).compile()

    def run_steps(state, n):
        m = None
        for _ in range(n):
            state, m = compiled(state, batch, rng)
        float(m["loss"])  # materializing fence
        return state

    state = run_steps(state, 5)  # warm

    os.makedirs(args.outdir, exist_ok=True)
    n_bytes = sum(np.dtype(x.dtype).itemsize * x.size
                  for x in jax.tree.leaves(state.params)) + \
        sum(np.dtype(x.dtype).itemsize * x.size
            for x in jax.tree.leaves(state.opt_state))

    # steps-only wall
    t0 = time.perf_counter()
    state = run_steps(state, args.steps)
    steps_s = time.perf_counter() - t0

    # synchronous save stall
    t0 = time.perf_counter()
    ckpt.save_checkpoint(args.outdir, state.params, state.opt_state, 1, 0)
    save_sync_s = time.perf_counter() - t0

    # async: submit stall + overlapped total
    t0 = time.perf_counter()
    ckpt.save_checkpoint(args.outdir, state.params, state.opt_state, 2, 0,
                         async_save=True)
    save_submit_s = time.perf_counter() - t0
    state = run_steps(state, args.steps)
    ckpt.wait_pending_saves()
    async_total_s = time.perf_counter() - t0

    out = {
        "batch": B, "steps": args.steps,
        "checkpoint_mb": round(n_bytes / 1e6, 1),
        "steps_only_s": round(steps_s, 3),
        "save_sync_s": round(save_sync_s, 3),
        "save_submit_s": round(save_submit_s, 3),
        "async_save_plus_steps_s": round(async_total_s, 3),
        "sync_would_be_s": round(steps_s + save_sync_s, 3),
        "overlap_efficiency": round(
            (steps_s + save_sync_s - async_total_s) / save_sync_s, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
