#!/usr/bin/env python
# coding: utf-8
"""Train-step time budget on the real chip (round-2 verdict #4).

"50% MFU" is a number, not an understanding — this measures WHERE the
step time goes, by ablation (the only robust attribution on a backend
without a trace viewer): each variant is separately compiled and fenced
(materializing fetch, best-of-3), and component costs fall out of
differences between variants. Variants at the LJSpeech-preset bench
shapes (bench.py bench_training):

  full            complete step: fwd + all losses + bwd + clip + Adam
  no_guided       guided attention term off
  seq2seq_only    converter fwd+bwd removed   (lc.train_postnet=False)
  postnet_only    seq2seq fwd+bwd removed     (lc.train_seq2seq=False)
  fwd_loss        forward + loss only, no gradient (jit of value)
  fwd_grad        forward + backward, no optimizer update

Optionally captures a jax.profiler trace for each full step
(--trace-dir) for offline inspection.

Prints one JSON object with ms/step and derived component costs; results
are recorded in BASELINE.md / DESIGN.md.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _bench_one(run, fence, n=50):
    run()
    fence()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            run()
        fence()
        walls.append((time.perf_counter() - t0) / n)
    return min(walls) * 1000.0


def main():
    import argparse

    pa = argparse.ArgumentParser()
    pa.add_argument("--batch", type=int, default=64)
    pa.add_argument("--dtype", default="bfloat16")
    pa.add_argument("--trace-dir", default="")
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
    from deepvoice3_pytorch_tpu.training import trainer

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    lr_fn = trainer.make_lr_fn(hp)
    opt = trainer.make_optimizer(hp, lr_fn)

    B = args.batch
    r, ds = cfg.r, hp.downsample_step
    T_lin, T_text = 512, 128
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
    rng = jax.random.PRNGKey(0)
    out = {"batch": B, "dtype": args.dtype,
           "shapes": {"T_lin": T_lin, "T_text": T_text, "r": r}}

    def step_variant(name, lc_kw=None, mask_kw=None):
        lc = trainer.loss_config_from_hparams(hp)
        if lc_kw:
            lc = lc._replace(**lc_kw)    # NamedTuple
        mask = trainer.trainable_mask(params, cfg, **(mask_kw or {}))
        fn = trainer.make_train_step(cfg, lc, opt, mask,
                                     compute_dtype=args.dtype)
        state = trainer.init_train_state(jax.tree.map(jnp.copy, params), opt)
        compiled = fn.lower(state, batch, rng).compile()
        try:
            flops = float(compiled.cost_analysis()["flops"])
        except Exception:
            flops = float("nan")
        holder = {"s": state, "m": None}

        def run():
            holder["s"], holder["m"] = compiled(holder["s"], batch, rng)

        def fence():
            float(holder["m"]["loss"])

        ms = _bench_one(run, fence)
        out[name] = {"ms_per_step": round(ms, 3),
                     "flops_per_step": flops,
                     "mfu_vs_bf16_peak": round(
                         flops / (ms / 1e3) / 197e12, 4)
                     if np.isfinite(flops) else None}
        print("#", name, out[name], flush=True)
        return ms

    ms_full = step_variant("full")
    ms_ng = step_variant("no_guided", lc_kw={"use_guided_attention": False})
    ms_s2s = step_variant("seq2seq_only", lc_kw={"train_postnet": False},
                          mask_kw={"train_postnet": False})
    # NOTE: postnet_only is structurally impossible at this preset
    # (use_decoder_state_for_postnet_input: the converter consumes decoder
    # states, which don't exist without the seq2seq — train.py refuses the
    # same combination), so the converter cost comes from full - seq2seq_only.
    ms_post = None

    # forward-only and forward+grad variants share the full loss config
    lc = trainer.loss_config_from_hparams(hp)
    from deepvoice3_pytorch_tpu.builder import model_forward

    cast = (lambda t: jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, t)) \
        if args.dtype == "bfloat16" else (lambda t: t)

    def loss_only(p, b, k):
        outputs = model_forward(
            cast(p), cfg, b["x"], cast(b["mel"]),
            text_positions=b["text_positions"],
            frame_positions=b["frame_positions"],
            input_lengths=b["input_lengths"], training=True, rng=k)
        outputs = jax.tree.map(lambda x: x.astype(jnp.float32), outputs)
        loss, metrics = trainer.compute_losses(outputs, b, lc)
        return loss

    c_fwd = jax.jit(loss_only).lower(params, batch, rng).compile()
    holder = {}

    def run_fwd():
        holder["v"] = c_fwd(params, batch, rng)

    out["fwd_loss"] = {"ms_per_step": round(
        _bench_one(run_fwd, lambda: float(holder["v"])), 3)}

    c_grad = jax.jit(jax.grad(loss_only)).lower(params, batch, rng).compile()

    def run_grad():
        holder["g"] = c_grad(params, batch, rng)

    def fence_grad():
        np.asarray(jax.tree_util.tree_leaves(holder["g"])[0]).ravel()[0]

    out["fwd_grad"] = {"ms_per_step": round(
        _bench_one(run_grad, fence_grad), 3)}

    out["derived_ms"] = {
        "guided_attention": round(ms_full - ms_ng, 3),
        "converter_fwd_bwd": round(ms_full - ms_s2s, 3),
        "optimizer_update": round(
            ms_full - out["fwd_grad"]["ms_per_step"], 3),
        "backward_pass": round(
            out["fwd_grad"]["ms_per_step"]
            - out["fwd_loss"]["ms_per_step"], 3),
    }

    if args.trace_dir:
        os.makedirs(args.trace_dir, exist_ok=True)
        lcf = trainer.loss_config_from_hparams(hp)
        mask = trainer.trainable_mask(params, cfg)
        fn = trainer.make_train_step(cfg, lcf, opt, mask,
                                     compute_dtype=args.dtype)
        state = trainer.init_train_state(jax.tree.map(jnp.copy, params), opt)
        compiled = fn.lower(state, batch, rng).compile()
        state, m = compiled(state, batch, rng)
        float(m["loss"])
        with jax.profiler.trace(args.trace_dir):
            for _ in range(10):
                state, m = compiled(state, batch, rng)
            float(m["loss"])
        out["trace_dir"] = args.trace_dir

    print(json.dumps(out))


if __name__ == "__main__":
    main()
