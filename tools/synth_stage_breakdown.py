#!/usr/bin/env python
# coding: utf-8
"""Stage breakdown of the trained-checkpoint synthesis pipeline + training
throughput at scale shapes.

Part 1 — where the trained-row wall-clock goes (bench.py
trained_early_exit measures ~69 ms/batch end-to-end): chunked fused
decode, the (B,) lengths fetch (one dev-tunnel round trip on this
harness — microseconds on PCIe hosts), converter, Griffin-Lim — each
fenced separately.

Part 2 — training rows beyond the bench grid: b128 bf16 and long-sequence
(T_lin=1024) b32 bf16, to pin how MFU scales with arithmetic intensity
(DESIGN.md §4.1's claim).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _best3(fn, fence, n=10):
    fn()
    fence()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        fence()
        walls.append((time.perf_counter() - t0) / n)
    return round(min(walls) * 1000.0, 2)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("DV3_PRNG_IMPL", "rbg"))

    from bench import _LJ_PARSE, SENTENCES
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.synthesis import (
        _decode_prog, _postnet_prog, _prepare_batch, _round_up,
        BUCKET_DEC_STEPS, SLACK_DEC_STEPS)
    from deepvoice3_pytorch_tpu.training import trainer
    from deepvoice3_pytorch_tpu.utils import synthcorpus as sc

    out = {}

    # ---- part 1: stage breakdown on an in-bench-trained checkpoint ----
    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    texts48 = sc.make_sentences(48, seed=3)
    kpr = sc.mean_frames_per_char(texts48, hp.sample_rate, hp.hop_size) \
        / (hp.downsample_step * hp.outputs_per_step)
    hp.parse("key_position_rate=%.4f" % kpr)
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    items = sc.build_items(texts48, hp, ap, en)
    batches = [jax.tree.map(jnp.asarray, b)
               for b in sc.make_batches(items, hp, 16, seed=3)]
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)
    rng = jax.random.PRNGKey(0)
    for i in range(4000):
        rng, sub = jax.random.split(rng)
        state, m = step_fn(state, batches[i % len(batches)], sub)
    float(m["loss"])
    params = state.params

    x, pos, lengths = _prepare_batch(en, SENTENCES, 0.0, pad_to=64)
    x, pos, lengths = jnp.asarray(x), jnp.asarray(pos), jnp.asarray(lengths)
    MAX_STEPS = 200

    holder = {}

    def decode():
        holder["d"] = _decode_prog(params, cfg, x, pos, lengths, None,
                                   max_decoder_steps=MAX_STEPS,
                                   early_exit=True, fused=True)

    def fence_decode():
        np.asarray(holder["d"][4])          # the lengths themselves

    out["decode_ms"] = _best3(decode, fence_decode)

    decode()
    t0 = time.perf_counter()
    for _ in range(10):
        lens = np.asarray(holder["d"][4])
    out["lengths_fetch_rtt_ms"] = round(
        (time.perf_counter() - t0) / 10 * 1000.0, 2)

    n_bucket = min(MAX_STEPS, _round_up(int(lens.max()) + SLACK_DEC_STEPS,
                                        BUCKET_DEC_STEPS))
    out["decoded_max"] = int(lens.max())
    out["n_bucket"] = n_bucket
    pin = holder["d"][1][:, :n_bucket * cfg.r]

    def postnet():
        holder["l"] = _postnet_prog(params, cfg, pin, None)

    out["postnet_ms"] = _best3(postnet,
                               lambda: np.asarray(holder["l"][0, -1, -1]))

    linear = holder["l"]

    def voc():
        holder["w"] = ap.inv_spectrogram_device(linear)

    out["vocoder_ms"] = _best3(voc,
                               lambda: np.asarray(holder["w"][0, -4:]))

    # ---- part 2: training scale rows ----
    def train_row(B, T_lin, dtype):
        hp2 = default_hparams()
        hp2.parse(_LJ_PARSE)
        cfg2, params2 = build_model(hp2, en.n_vocab)
        opt2 = trainer.make_optimizer(hp2, trainer.make_lr_fn(hp2))
        lc2 = trainer.loss_config_from_hparams(hp2)
        mask2 = trainer.trainable_mask(params2, cfg2)
        fn = trainer.make_train_step(cfg2, lc2, opt2, mask2,
                                     compute_dtype=dtype)
        r, ds = cfg2.r, hp2.downsample_step
        T_text = 128 * T_lin // 512
        T_mel = T_lin // ds
        T_dec = T_mel // r
        rs = np.random.RandomState(0)
        b = {"x": rs.randint(1, en.n_vocab, (B, T_text)).astype(np.int32),
             "input_lengths": np.full((B,), T_text, np.int32),
             "mel": rs.rand(B, T_mel, hp2.num_mels).astype(np.float32),
             "y": rs.rand(B, T_lin, hp2.fft_size // 2 + 1).astype(
                 np.float32),
             "text_positions": np.tile(np.arange(1, T_text + 1),
                                       (B, 1)).astype(np.int32),
             "frame_positions": np.tile(np.arange(1, T_dec + 1),
                                        (B, 1)).astype(np.int32),
             "done": np.zeros((B, T_dec, 1), np.float32),
             "target_lengths": np.full((B,), T_lin, np.int32)}
        b = jax.tree.map(jnp.asarray, b)
        st = trainer.init_train_state(jax.tree.map(jnp.copy, params2), opt2)
        k = jax.random.PRNGKey(0)
        compiled = fn.lower(st, b, k).compile()
        try:
            flops = float(compiled.cost_analysis()["flops"])
        except Exception:
            flops = float("nan")
        hold = {"s": st, "m": None}

        def run():
            hold["s"], hold["m"] = compiled(hold["s"], b, k)

        ms = _best3(run, lambda: float(hold["m"]["loss"]), n=30)
        return {"ms_per_step": ms,
                "steps_per_s": round(1000.0 / ms, 2),
                "mfu_vs_bf16_peak": round(flops / (ms / 1e3) / 197e12, 4)
                if np.isfinite(flops) else None}

    out["train_b128_T512_bf16"] = train_row(128, 512, "bfloat16")
    out["train_b32_T1024_bf16"] = train_row(32, 1024, "bfloat16")

    print(json.dumps(out))


if __name__ == "__main__":
    main()
