#!/usr/bin/env python
# coding: utf-8
"""Probe: synthesis-pipeline program fusion on TPU.

Round-2/3 kept the pipeline as separate jitted programs (decode+postnet |
denorm | GL | inv-preemphasis) because composing the XLA-scan Griffin-Lim
with its neighbors sent the v5e AOT compile past 25 minutes. The vocoder
is now a single opaque Pallas kernel (dsp/gl_pallas.py), which removes the
HLO the optimizer choked on — so re-measure: what do the extra program
dispatches cost, and does one-jit composition now compile fast and run
faster?

Configurations measured at the headline bench shapes (B=32, 150 fixed
decoder steps, LJSpeech preset, fused Pallas decode, spsi@16 Pallas GL):

  A. status quo: jit(synthesize) | denorm | GL | invpre   (4 dispatches)
  B. jit(synthesize) | jit(denorm+GL+invpre)              (2 dispatches)
  C. jit(synthesize + denorm + GL + invpre)               (1 dispatch)

and at the trained-row shapes (decode trimmed to n=112 bucket):

  D. status quo postnet | denorm | GL | invpre            (4 dispatches)
  E. jit(postnet + denorm + GL + invpre)                  (1 dispatch)

Prints one JSON line with compile seconds and best-of-3 ms/batch per
configuration.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepvoice3_pytorch_tpu.builder import (model_postnet,
                                                model_synthesize)
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.synthesis import _prepare_batch
    from bench import SENTENCES, _LJ_PARSE

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)

    B, T_DEC = 32, 150
    x, pos, lengths = _prepare_batch(en, SENTENCES[:B], 0.0, pad_to=64)
    x, pos, lengths = jnp.asarray(x), jnp.asarray(pos), jnp.asarray(lengths)

    inv = ap._inv          # traceable: denorm+pow | GL | inv-preemphasis
    mats = ap._dft         # DFT matrices as runtime args (never constants)
    power = ap.power

    def synth(params, x, pos, lengths):
        mel, linear, align, done, dec_len = model_synthesize(
            params, cfg, x, pos, input_lengths=lengths,
            max_decoder_steps=T_DEC, early_exit=False, fused=True)
        return linear

    results = {}

    def emit(label):
        print(json.dumps({label: results[label]}), flush=True)

    def timed(label, fn, n_timed=10):
        wav = fn()                       # warmup (compiled already)
        np.asarray(wav[0, -4:])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_timed):
                wav = fn()
            np.asarray(wav[0, -4:])
            walls.append((time.perf_counter() - t0) / n_timed)
        results[label]["ms"] = round(min(walls) * 1000.0, 2)

    # ---- A: status quo (4 dispatches) ----
    t0 = time.perf_counter()
    c_synth = jax.jit(synth).lower(params, x, pos, lengths).compile()
    results["A_status_quo"] = {"compile_s": round(time.perf_counter() - t0, 1)}
    linear0 = c_synth(params, x, pos, lengths)
    wav0 = ap.inv_spectrogram_device(linear0)   # compiles the 3 vocoder progs
    np.asarray(wav0[0, -4:])
    timed("A_status_quo",
          lambda: ap.inv_spectrogram_device(c_synth(params, x, pos, lengths)))
    emit("A_status_quo")

    # ---- B: one-jit vocoder (2 dispatches) ----
    @jax.jit
    def voc_fused(linear, power, mats):
        return inv(linear, power, mats)

    t0 = time.perf_counter()
    c_voc = voc_fused.lower(linear0, power, mats).compile()
    results["B_vocoder_onejit"] = {
        "compile_s": round(time.perf_counter() - t0, 1)}
    timed("B_vocoder_onejit",
          lambda: c_voc(c_synth(params, x, pos, lengths), power, mats))
    emit("B_vocoder_onejit")

    # ---- trained-row shapes: postnet on a trimmed buffer ----
    n_bucket = 112
    pin = jnp.asarray(np.random.RandomState(0).rand(
        B, n_bucket * cfg.r, cfg.mel_dim).astype(np.float32))

    def postnet(params, pin):
        return model_postnet(params, cfg, pin)

    t0 = time.perf_counter()
    c_post = jax.jit(postnet).lower(params, pin).compile()
    linear1 = c_post(params, pin)
    _ = ap.inv_spectrogram_device(linear1)      # compile vocoder at n=112
    results["D_trained_status_quo"] = {
        "compile_s": round(time.perf_counter() - t0, 1)}
    timed("D_trained_status_quo",
          lambda: ap.inv_spectrogram_device(c_post(params, pin)))
    emit("D_trained_status_quo")

    def post_voc(params, pin, power, mats):
        linear = model_postnet(params, cfg, pin)
        return inv(jax.lax.optimization_barrier(linear), power, mats)

    t0 = time.perf_counter()
    c_pv = jax.jit(post_voc).lower(params, pin, power, mats).compile()
    results["E_trained_onejit"] = {
        "compile_s": round(time.perf_counter() - t0, 1)}
    wavE = c_pv(params, pin, power, mats)
    wavD = ap.inv_spectrogram_device(linear1)
    err = float(np.max(np.abs(np.asarray(wavE) - np.asarray(wavD))))
    results["E_trained_onejit"]["max_abs_vs_D"] = err
    timed("E_trained_onejit", lambda: c_pv(params, pin, power, mats))
    emit("E_trained_onejit")

    # ---- C: whole pipeline one jit (1 dispatch); riskiest compile last ----
    if os.environ.get("DV3_PROBE_C", "1") != "0":
        def everything(params, x, pos, lengths, power, mats):
            linear = synth(params, x, pos, lengths)
            return inv(jax.lax.optimization_barrier(linear), power, mats)

        t0 = time.perf_counter()
        c_all = jax.jit(everything).lower(params, x, pos, lengths, power,
                                          mats).compile()
        results["C_whole_onejit"] = {
            "compile_s": round(time.perf_counter() - t0, 1)}
        wavC = c_all(params, x, pos, lengths, power, mats)
        err = float(np.max(np.abs(np.asarray(wavC) - np.asarray(wav0))))
        results["C_whole_onejit"]["max_abs_vs_A"] = err
        timed("C_whole_onejit",
              lambda: c_all(params, x, pos, lengths, power, mats))
        emit("C_whole_onejit")

    print(json.dumps({"backend": jax.default_backend(), **results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
