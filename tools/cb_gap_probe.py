#!/usr/bin/env python
# coding: utf-8
"""Measure WHERE the continuous-batching vs synchronized-streams gap lives
(round-4 verdict #3: "the attribution is asserted, not measured").

Runs the 8-slot ContinuousBatcher with the per-step log enabled
(serving.step_log) under two arrival patterns:

  * stagger 50 ms (the bench row): arrivals land in different steps, so
    early-stream window signatures coexist -> k>1 converter/GL groups
    per step until every slot passes its ramp;
  * stagger 0 (all 8 submitted before the first step): all slots share
    one phase -> k=1 throughout (the synchronized-stream shape).

Per experiment it prints a per-step table bucketed by the number of
converter groups k: how many steps, mean wall, mean program launches —
plus a least-squares fit wall ~= a + b * n_launches giving the marginal
per-launch cost on this host, and the bare device round-trip time
(one tiny blocking fetch) for comparison.

Run on the TPU host:  python tools/cb_gap_probe.py
"""
import os
import sys
import threading
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

from bench import _LJ_PARSE, SENTENCES  # noqa: E402
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor  # noqa: E402
from deepvoice3_pytorch_tpu.frontend import en  # noqa: E402
from deepvoice3_pytorch_tpu.hparams import default_hparams  # noqa: E402
from deepvoice3_pytorch_tpu.model_builder import build_model  # noqa: E402
from deepvoice3_pytorch_tpu.serving import ContinuousBatcher  # noqa: E402


def run_requests(b, n_req, stagger_s, spk=None):
    results = {}

    def req(i):
        if stagger_s:
            time.sleep(stagger_s * i)
        t0 = time.perf_counter()
        q = b.submit(SENTENCES[i % len(SENTENCES)])
        first, n = None, 0
        while True:
            kind, payload = q.get(timeout=600)
            if kind == "end":
                results[i] = (first, time.perf_counter() - t0, n)
                return
            if kind == "error":
                raise payload
            if first is None:
                first = time.perf_counter() - t0
            n += len(payload)

    t0 = time.perf_counter()
    th = [threading.Thread(target=req, args=(i,)) for i in range(n_req)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    return time.perf_counter() - t0, results


def analyze(tag, log, wall, results, sr):
    audio_s = sum(r[2] for r in results.values()) / sr
    steps = np.asarray([(w, a, adm, cg, gl, ret)
                        for w, a, adm, cg, gl, ret in log])
    print("\n== %s: wall %.1f ms, audio %.1f s, aggregate RTF %.1f, "
          "%d steps ==" % (tag, wall * 1e3, audio_s, audio_s / wall,
                           len(steps)))
    print("%6s %6s %10s %10s %10s %8s" % ("k_conv", "steps", "wall_ms",
                                          "gl/step", "admits", "retires"))
    for k in sorted(set(steps[:, 3].astype(int))):
        sel = steps[steps[:, 3] == k]
        print("%6d %6d %10.1f %10.2f %10.2f %8.2f"
              % (k, len(sel), 1e3 * sel[:, 0].mean(), sel[:, 4].mean(),
                 sel[:, 2].mean(), sel[:, 5].mean()))
    # marginal per-launch cost: wall ~= a + b * (1 fused decode+roll
    # + n fused conv+GL dispatches + ~3 per retire: push, flush, packed
    # fetch)
    n_launch = 1 + steps[:, 4] + 3 * steps[:, 5]
    A = np.stack([np.ones(len(steps)), n_launch], axis=1)
    coef, *_ = np.linalg.lstsq(A, steps[:, 0], rcond=None)
    print("fit: wall ms ~= %.2f + %.2f * n_launches  (r=%.3f)"
          % (coef[0] * 1e3, coef[1] * 1e3,
             np.corrcoef(n_launch, steps[:, 0])[0, 1]))
    return audio_s / wall, coef


def main():
    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, min_decoder_steps=200))
    ap = AudioProcessor(hp)

    b = ContinuousBatcher(params, cfg, ap, en, n_slots=8, text_pad=64,
                          chunk=16, max_decoder_steps=200)
    b.step_log = []
    stop = threading.Event()
    worker = threading.Thread(target=b.run_loop, args=(stop,), daemon=True)
    worker.start()

    # warmup: compiles every signature in the ramp
    run_requests(b, 1, 0.0)

    # bare device round trip (tiny blocking fetch of a compiled add).
    # NB: the jitted fn must be hoisted out of the loop — rebuilding
    # jax.jit(lambda ...) each pass would retrace and measure tracing,
    # not dispatch.
    add_one = jax.jit(lambda x: x + 1)
    one = add_one(jnp.zeros((8,), jnp.float32))
    np.asarray(one)
    t0 = time.perf_counter()
    for _ in range(20):
        one = add_one(one)
        np.asarray(one)
    rtt_ms = (time.perf_counter() - t0) / 20 * 1e3
    print("bare dispatch+fetch round trip: %.2f ms" % rtt_ms)

    out = {}
    for tag, stagger in (("stagger50ms", 0.05), ("stagger0", 0.0)):
        b.step_log.clear()
        wall, results = run_requests(b, 8, stagger)
        rtf, coef = analyze(tag, list(b.step_log), wall, results,
                            hp.sample_rate)
        out[tag] = (rtf, coef)
    stop.set()

    r50, c50 = out["stagger50ms"]
    r0, _ = out["stagger0"]
    print("\naggregate RTF: stagger50ms %.1f vs stagger0 %.1f "
          "(gap %.2fx); per-launch marginal cost %.2f ms vs bare RTT "
          "%.2f ms" % (r50, r0, r0 / r50, c50[1] * 1e3, rtt_ms))


if __name__ == "__main__":
    main()
