#!/usr/bin/env python
# coding: utf-8
"""Probe: Pallas GL multi-item grid blocks (block_items=G) vs the
round-3 one-item-per-step kernel, across the shapes production hits.

Grid steps serialize on a TPU core, so G items per step (a) amortizes
the per-item fixed work (in-kernel SPSI init, final synthesis, per-step
pipeline overhead) and (b) fattens every DFT GEMM from n rows to G*n —
the smaller n is, the bigger both effects. Shapes:

  * n=600, B=32: the headline batched-synthesis vocoder window
  * n=112/224:   bucketed trimmed-decode windows (synthesis.py buckets)
  * n=24..88, B=8: streaming/serving windows (gl_context 16 + chunk*r
    + lookahead 8 at LJSpeech r=1..4)

Also verifies on-device numerical equality G vs 1 (expected bit-identical:
per-row GEMMs + per-item OLA loops, same op order).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from deepvoice3_pytorch_tpu.dsp import stft as dsp                 # noqa: E402
from deepvoice3_pytorch_tpu.dsp.gl_pallas import (                 # noqa: E402
    griffin_lim_pallas, auto_block_items)


def main():
    fft, hop, F = 1024, 256, 513
    win = dsp.lws_hann_window(fft, hop)
    mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))
    rs = np.random.RandomState(0)

    def bench(B, n, iters, G, n_rep=8, init=False):
        mag = jnp.asarray(
            np.abs(rs.randn(B, n, F)).astype(np.float32) * 0.1)
        kw = dict(n_iters=iters, mats=mats, phase_init="spsi",
                  block_items=G)
        if init:
            ire = mag * 0.8
            iim = mag * 0.6
            kw.update(init_spec=(ire, iim), n_pinned=min(16, n - 1),
                      return_spec=True)

        def run(m):
            return griffin_lim_pallas(m, fft, hop, win, **kw)

        c = jax.jit(run).lower(mag).compile()
        out = c(mag)
        w = out[0] if init else out
        np.asarray(w[0, -4:])           # warmup fence
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_rep):
                out = c(mag)
            w = out[0] if init else out
            np.asarray(w[0, -4:])
            walls.append((time.perf_counter() - t0) / n_rep)
        return min(walls) * 1e3, np.asarray(w)

    print("backend:", jax.default_backend())
    shapes = [
        # (B, n, iters, init?)  — batch-synthesis rows
        (32, 600, 16, False),
        (32, 224, 16, False),
        (32, 112, 16, False),
        # streaming/serving windows (anchored init + pinned context)
        (8, 88, 32, True),
        (8, 40, 32, True),
        (8, 24, 32, True),
        (4, 40, 32, True),
        (1, 40, 32, True),
    ]
    for B, n, iters, init in shapes:
        g_auto = auto_block_items(B, n, fft, hop, F,
                                  with_init=init, return_spec=init)
        t1, w1 = bench(B, n, iters, 1, init=init)
        if g_auto == 1:
            print("B=%2d n=%3d it=%2d init=%d  G=1 %.2f ms  (auto G=1)"
                  % (B, n, iters, init, t1))
            continue
        tg, wg = bench(B, n, iters, g_auto, init=init)
        d = float(np.max(np.abs(w1 - wg)))
        print("B=%2d n=%3d it=%2d init=%d  G=1 %6.2f ms | G=%-2d %6.2f ms "
              "(%.2fx)  maxdiff=%.2e"
              % (B, n, iters, init, t1, g_auto, tg, t1 / tg, d))


if __name__ == "__main__":
    main()
