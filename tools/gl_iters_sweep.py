#!/usr/bin/env python
# coding: utf-8
"""Griffin-Lim iteration count vs quality AND speed (round-2 verdict #5).

Measures, on the committed golden fixture (tests/data/dsp_golden_*.npy):

  quality: spectral convergence of the inversion at each iteration count
           (same metric and 0.15 bar as
           tests/test_dsp_golden.py::test_inversion_quality_gl_vs_lws,
           with the 100-iteration lws-local run as the reference line)
  speed:   device wall-clock of the batch-32 bench-shape vocoder at each
           count (same fencing protocol as bench.py)

With --spsi, sweeps the SPSI phase initialization (dsp/stft.py
spsi_phase) alongside the classic zero-phase start. Measured result that
set the shipped default (griffin_lim_iters=16, phase_init="spsi"):
spsi@16 -> sc 0.1442 vs zero@30 -> 0.1399 (both well under the 0.15 bar
and the 0.159 lws line), at roughly half the vocoder wall-clock; the
peak-locking segment fill of classic SPSI measured WORSE at equal
iterations (0.1484 vs 0.1442 @16) and ~8 ms/batch slower, so spsi_phase
keeps only the per-bin interpolated-frequency integration.

Prints one JSON object; use it to pick the smallest count holding
sc < 0.15 with margin. Run on the TPU chip.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ITERS = (10, 15, 20, 25, 30, 40, 60)
ITERS_SPSI = (10, 12, 14, 16, 18, 20, 30)


def main():
    inits = ("zero", "spsi") if "--spsi" in sys.argv[1:] else ("zero",)
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_dsp_golden import HP, _spec_conv_of_inversion, _load

    from deepvoice3_pytorch_tpu.dsp import reference_model as ref
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor

    lin = _load("linear")
    out = {"quality": {}, "speed_b32_bench_shapes": {}}

    # lws-local reference line (the reference's vocoder quality)
    hp = HP()
    wav_lws = ref.inv_spectrogram(lin.astype(np.float64), hp, n_iters=100,
                                  local=True, momentum=0.0)
    sc_lws = float(_spec_conv_of_inversion(wav_lws, lin, hp))
    out["quality"]["lws_local_100"] = round(sc_lws, 4)

    for init in inits:
        for n in (ITERS_SPSI if init == "spsi" else ITERS):
            hp = HP()
            hp.griffin_lim_iters = n
            hp.griffin_lim_phase_init = init
            ap = AudioProcessor(hp)
            wav = ap.inv_spectrogram(lin)
            sc = float(_spec_conv_of_inversion(np.asarray(wav), lin, hp))
            out["quality"]["gl_%s_%d" % (init, n)] = round(sc, 4)

    # speed at the bench shapes: (32, 600, 513) normalized spectrogram
    rs = np.random.RandomState(0)
    spec = jnp.asarray(rs.rand(32, 600, 513).astype(np.float32))
    for init in inits:
        for n in (ITERS_SPSI if init == "spsi" else ITERS):
            hp = HP()
            hp.griffin_lim_iters = n
            hp.griffin_lim_phase_init = init
            ap = AudioProcessor(hp)
            wav = ap.inv_spectrogram_device(spec)
            np.asarray(wav[0, -4:])          # warmup fence
            walls = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    wav = ap.inv_spectrogram_device(spec)
                np.asarray(wav[0, -4:])
                walls.append((time.perf_counter() - t0) / 5)
            out["speed_b32_bench_shapes"]["gl_%s_%d" % (init, n)] = round(
                min(walls) * 1000.0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
