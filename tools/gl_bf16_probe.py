#!/usr/bin/env python
# coding: utf-8
"""Probe: bf16 operands for the Griffin-Lim DFT matmuls (f32 accumulate).

The GL loop measures ~1.35 ms/iteration at batch-32 bench shapes — at the
v5e f32 MXU roofline for its ~80 GFLOP/iteration, i.e. the loop is
f32-matmul-throughput-bound, not HBM-bound as round 2 concluded from a
cast-only experiment. bf16 operands halve the matmul cost IF the phase
iteration tolerates the precision. This measures both sides on the golden
fixture / bench shapes:

  quality: spectral convergence at the default 30 iterations, f32 vs bf16
  speed:   ms/batch at (32, 600, 513), f32 vs bf16

Decision rule: adopt bf16 only if sc stays under the 0.15 bar AND under
the lws-local baseline, with speed clearly better.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "..", ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "tests"))
    from test_dsp_golden import HP, _spec_conv_of_inversion, _load

    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor

    lin = _load("linear")
    out = {}
    for tag, dt in (("f32", None), ("bf16", "bfloat16")):
        hp = HP()
        hp.griffin_lim_iters = 30
        hp.griffin_lim_matmul_dtype = dt
        ap = AudioProcessor(hp)
        wav = np.asarray(ap.inv_spectrogram(lin))
        out["sc_30it_%s" % tag] = round(
            float(_spec_conv_of_inversion(wav, lin, hp)), 4)

        rs = np.random.RandomState(0)
        spec = jnp.asarray(rs.rand(32, 600, 513).astype(np.float32))
        w = ap.inv_spectrogram_device(spec)
        np.asarray(w[0, -4:])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                w = ap.inv_spectrogram_device(spec)
            np.asarray(w[0, -4:])
            walls.append((time.perf_counter() - t0) / 5)
        out["ms_b32_%s" % tag] = round(min(walls) * 1000.0, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
