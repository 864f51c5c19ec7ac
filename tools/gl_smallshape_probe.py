"""Pallas-vs-XLA Griffin-Lim at SMALL frame counts (the trained-row
bucketed-trim shapes). The kernel wins 1.68x at n=600; at n=112 the
stage breakdown measured 11.5 ms — barely below the n=600 cost — which
suggests an n-independent overhead. This probe times both paths across
n to find the crossover and decide a selection rule for audio.py.

    python tools/gl_smallshape_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepvoice3_pytorch_tpu.dsp import stft as dsp
    from deepvoice3_pytorch_tpu.dsp.gl_pallas import griffin_lim_pallas

    fft, hop, iters = 1024, 256, 16
    win = jnp.asarray(dsp.lws_hann_window(fft, hop))
    mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))
    rs = np.random.RandomState(0)

    def time_fn(c, mag, n_rep=8):
        np.asarray(c(mag)[0, -4:])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_rep):
                w = c(mag)
            np.asarray(w[0, -4:])
            walls.append((time.perf_counter() - t0) / n_rep)
        return round(min(walls) * 1000.0, 2)

    out = {}
    for n in (64, 112, 224, 400, 600):
        mag = jnp.asarray((rs.rand(32, n, 513) ** 4).astype(np.float32))

        def run_k(m):
            return griffin_lim_pallas(m, fft, hop, win, n_iters=iters,
                                      momentum=0.9, mats=mats,
                                      phase_init="spsi", center=False)

        def run_x(m):
            return dsp.griffin_lim(m, fft, hop, win, n_iters=iters,
                                   momentum=0.9, mats=mats, center=False,
                                   phase_init="spsi",
                                   carry_dtype="bfloat16")

        ck = jax.jit(run_k).lower(mag).compile()
        cx = jax.jit(run_x).lower(mag).compile()
        out["n%d" % n] = {"pallas_ms": time_fn(ck, mag),
                          "xla_ms": time_fn(cx, mag)}
        print(n, out["n%d" % n], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
