"""Probe: spsi_phase's frame-axis cumsum as a triangular MXU matmul.

The SPSI init costs ~4.6 ms at bench shapes — large for two shifts and a
cumsum. Suspect: XLA's cumsum lowering over the 600-frame axis of a
(32, 600, 513) tensor. Alternative: phi = L @ omega where L is the
(T, T) lower-triangular ones matrix — an 11.8 GFLOP bf16 matmul
(~0.1 ms on the MXU) replacing the scan-style lowering.

    python tools/spsi_cumsum_probe.py
"""
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
    from deepvoice3_pytorch_tpu.dsp.stft import spsi_phase

    fft, hop = 1024, 256
    rs = np.random.RandomState(0)
    mag = jnp.asarray((rs.rand(32, 600, 513) ** 4).astype(np.float32))
    T = mag.shape[-2]
    tri = jnp.asarray(np.tril(np.ones((T, T), np.float32)))

    def spsi_tri(m, L):
        F = m.shape[-1]
        left = jnp.concatenate([m[..., :1], m[..., :-1]], axis=-1)
        right = jnp.concatenate([m[..., 1:], m[..., -1:]], axis=-1)
        denom = left - 2.0 * m + right
        p = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (left - right) / jnp.where(
                          jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
        p = jnp.clip(p, -0.5, 0.5)
        k = jnp.arange(F, dtype=m.dtype)
        omega = hop * 2.0 * jnp.pi * (k + p) / fft
        # inclusive cumsum over the frame axis as a triangular matmul:
        # phi[t] = sum_{s<=t} omega[s]
        return jnp.einsum("ts,...sf->...tf", L, omega,
                          preferred_element_type=jnp.float32)

    c_ref = jax.jit(lambda m: spsi_phase(m, fft, hop)).lower(mag).compile()
    c_tri = jax.jit(spsi_tri).lower(mag, tri).compile()
    a = np.asarray(c_ref(mag))
    b = np.asarray(c_tri(mag, tri))
    rel = np.abs(a - b).max() / np.abs(a).max()

    for name, fn, args in (("cumsum", c_ref, (mag,)),
                           ("tri_matmul", c_tri, (mag, tri))):
        np.asarray(fn(*args)[0, -1, -4:])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(5):
                out = fn(*args)
            np.asarray(out[0, -1, -4:])
            walls.append((time.perf_counter() - t0) / 5)
        print(f"{name:10s}: {min(walls) * 1000:7.2f} ms")
    print(f"max rel diff: {rel:.2e}")


if __name__ == "__main__":
    main()
