"""Attribute the Griffin-Lim per-iteration cost: MXU matmuls vs the
overlap-add + re-framing (bandwidth/VPU) section between them.

Three scan loops at bench shapes, identical iteration counts:
  A. matmuls only  — irdft then rdft with the OLA+frame replaced by an
     identity reshape (algebraically wrong, cost model only)
  B. full project  — the shipped loop body
  C. ola+frame only — the OLA + framing passes with matmuls removed
A + C ~ B confirms the split; B - A is the ceiling a Pallas kernel that
fuses OLA/framing into the matmuls could reclaim (plus bf16 matmul
headroom if A dominates).

    python tools/gl_cost_split.py [--iters 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=600)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from deepvoice3_pytorch_tpu.dsp import stft as dsp
    from deepvoice3_pytorch_tpu.dsp.stft import _frame, _overlap_add

    fft, hop = 1024, 256
    win = jnp.asarray(dsp.lws_hann_window(fft, hop))
    mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))
    m_inv_re = mats[2] * win[None, :]
    m_inv_im = mats[3] * win[None, :]
    m_fwd_re = win[:, None] * mats[0]
    m_fwd_im = win[:, None] * mats[1]
    rs = np.random.RandomState(0)
    S = jnp.asarray((rs.rand(args.B, args.T, 513) ** 4).astype(np.float32))
    n_frames = args.T
    wsq = jnp.broadcast_to((win * win)[None, :], (n_frames, fft))
    inv_norm = 1.0 / jnp.maximum(_overlap_add(wsq, fft, hop), 1e-8)

    def mm(a, b):
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)

    def body_full(carry, _):
        re, im = carry
        frames = mm(re, m_inv_re) + mm(im, m_inv_im)
        x = _overlap_add(frames, fft, hop) * inv_norm
        f2 = _frame(x, fft, hop, center=False)
        t_re, t_im = mm(f2, m_fwd_re), mm(f2, m_fwd_im)
        mag = jnp.maximum(jnp.sqrt(t_re * t_re + t_im * t_im), 1e-16)
        return (S * t_re / mag, S * t_im / mag), None

    def body_mm_only(carry, _):
        re, im = carry
        frames = mm(re, m_inv_re) + mm(im, m_inv_im)
        t_re, t_im = mm(frames, m_fwd_re), mm(frames, m_fwd_im)
        mag = jnp.maximum(jnp.sqrt(t_re * t_re + t_im * t_im), 1e-16)
        return (S * t_re / mag, S * t_im / mag), None

    def body_ola_only(carry, _):
        re, im = carry
        # fake "frames" from re/im without a matmul: broadcast to fft width
        frames = jnp.concatenate([re, im[..., :fft - 513]], axis=-1)
        x = _overlap_add(frames, fft, hop) * inv_norm
        f2 = _frame(x, fft, hop, center=False)
        return (f2[..., :513] + re * 1e-9, im), None

    def run(body):
        def f(S0):
            (re, im), _ = lax.scan(body, (S0, jnp.zeros_like(S0)), None,
                                   length=args.iters)
            return re
        return jax.jit(f).lower(S).compile()

    progs = {"full": run(body_full), "matmuls_only": run(body_mm_only),
             "ola_frame_only": run(body_ola_only)}
    for name, c in progs.items():
        np.asarray(c(S)[0, -4:])  # warmup fence
    for name, c in progs.items():
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.n):
                out = c(S)
            np.asarray(out[0, -4:])
            walls.append((time.perf_counter() - t0) / args.n)
        ms = min(walls) * 1000.0
        print(f"{name:16s}: {ms:7.2f} ms total, "
              f"{ms / args.iters:6.3f} ms/iter")


if __name__ == "__main__":
    main()
