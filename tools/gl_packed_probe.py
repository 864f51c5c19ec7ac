"""Probe: packed-carry Griffin-Lim loop vs the shipped 4-matmul loop.

Round 2 measured "pack re|im into one matmul" as 7% SLOWER — but that
variant concatenated the two (B, T, 513) halves INSIDE the loop body,
materializing an extra 78 MB tensor per iteration. This probe keeps the
packed (..., 1026) layout AS THE SCAN CARRY, so the loop body is two
matmuls instead of four and the magnitude projection splits the halves
with a free reshape view ((..., 1026) -> (..., 2, 513)), never a concat:

    frames = C @ [M_inv_re ; M_inv_im]          # (1026, 1024)
    x = OLA(frames) * inv_norm ; f2 = frame(x)
    t = f2 @ [M_fwd_re | M_fwd_im]              # (1024, 1026)
    a = t + momentum * (t - t_prev)             # packed, linear
    ar = a.reshape(..., 2, 513)
    scale = S / max(|ar|_2-over-pairs, eps)     # (..., 513)
    C = (ar * scale[..., None, :]).reshape(..., 1026)

Expected wins: half the matmul dispatches, K-dim padding waste drops
(513->640 pad = 1.25x vs 1026->1152 = 1.12x), and the forward reads f2
once instead of twice (~78 MB/iter less traffic at bench shapes).

Run on the TPU at bench shapes (B=32, T=600, F=513):
    python tools/gl_packed_probe.py [--iters 16] [--n 5]
Prints ms/batch for both loops and max|wav_packed - wav_ref| (must be
~fp-noise: the two formulations are algebraically identical).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def griffin_lim_packed(magnitude, fft_size, hop, window, *, n_iters,
                       momentum, mats, phase_init="spsi"):
    import jax.numpy as jnp
    from jax import lax
    from deepvoice3_pytorch_tpu.dsp.stft import (
        _frame, _overlap_add, spsi_phase)

    S = magnitude.astype(jnp.float32)
    eps = 1e-16
    F = S.shape[-1]
    m_inv = jnp.concatenate([mats[2] * window[None, :],
                             mats[3] * window[None, :]], axis=0)  # (2F, fft)
    m_fwd = jnp.concatenate([window[:, None] * mats[0],
                             window[:, None] * mats[1]], axis=1)  # (fft, 2F)
    n_frames = S.shape[-2]
    wsq = jnp.broadcast_to((window * window)[None, :], (n_frames, fft_size))
    inv_norm = 1.0 / jnp.maximum(_overlap_add(wsq, fft_size, hop), 1e-8)

    def project(C):
        frames = jnp.matmul(C, m_inv, preferred_element_type=jnp.float32)
        x = _overlap_add(frames, fft_size, hop) * inv_norm
        f2 = _frame(x, fft_size, hop, center=False)
        return jnp.matmul(f2, m_fwd, preferred_element_type=jnp.float32)

    def mag_project(a):
        ar = a.reshape(*a.shape[:-1], 2, F)
        mag = jnp.maximum(jnp.sqrt((ar * ar).sum(-2)), eps)
        return (ar * (S / mag)[..., None, :]).reshape(*a.shape)

    def body(carry, _):
        C, tp = carry
        t = project(C)
        a = t + momentum * (t - tp)
        return (mag_project(a), t), None

    if phase_init == "spsi":
        phi = spsi_phase(S, fft_size, hop)
        C0 = jnp.concatenate([S * jnp.cos(phi), S * jnp.sin(phi)], axis=-1)
    else:
        C0 = jnp.concatenate([S, jnp.zeros_like(S)], axis=-1)
    (C, _), _ = lax.scan(body, (C0, jnp.zeros_like(C0)), None, length=n_iters)
    frames = jnp.matmul(C, m_inv, preferred_element_type=jnp.float32)
    y = _overlap_add(frames, fft_size, hop) * inv_norm
    return y[..., :hop * n_frames]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--B", type=int, default=32)
    ap.add_argument("--T", type=int, default=600)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from deepvoice3_pytorch_tpu.dsp import stft as dsp

    fft, hop = 1024, 256
    win = jnp.asarray(dsp.lws_hann_window(fft, hop))
    mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))
    rs = np.random.RandomState(0)
    # magnitude with realistic dynamic range
    mag = jnp.asarray((rs.rand(args.B, args.T, 513) ** 4).astype(np.float32))

    def run_ref(m):
        return dsp.griffin_lim(m, fft, hop, win, n_iters=args.iters,
                               momentum=0.9, mats=mats, center=False,
                               phase_init="spsi")

    def run_packed(m):
        return griffin_lim_packed(m, fft, hop, win, n_iters=args.iters,
                                  momentum=0.9, mats=mats)

    c_ref = jax.jit(run_ref).lower(mag).compile()
    c_packed = jax.jit(run_packed).lower(mag).compile()

    w_ref = np.asarray(c_ref(mag))
    w_packed = np.asarray(c_packed(mag))
    scale = max(np.abs(w_ref).max(), 1e-9)
    rel = np.abs(w_packed - w_ref).max() / scale

    def timeit(fn):
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.n):
                w = fn(mag)
            np.asarray(w[0, -4:])  # materializing fence (tunnel-safe)
            walls.append((time.perf_counter() - t0) / args.n)
        return min(walls) * 1000.0

    ms_ref = timeit(c_ref)
    ms_packed = timeit(c_packed)
    print(f"shapes B={args.B} T={args.T} iters={args.iters}")
    print(f"ref    (4 matmuls/iter): {ms_ref:8.2f} ms/batch")
    print(f"packed (2 matmuls/iter): {ms_packed:8.2f} ms/batch "
          f"({(ms_ref / ms_packed - 1) * 100:+.1f}%)")
    print(f"max rel |dwav| = {rel:.3e} (formulations are algebraically "
          f"identical; expect fp noise)")


if __name__ == "__main__":
    main()
