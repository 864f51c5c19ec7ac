"""Probe: Griffin-Lim with a bfloat16 scan CARRY (not just bf16 matmul
operands).

tools/gl_bf16_probe.py measured matmul_dtype="bfloat16" as neutral —
that variant keeps the carry f32 and casts operands inside the loop, so
every matmul gains is paid back by a full-tensor cast pass.  This probe
instead stores the carry (c_re, c_im, t_prev) and the frames/x/f2
intermediates in bf16 end-to-end:

  * every matmul consumes native-bf16 operands (MXU fast path, f32
    accumulation via preferred_element_type) with NO separate cast pass
    — the bf16 converts fuse into the producing elementwise epilogues;
  * HBM traffic for the carry and the (B, T, fft) intermediates halves.

Phase is stored as (re, im) at bf16 => ~2-3 significant digits of phase;
whether GL still converges to the same spectral quality is exactly what
this measures, against the same golden-fixture sc metric and 0.15 bar as
tests/test_dsp_golden.py.

    python tools/gl_bf16carry_probe.py [--iters 16]
Prints JSON: {sc_f32, sc_bf16c, ms_f32, ms_bf16c} at spsi init.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def griffin_lim_bf16_carry(magnitude, fft_size, hop, window, *, n_iters,
                           momentum, mats, phase_init="spsi", length=None,
                           center=False):
    import jax.numpy as jnp
    from jax import lax
    from deepvoice3_pytorch_tpu.dsp.stft import (
        _frame, _overlap_add, spsi_phase)

    bf16 = jnp.bfloat16
    S = magnitude.astype(jnp.float32)
    eps = 1e-16
    m_inv_re = (mats[2] * window[None, :]).astype(bf16)
    m_inv_im = (mats[3] * window[None, :]).astype(bf16)
    m_fwd_re = (window[:, None] * mats[0]).astype(bf16)
    m_fwd_im = (window[:, None] * mats[1]).astype(bf16)
    n_frames = S.shape[-2]
    wsq = jnp.broadcast_to((window * window)[None, :], (n_frames, fft_size))
    inv_norm = (1.0 / jnp.maximum(
        _overlap_add(wsq, fft_size, hop), 1e-8)).astype(bf16)

    def mm(a, b):
        return jnp.matmul(a, b, preferred_element_type=jnp.float32)

    def project(c_re, c_im):
        # f32 accumulation, immediately re-quantized to bf16 (fuses into
        # the matmul epilogue / the following elementwise)
        frames = (mm(c_re, m_inv_re) + mm(c_im, m_inv_im)).astype(bf16)
        x = (_overlap_add(frames, fft_size, hop) * inv_norm)
        f2 = _frame(x, fft_size, hop, center=False)
        return mm(f2, m_fwd_re), mm(f2, m_fwd_im)      # f32 out

    def body(carry, _):
        c_re, c_im, tp_re, tp_im = carry
        t_re, t_im = project(c_re, c_im)               # f32
        a_re = t_re + momentum * (t_re - tp_re.astype(jnp.float32))
        a_im = t_im + momentum * (t_im - tp_im.astype(jnp.float32))
        mag = jnp.maximum(jnp.sqrt(a_re * a_re + a_im * a_im), eps)
        return ((S * a_re / mag).astype(bf16), (S * a_im / mag).astype(bf16),
                t_re.astype(bf16), t_im.astype(bf16)), None

    z = jnp.zeros_like(S, dtype=bf16)
    if phase_init == "spsi":
        phi = spsi_phase(S, fft_size, hop)
        init = ((S * jnp.cos(phi)).astype(bf16),
                (S * jnp.sin(phi)).astype(bf16), z, z)
    else:
        init = (S.astype(bf16), z, z, z)
    (c_re, c_im, _, _), _ = lax.scan(body, init, None, length=n_iters)
    # final synthesis in f32
    frames = mm(c_re, m_inv_re) + mm(c_im, m_inv_im)
    y = _overlap_add(frames, fft_size, hop) * inv_norm.astype(jnp.float32)
    if center:
        y = y[..., fft_size // 2:]
    T = length if length is not None else hop * n_frames
    return y[..., :T]


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--iters", type=int, default=16)
    ap_.add_argument("--n", type=int, default=5)
    args = ap_.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from test_dsp_golden import HP, _spec_conv_of_inversion, _load
    from deepvoice3_pytorch_tpu.dsp import stft as dsp
    from deepvoice3_pytorch_tpu.dsp import audio as dva

    hp = HP()
    hp.griffin_lim_iters = args.iters
    hp.griffin_lim_phase_init = "spsi"
    fft, hop = hp.fft_size, hp.hop_size
    win = jnp.asarray(dsp.lws_hann_window(fft, hop))
    mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))

    # ---- quality on the golden fixture (denormalized spectrogram chain)
    lin = _load("linear")
    ap = dva.AudioProcessor(hp)
    wav_f32 = np.asarray(ap.inv_spectrogram(lin))
    sc_f32 = float(_spec_conv_of_inversion(wav_f32, lin, hp))

    # same de-norm chain as AudioProcessor._inv_spectrogram, bf16-carry GL
    spec = jnp.asarray(lin).T                               # (n, F)
    S_amp = dva.dsp.db_to_amp(
        dva.dsp.denormalize(spec, hp.min_level_db)
        + hp.ref_level_db) ** hp.power
    wav_b = griffin_lim_bf16_carry(
        S_amp, fft, hop, win, n_iters=args.iters, momentum=0.9, mats=mats,
        phase_init="spsi")
    wav_b = dva.dsp.inv_preemphasis(wav_b, hp.preemphasis)
    sc_b = float(_spec_conv_of_inversion(np.asarray(wav_b), lin, hp))

    # ---- speed at bench shapes
    rs = np.random.RandomState(0)
    mag = jnp.asarray((rs.rand(32, 600, 513) ** 4).astype(np.float32))

    def run_ref(m):
        return dsp.griffin_lim(m, fft, hop, win, n_iters=args.iters,
                               momentum=0.9, mats=mats, center=False,
                               phase_init="spsi")

    def run_b(m):
        return griffin_lim_bf16_carry(m, fft, hop, win, n_iters=args.iters,
                                      momentum=0.9, mats=mats)

    out = {}
    for name, fn in (("f32", run_ref), ("bf16c", run_b)):
        c = jax.jit(fn).lower(mag).compile()
        np.asarray(c(mag)[0, -4:])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.n):
                w = c(mag)
            np.asarray(w[0, -4:])
            walls.append((time.perf_counter() - t0) / args.n)
        out["ms_" + name] = round(min(walls) * 1000.0, 2)
    out["sc_f32"] = round(sc_f32, 4)
    out["sc_bf16c"] = round(sc_b, 4)
    out["iters"] = args.iters
    print(json.dumps(out))


if __name__ == "__main__":
    main()
