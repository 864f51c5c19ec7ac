"""v2 whole-retrieval Pallas Griffin-Lim probe: bf16 MXU dots.

The retired dsp/gl_pallas.py kernel (same structure: grid over batch,
whole sample VMEM-resident, all iterations in one kernel) measured
~252 us per item-iteration — 5x slower than the XLA scan — with all-f32
dots. This probe rebuilds the inner loop around bf16 operands (f32
accumulation) and an rsqrt magnitude projection, and measures:

  * per-iteration slope (time at --iters A vs B) to separate fixed
    launch/init cost from loop cost;
  * parity vs the XLA-scan griffin_lim (same bf16 carry, same spsi
    init) at quality level (spectral convergence on the golden fixture);
  * wall-clock at bench shapes vs the shipped XLA path.

    python tools/gl_pallas2_probe.py            # TPU timing + quality
    python tools/gl_pallas2_probe.py --interpret  # CPU correctness only
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def _ola_norm(n_frames, fft_size, hop, window):
    k = fft_size // hop
    nb = n_frames + k - 1
    norm = np.zeros((nb, hop), np.float32)
    w2 = (window * window).reshape(k, hop)
    for c in range(k):
        norm[c:c + n_frames, :] += w2[c]
    return np.maximum(norm, 1e-8)


def make_gl2(B, n, F, fft, hop, n_iters, momentum, interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = fft // hop
    nb = n + k - 1
    eps2 = 1e-30
    bf16 = jnp.bfloat16

    def kernel(s_ref, tri_ref, m0_ref, m1_ref, m2_ref, m3_ref,
               win_ref, inorm_ref, out_ref,
               cre_ref, cim_ref, tpre_ref, tpim_ref):
        S = s_ref[0]                                  # (n, F) f32
        win = win_ref[...]                            # (k, hop) f32
        inorm = inorm_ref[...]                        # (nb, hop) f32

        # SPSI init in-kernel (the XLA-side version costs 6.7 ms at bench
        # shapes — lane-axis concats + 8 elementwise passes over HBM; here
        # everything stays in VMEM and the frame-axis cumsum is one f32
        # triangular matmul). Mirrors dsp/stft.py:spsi_phase.
        col = jax.lax.broadcasted_iota(jnp.int32, (n, F), 1)
        # lane-axis neighbor shifts via circular roll + edge fix-up
        # (lane concatenate is unimplemented in Mosaic)
        left = jnp.where(col == 0, S, pltpu.roll(S, shift=1, axis=1))
        right = jnp.where(col == F - 1, S, pltpu.roll(S, shift=F - 1, axis=1))
        denom = left - 2.0 * S + right
        p = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (left - right) / jnp.where(
                          jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
        p = jnp.clip(p, -0.5, 0.5)
        kk = col.astype(jnp.float32)  # Mosaic iota is int-only
        omega = (2.0 * np.pi * hop / fft) * (kk + p)  # hop*omega, rad/frame
        # wrap each per-frame increment mod 2pi BEFORE the cumsum: the
        # cumulative sum then only differs by a multiple of 2pi (cos/sin
        # unchanged) but stays ~200x smaller, so the f32-on-MXU triangular
        # matmul keeps phase precision (unwrapped phi reaches 8e2*n rad).
        two_pi = np.float32(2.0 * np.pi)
        omega = omega - two_pi * jnp.floor(omega / two_pi)
        phi = jnp.dot(tri_ref[...], omega,            # inclusive cumsum
                      preferred_element_type=jnp.float32)
        cre_ref[...] = (S * jnp.cos(phi)).astype(bf16)
        cim_ref[...] = (S * jnp.sin(phi)).astype(bf16)
        tpre_ref[...] = jnp.zeros((n, F), bf16)
        tpim_ref[...] = jnp.zeros((n, F), bf16)

        def synth(re_b, im_b):
            """bf16 spectrum -> normalized OLA signal y (nb, hop) f32."""
            frames = (jnp.dot(re_b, m2_ref[...],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(im_b, m3_ref[...],
                                preferred_element_type=jnp.float32))
            y = jnp.zeros((nb, hop), jnp.float32)
            for c in range(k):
                chunk = frames[:, c * hop:(c + 1) * hop] * win[c][None, :]
                y = y + jnp.pad(chunk, ((c, nb - n - c), (0, 0)))
            return y * inorm

        def body(i, _):
            y = synth(cre_ref[...], cim_ref[...])
            tre = jnp.zeros((n, F), jnp.float32)
            tim = jnp.zeros((n, F), jnp.float32)
            for c in range(k):
                chunk = (y[c:c + n, :] * win[c][None, :]).astype(bf16)
                tre = tre + jnp.dot(chunk, m0_ref[c * hop:(c + 1) * hop, :],
                                    preferred_element_type=jnp.float32)
                tim = tim + jnp.dot(chunk, m1_ref[c * hop:(c + 1) * hop, :],
                                    preferred_element_type=jnp.float32)
            a_re = tre + momentum * (tre - tpre_ref[...].astype(jnp.float32))
            a_im = tim + momentum * (tim - tpim_ref[...].astype(jnp.float32))
            scale = S * jax.lax.rsqrt(a_re * a_re + a_im * a_im + eps2)
            cre_ref[...] = (a_re * scale).astype(bf16)
            cim_ref[...] = (a_im * scale).astype(bf16)
            tpre_ref[...] = tre.astype(bf16)
            tpim_ref[...] = tim.astype(bf16)
            return 0

        jax.lax.fori_loop(0, n_iters, body, 0)
        out_ref[0] = synth(cre_ref[...], cim_ref[...])

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def item(shape):
        return pl.BlockSpec((1,) + shape, lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def run(S, tri, mats, win2d, inorm):
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[item((n, F)),
                      full(), full(), full(), full(), full(), full(),
                      full()],
            out_specs=pl.BlockSpec((1, nb, hop), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, nb, hop), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((n, F), bf16),   # c_re
                pltpu.VMEM((n, F), bf16),   # c_im
                pltpu.VMEM((n, F), bf16),   # t_prev re
                pltpu.VMEM((n, F), bf16),   # t_prev im
            ],
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(S, tri, *mats, win2d, inorm)

    return run, nb


def gl2(magnitude, fft, hop, window, *, n_iters, momentum, mats,
        interpret=False, phase_init="spsi"):
    """Host-side wrapper: bf16 matrices + tri matrix; spsi init is
    in-kernel."""
    import jax.numpy as jnp

    B, n, F = magnitude.shape
    S = magnitude.astype(jnp.float32)
    tri = jnp.asarray(np.tril(np.ones((n, n), np.float32)))
    k = fft // hop
    win_np = np.asarray(window, np.float32)
    win2d = jnp.asarray(win_np.reshape(k, hop))
    inorm = jnp.asarray(1.0 / _ola_norm(n, fft, hop, win_np))
    mats_b = (mats[0].astype(jnp.bfloat16), mats[1].astype(jnp.bfloat16),
              mats[2].astype(jnp.bfloat16), mats[3].astype(jnp.bfloat16))
    run, nb = make_gl2(B, n, F, fft, hop, n_iters, momentum,
                       interpret=interpret)
    y = run(S, tri, mats_b, win2d, inorm)
    return y.reshape(B, nb * hop)[:, :hop * n]


def main():
    ap_ = argparse.ArgumentParser()
    ap_.add_argument("--iters", type=int, default=16)
    ap_.add_argument("--n", type=int, default=5)
    ap_.add_argument("--interpret", action="store_true")
    args = ap_.parse_args()

    import jax
    import jax.numpy as jnp
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        import jax.extend
        jax.extend.backend.clear_backends()
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepvoice3_pytorch_tpu.dsp import stft as dsp
    fft, hop = 1024, 256
    win = jnp.asarray(dsp.lws_hann_window(fft, hop))
    mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft))

    if args.interpret:
        # correctness: small shapes, compare against XLA bf16-carry loop
        rs = np.random.RandomState(0)
        mag = jnp.asarray((rs.rand(2, 37, 513) ** 2).astype(np.float32))
        w_k = np.asarray(gl2(mag, fft, hop, win, n_iters=4, momentum=0.9,
                             mats=mats, interpret=True))
        w_x = np.asarray(dsp.griffin_lim(
            mag, fft, hop, win, n_iters=4, momentum=0.9, mats=mats,
            center=False, phase_init="spsi", carry_dtype="bfloat16"))
        d = np.abs(w_k - w_x).max() / max(np.abs(w_x).max(), 1e-9)
        print("interpret parity vs XLA bf16-carry: max rel", round(float(d), 5))
        return

    # quality on golden fixture
    from test_dsp_golden import HP, _spec_conv_of_inversion, _load
    from deepvoice3_pytorch_tpu.dsp import audio as dva
    hp = HP()
    lin = _load("linear")
    spec = jnp.asarray(lin).T[None]
    S_amp = dva.dsp.db_to_amp(
        dva.dsp.denormalize(spec, hp.min_level_db)
        + hp.ref_level_db) ** hp.power
    wav = gl2(S_amp, fft, hop, win, n_iters=args.iters, momentum=0.9,
              mats=mats)
    wav = dva.dsp.inv_preemphasis(wav, hp.preemphasis)[0]
    sc = float(_spec_conv_of_inversion(np.asarray(wav), lin, hp))

    # speed at bench shapes vs shipped XLA path
    rs = np.random.RandomState(0)
    mag = jnp.asarray((rs.rand(32, 600, 513) ** 4).astype(np.float32))

    out = {"sc_golden": round(sc, 4), "iters": args.iters}
    for iters in (4, args.iters):
        c = jax.jit(functools.partial(
            gl2, fft=fft, hop=hop, window=win, n_iters=iters, momentum=0.9,
            mats=mats)).lower(mag).compile()
        np.asarray(c(mag)[0, -4:])
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.n):
                w = c(mag)
            np.asarray(w[0, -4:])
            walls.append((time.perf_counter() - t0) / args.n)
        out["ms_pallas2_%d" % iters] = round(min(walls) * 1000.0, 2)

    def run_x(m):
        return dsp.griffin_lim(m, fft, hop, win, n_iters=args.iters,
                               momentum=0.9, mats=mats, center=False,
                               phase_init="spsi", carry_dtype="bfloat16")
    c = jax.jit(run_x).lower(mag).compile()
    np.asarray(c(mag)[0, -4:])
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.n):
            w = c(mag)
        np.asarray(w[0, -4:])
        walls.append((time.perf_counter() - t0) / args.n)
    out["ms_xla_bf16c"] = round(min(walls) * 1000.0, 2)
    ms4, msN = out["ms_pallas2_4"], out["ms_pallas2_%d" % args.iters]
    if args.iters != 4:
        out["us_per_item_iter"] = round(
            (msN - ms4) * 1000.0 / (args.iters - 4) / 32, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
