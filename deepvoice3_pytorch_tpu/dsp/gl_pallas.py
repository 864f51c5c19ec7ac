# coding: utf-8
"""Griffin-Lim phase retrieval as a single whole-retrieval Pallas TPU kernel.

This is the DEFAULT vocoder path on TPU (see dsp/audio.py). Measured on
v5e at LJSpeech bench shapes, (32, 600, 513) x 16 iterations, properly
fenced: **14.5 ms vs 24.4 ms** for the XLA-scan loop (stft.py:griffin_lim
with the bf16 carry) at equal golden-fixture quality (spectral
convergence 0.1412 vs 0.1395; the lws-parity bar is 0.159) — 1.68x.
Probe history in tools/gl_pallas2_probe.py.

Why it wins (and why the retired v1 kernel lost): the loop is
HBM-bandwidth-bound. Each grid step keeps ONE batch item's entire
retrieval state resident in VMEM across ALL iterations — HBM traffic is
one read of |S| and one write of the waveform — and every DFT matmul runs
bf16 operands with f32 accumulation on the MXU (~17 us per item-iteration
vs 252 us for the v1 kernel's all-f32 dots). The SPSI phase init also
lives in-kernel: the XLA-side version costs 6.7 ms of fixed time at bench
shapes (lane-axis concats + 8 elementwise HBM passes over a 39 MB
tensor); in VMEM it is two rolls, one triangular-matmul cumsum and a
cos/sin.

Numerical notes:
  * carries (spectrum re/im + previous projection re/im) are stored
    bf16; momentum and the magnitude projection (rsqrt) compute in f32 —
    same recipe as the XLA path's carry_dtype="bfloat16" mode.
  * the SPSI frame-axis cumsum is an f32 triangular matmul whose
    per-frame phase increments are wrapped mod 2pi FIRST: the cumulative
    sums then differ only by multiples of 2pi (cos/sin unchanged) but
    stay ~200x smaller, preserving phase precision through the
    MXU's emulated-f32 accumulation (unwrapped, phi reaches 8e2*n rad
    and quality degrades to sc 0.1551).
  * boundary semantics: frames are re-taken from the raw overlap-add
    signal on the analysis timeline — identical to the XLA path, which
    re-frames the same raw OLA signal; `center` only selects the final
    trim. Re-framing is k per-chunk matmuls against row slices of the
    DFT matrices (lane-axis concatenate is unimplemented in Mosaic).

VMEM: the per-item working set (4 bf16 spectra, the f32 OLA buffer, the
bf16 DFT matrices, and the matmul operands) is ~13 MB at n=600 — the
scoped-vmem limit is derived from the attached device so small-VMEM
generations fail with a clear budget error up front (round-2 advisor
finding); bench shapes want a >=64 MB-VMEM part (v4/v5-class).

Replaces the lws phase-retrieval call in the reference's inversion chain
(reference audio.py:37-43) — quality equivalence is measured against the
clean-room lws golden model in tests/test_dsp_golden.py.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import stft as dsp


def _device_vmem_budget():
    """Scoped-vmem limit for the kernel, derived from the attached device:
    ~78% of core VMEM (leaves compiler headroom), falling back to 100 MB
    (v4/v5-class) when the platform doesn't report capacity."""
    try:
        d = jax.devices()[0]
        cap = int(d.memory_stats().get("vmem_size_bytes", 0))
        if cap > 0:
            return int(cap * 0.78)
    except Exception:
        pass
    return 100 * 1024 * 1024


def vmem_bytes_estimate(n, fft_size, hop, n_bins, with_init=False,
                        return_spec=False, block_items=1):
    """Resident-VMEM footprint of one grid step of the whole-retrieval
    kernel: magnitude + bf16 scratch spectra + DFT matrices + OLA buffer +
    matmul temporaries (~13 MB at n=600, F=513, G=1 — matches the
    header's number). With block_items=G the per-item terms scale by G
    while the DFT matrices stay shared."""
    G = block_items
    k = fft_size // hop
    n = -(-n // 16) * 16 if G > 1 else n    # the G>1 path pads frames
    nb = n + k - 1
    if G > 1:
        nb = -(-nb // 16) * 16
    nF = n * n_bins
    # per-item terms, calibrated against the compiler's own scoped-vmem
    # accounting (it reported 110.11 MB for G=8, n=608, F=513 — 13.76
    # MB/item + 4.5 MB shared; this formula gives 13.76):
    per = 4 * nF            # magnitude block (f32)
    per += 8 * nF           # 4 bf16 scratch spectra
    per += 8 * nF           # analysis accumulators tre/tim (f32)
    per += 8 * nF           # momentum/projection f32 temporaries
    per += 4 * nF           # accounting slop (measured residual)
    per += 4 * n * fft_size  # synth frames temporary (f32)
    per += 8 * nb * hop     # f32 OLA buffer + output block
    if with_init:
        per += 8 * nF       # explicit (re, im) init blocks (f32)
    if return_spec:
        per += 8 * nF       # retrieved-spectrum output blocks (f32)
    total = per * G
    total += 8 * fft_size * n_bins   # 4 bf16 DFT matrices (shared)
    return total


def fits_vmem(n, fft_size, hop, n_bins, **kw):
    """True when the whole-retrieval kernel can run this configuration on
    this device: the working set fits the VMEM budget AND hop divides
    fft_size (the kernel's framing/OLA are (k, hop)-block reshapes —
    non-divisible hops, e.g. a 16 kHz fft1024/hop240 corpus, take the
    XLA-scan griffin_lim, whose gather framing handles any hop). Callers
    fall back to XLA GL when False (the reference never hard-fails by
    device generation — audio.py:37-43 runs anywhere)."""
    if fft_size % hop != 0:
        return False
    return vmem_bytes_estimate(n, fft_size, hop, n_bins, **kw) \
        <= _device_vmem_budget()


def auto_block_items(B, n, fft_size, hop, n_bins, **kw):
    """Largest divisor of B whose G-item grid step fits the VMEM budget.
    Grid steps are SEQUENTIAL on a TPU core, so batching G items per step
    amortizes the per-item fixed work (in-kernel SPSI, final synthesis,
    per-step pipeline overhead) and fattens every DFT GEMM from n rows to
    G*n — the measured win grows as n shrinks (see DESIGN.md §4.1 and
    tools/gl_blockitems_probe.py)."""
    for g in range(min(B, 32), 1, -1):
        if B % g == 0 and fits_vmem(n, fft_size, hop, n_bins,
                                    block_items=g, **kw):
            return g
    return 1


def _ola_norm(n_frames, fft_size, hop, window):
    """Squared-window overlap-add normalizer in (n+k-1, hop) block layout,
    pre-inverted (the kernel multiplies)."""
    k = fft_size // hop
    nb = n_frames + k - 1
    norm = np.zeros((nb, hop), np.float32)
    w2 = (window * window).reshape(k, hop)
    for c in range(k):
        norm[c:c + n_frames, :] += w2[c]
    return 1.0 / np.maximum(norm, 1e-8)


def _make_kernel(n, fft, hop, n_bins, n_iters, momentum, phase_init,
                 fold_windows, n_pinned=0, return_spec=False, G=1):
    """G = items per grid step. The caller collapses (B, n, F) blocks to
    (B/G, G*n, F): the DFT matmuls run on all G*n rows at once (per-frame
    independent), while OLA, re-framing and the SPSI cumsum — the only
    per-item structure — run as static G-loops. For G>1 the caller pads
    n to a multiple of 16 so per-item slices stay tile-aligned; nb is
    likewise padded so per-item OLA buffers concatenate cleanly."""
    k = fft // hop
    nb = n + k - 1
    if G > 1:
        assert n % 16 == 0, n
        nb = -(-nb // 16) * 16
    eps2 = 1e-30
    F = n_bins
    bf16 = jnp.bfloat16
    momentum = np.float32(momentum)
    with_init = phase_init == "given"
    assert not (n_pinned and not with_init), \
        "pinning requires an explicit init spectrum"

    def kernel(*refs):
        # positional unpack: inputs [S, (i_re, i_im)?, mats x4, win, inorm],
        # outputs [out, (spec_re, spec_im)?], scratch [cre, cim, tpre, tpim]
        it = iter(refs)
        s_ref = next(it)
        if with_init:
            ire_ref, iim_ref = next(it), next(it)
        m0_ref, m1_ref, m2_ref, m3_ref = (next(it) for _ in range(4))
        win_ref, inorm_ref, out_ref = next(it), next(it), next(it)
        if return_spec:
            sre_ref, sim_ref = next(it), next(it)
        cre_ref, cim_ref, tpre_ref, tpim_ref = (next(it) for _ in range(4))

        N = G * n
        S = s_ref[0]                                  # (N, F) f32
        win = win_ref[...]                            # (k, hop) f32
        inorm = inorm_ref[...]                        # (nb, hop) f32

        if n_pinned:
            # streaming boundary condition: the first n_pinned frames of
            # EACH item are already-played audio — hold them at their init
            # values through every iteration (same rule as the XLA path's
            # pinned_prefix; the init's prefix IS the previous window's
            # retrieved spectrum)
            rowix = jax.lax.broadcasted_iota(jnp.int32, (N, F), 0)
            pinmask = rowix % n < n_pinned

        if with_init:
            # explicit (re, im) start (phase-coherent streaming windows):
            # re-impose S on the given phases, exactly like the XLA path
            i_re, i_im = ire_ref[0], iim_ref[0]       # (N, F) f32
            scale0 = S * jax.lax.rsqrt(i_re * i_re + i_im * i_im + eps2)
            pin_re = (i_re * scale0).astype(bf16)
            pin_im = (i_im * scale0).astype(bf16)
            cre_ref[...] = pin_re
            cim_ref[...] = pin_im
        elif phase_init == "spsi":
            # In-kernel SPSI (mirrors stft.py:spsi_phase): per-bin
            # instantaneous frequency by parabolic interpolation of the
            # magnitude triplet, integrated hop*omega per frame.
            col = jax.lax.broadcasted_iota(jnp.int32, (N, F), 1)
            # lane-axis neighbor shifts via circular roll + edge
            # replicate fix-up (no lane concat in Mosaic)
            left = jnp.where(col == 0, S, pltpu.roll(S, shift=1, axis=1))
            right = jnp.where(col == F - 1, S,
                              pltpu.roll(S, shift=F - 1, axis=1))
            denom = left - 2.0 * S + right
            p = jnp.where(jnp.abs(denom) > 1e-12,
                          0.5 * (left - right) / jnp.where(
                              jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
            p = jnp.clip(p, -0.5, 0.5)
            kk = col.astype(jnp.float32)  # Mosaic iota is int-only
            omega = (2.0 * np.pi * hop / fft) * (kk + p)   # rad/frame
            # wrap increments mod 2pi BEFORE the cumsum (see header)
            two_pi = np.float32(2.0 * np.pi)
            omega = omega - two_pi * jnp.floor(omega / two_pi)
            row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            colr = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            tri = (row >= colr).astype(jnp.float32)  # inclusive cumsum
            # the cumsum is per item: one (n,n)x(n,F) dot per grid item
            # (phase must not integrate across item boundaries)
            phis = [jnp.dot(tri, omega[g * n:(g + 1) * n],
                            preferred_element_type=jnp.float32)
                    for g in range(G)]
            phi = phis[0] if G == 1 else jnp.concatenate(phis, axis=0)
            cre_ref[...] = (S * jnp.cos(phi)).astype(bf16)
            cim_ref[...] = (S * jnp.sin(phi)).astype(bf16)
        else:  # zero phase (classic)
            cre_ref[...] = S.astype(bf16)
            cim_ref[...] = jnp.zeros((N, F), bf16)
        tpre_ref[...] = jnp.zeros((N, F), bf16)
        tpim_ref[...] = jnp.zeros((N, F), bf16)

        def synth(re_b, im_b):
            """bf16 spectrum (N, F) -> normalized per-item OLA signals,
            concatenated (G*nb, hop) f32. Static slices/pads only (no
            dynamic_slice on values); the frame->time DFT runs as ONE
            (N, F)x(F, fft) GEMM across all G items."""
            frames = (jnp.dot(re_b, m2_ref[...],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(im_b, m3_ref[...],
                                preferred_element_type=jnp.float32))
            ys = []
            for g in range(G):
                fr = frames if G == 1 else frames[g * n:(g + 1) * n]
                y = jnp.zeros((nb, hop), jnp.float32)
                for c in range(k):
                    chunk = fr[:, c * hop:(c + 1) * hop]
                    if not fold_windows:
                        chunk = chunk * win[c][None, :]
                    y = y + jnp.pad(chunk, ((c, nb - n - c), (0, 0)))
                ys.append(y * inorm)
            return ys[0] if G == 1 else jnp.concatenate(ys, axis=0)

        def body(i, _):
            y = synth(cre_ref[...], cim_ref[...])
            # re-analysis: item g's frame f = rows f..f+k-1 of its OLA
            # signal y[g*nb:(g+1)*nb]; the time->frame DFT runs as ONE
            # (N, hop)x(hop, F) GEMM per chunk across all G items
            tre = jnp.zeros((N, F), jnp.float32)
            tim = jnp.zeros((N, F), jnp.float32)
            for c in range(k):
                if G == 1:
                    chunk = y[c:c + n, :]
                else:
                    chunk = jnp.concatenate(
                        [y[g * nb + c:g * nb + c + n, :] for g in range(G)],
                        axis=0)
                if fold_windows:
                    chunk = chunk.astype(bf16)
                else:
                    chunk = (chunk * win[c][None, :]).astype(bf16)
                tre = tre + jnp.dot(
                    chunk, m0_ref[c * hop:(c + 1) * hop, :],
                    preferred_element_type=jnp.float32)
                tim = tim + jnp.dot(
                    chunk, m1_ref[c * hop:(c + 1) * hop, :],
                    preferred_element_type=jnp.float32)
            # momentum + magnitude projection in f32
            a_re = tre + momentum * (tre - tpre_ref[...].astype(jnp.float32))
            a_im = tim + momentum * (tim - tpim_ref[...].astype(jnp.float32))
            scale = S * jax.lax.rsqrt(a_re * a_re + a_im * a_im + eps2)
            c_re = (a_re * scale).astype(bf16)
            c_im = (a_im * scale).astype(bf16)
            if n_pinned:
                c_re = jnp.where(pinmask, pin_re, c_re)
                c_im = jnp.where(pinmask, pin_im, c_im)
            cre_ref[...] = c_re
            cim_ref[...] = c_im
            tpre_ref[...] = tre.astype(bf16)
            tpim_ref[...] = tim.astype(bf16)
            return 0

        jax.lax.fori_loop(0, n_iters, body, 0)
        out_ref[0] = synth(cre_ref[...], cim_ref[...])
        if return_spec:
            sre_ref[0] = cre_ref[...].astype(jnp.float32)
            sim_ref[0] = cim_ref[...].astype(jnp.float32)

    return kernel, nb


def _round16(v):
    return -(-v // 16) * 16


def griffin_lim_pallas(magnitude, fft_size, hop, window, *, n_iters=60,
                       momentum=0.99, length=None, mats=None,
                       interpret=None, center=True, phase_init="zero",
                       fold_windows=True, init_spec=None, n_pinned=0,
                       return_spec=False, block_items=None):
    """Drop-in for dsp.griffin_lim on TPU (bf16 carry semantics).

    magnitude: (B, n, F) or (n, F) -> (B, T) / (T,).
    phase_init: "spsi" (in-kernel, production default via hparams) or
        "zero". center selects the final trim only (see dsp.griffin_lim).
    init_spec: explicit (re, im) start, shaped like magnitude — overrides
        phase_init (magnitudes are re-imposed in-kernel). The streaming
        vocoder passes the previous window's retrieved spectrum here.
    n_pinned: hold the first n_pinned frames at their init values through
        every iteration (streaming boundary condition; requires
        init_spec) — the XLA path's pinned_prefix, in-kernel.
    return_spec: also return the final retrieved (re, im) spectrum
        (f32) — the streaming carry.
    fold_windows: pre-multiply the synthesis/analysis windows into the
        bf16 DFT matrices (same exact transform the XLA path applies) —
        removes 2k per-chunk VPU multiplies per iteration. Measured
        NEUTRAL on v5e (13.31 vs 13.40 ms at bench shapes): unlike the
        XLA loop, where folding saved 5.7% of HBM traffic, the kernel's
        operands already live in VMEM, so the multiplies it removes were
        nearly free. Kept on (fewer ops, identical quality bars).
    block_items: items per (sequential) grid step (default 1; "auto" =
        largest divisor of B whose working set fits VMEM). Measured
        NEGATIVE on v5e (tools/gl_blockitems_probe.py, DESIGN.md §4.1):
        end-to-end neutral at every production shape (0.89-1.08x) —
        grid items already pipeline back-to-back and the per-item GEMMs
        fill the MXU at n>=112; at tiny windows the in-kernel win
        (1.90->1.53 ms per 224 iterations at n=24, G=8) is buried under
        per-call dispatch. Kept as an opt-in because the logic is exact
        (per-item OLA/framing/SPSI loops, same op order; agreement to
        GEMM ulp-level — backend matmul blocking differs by row count)
        and the win could matter on hosts where dispatch is cheap and
        windows are tiny.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mats is None:
        mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft_size))
    squeeze = magnitude.ndim == 2
    if squeeze:
        magnitude = magnitude[None]
        if init_spec is not None:
            init_spec = tuple(a[None] for a in init_spec)
    assert magnitude.ndim == 3, "pallas GL expects (B, n, F) input"
    B, n, F = magnitude.shape
    n_orig = n
    k = fft_size // hop
    assert fft_size % hop == 0
    if init_spec is not None:
        phase_init = "given"
        assert init_spec[0].shape == magnitude.shape, \
            (init_spec[0].shape, magnitude.shape)

    if block_items in (None, 1):
        G = 1
    elif block_items == "auto":
        G = auto_block_items(B, n, fft_size, hop, F,
                             with_init=init_spec is not None,
                             return_spec=return_spec)
    else:
        G = int(block_items)
        assert B % G == 0, (B, G)
    if G > 1 and n % 16:
        # pad per-item frames to the tile boundary with zero-magnitude
        # rows: zero magnitude => the projection holds their spectrum at
        # exactly 0 every iteration, so they synthesize nothing and the
        # normalizer (built for the ORIGINAL n) keeps real rows exact
        pad_n = _round16(n) - n
        magnitude = jnp.pad(magnitude, ((0, 0), (0, pad_n), (0, 0)))
        if init_spec is not None:
            init_spec = tuple(
                jnp.pad(a, ((0, 0), (0, pad_n), (0, 0))) for a in init_spec)
        n += pad_n

    kernel, nb = _make_kernel(n, fft_size, hop, F, n_iters, momentum,
                              phase_init, fold_windows,
                              n_pinned=n_pinned, return_spec=return_spec,
                              G=G)
    win_np = np.asarray(window, np.float32)
    win2d = jnp.asarray(win_np.reshape(k, hop))
    inorm_np = _ola_norm(n_orig, fft_size, hop, win_np)
    if nb > inorm_np.shape[0]:      # padded rows synthesize nothing
        inorm_np = np.pad(inorm_np,
                          ((0, nb - inorm_np.shape[0]), (0, 0)))
    inorm = jnp.asarray(inorm_np)
    bf16 = jnp.bfloat16
    if fold_windows:
        wcol = jnp.asarray(win_np)
        # m0/m1 are (fft, F): scale rows by the analysis window;
        # m2/m3 are (F, fft): scale columns by the synthesis window.
        mats_b = (
            (mats[0] * wcol[:, None]).astype(bf16),
            (mats[1] * wcol[:, None]).astype(bf16),
            (mats[2] * wcol[None, :]).astype(bf16),
            (mats[3] * wcol[None, :]).astype(bf16),
        )
    else:
        mats_b = tuple(m.astype(bf16) for m in mats)

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def item_block():
        return pl.BlockSpec((1, G * n, F), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def collapse(a):
        # (B, n, F) -> (B/G, G*n, F): G items per grid step, contiguous
        return a.reshape(B // G, G * n, F) if G > 1 else a

    inputs = [collapse(magnitude.astype(jnp.float32))]
    in_specs = [item_block()]
    if init_spec is not None:
        inputs += [collapse(a.astype(jnp.float32)) for a in init_spec]
        in_specs += [item_block(), item_block()]
    inputs += [*mats_b, win2d, inorm]
    in_specs += [full()] * 6

    out_specs = [pl.BlockSpec((1, G * nb, hop), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B // G, G * nb, hop), jnp.float32)]
    if return_spec:
        out_specs += [item_block(), item_block()]
        out_shape += [jax.ShapeDtypeStruct((B // G, G * n, F),
                                           jnp.float32)] * 2

    outs = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_specs if return_spec else out_specs[0],
        out_shape=out_shape if return_spec else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((G * n, F), bf16),   # c_re
            pltpu.VMEM((G * n, F), bf16),   # c_im
            pltpu.VMEM((G * n, F), bf16),   # t_prev re
            pltpu.VMEM((G * n, F), bf16),   # t_prev im
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_device_vmem_budget()),
    )(*inputs)

    out = outs[0] if return_spec else outs
    wav = out.reshape(B, nb * hop)
    if center:
        wav = wav[:, fft_size // 2:]
    T = length if length is not None else hop * n_orig
    wav = wav[:, :T]
    if squeeze:
        wav = wav[0]
    if return_spec:
        sre = outs[1].reshape(B, n, F)[:, :n_orig]
        sim = outs[2].reshape(B, n, F)[:, :n_orig]
        spec = (sre[0], sim[0]) if squeeze else (sre, sim)
        return wav, spec
    return wav
