# coding: utf-8
"""Griffin-Lim as a single Pallas TPU kernel.

Runs the whole phase retrieval with everything VMEM-resident per batch
item. MEASURED VERDICT (v5e, batch-32 LJSpeech shapes, properly fenced):
this kernel is ~5x SLOWER at runtime than the XLA-scan path
(483 ms vs 88 ms per batch at 60 iterations) — the (B,) grid runs items
across just two megacores with per-item (600x513)@(513x1024) matmuls,
while XLA batches all 32 items into large GEMMs. Its remaining advantage
is compile time (~30x faster than the scan's XLA optimization at these
shapes), so it stays an opt-in (DV3_PALLAS_GL=1) for compile-latency-
sensitive uses; the XLA path is the default and the benchmarked one.

Layout:

  grid = (B,) — one item per grid step (parallel across megacores);
  scratch: spectrum re/im + previous-projection re/im (n, F), the
  overlap-add buffer (n+k-1, hop); inputs: the item's magnitudes, the DFT
  matrices (runtime args — constants would blow up compile), the window and
  the precomputed squared-window OLA normalizer.

Per iteration: iDFT matmuls -> windowed overlap-add (sublane-offset
accumulate, no scatter) -> re-framing expressed as k per-chunk matmuls
against row-slices of the DFT matrices (no lane concat — unimplemented in
Mosaic) -> momentum phase update. HBM traffic per item: read |S| once,
write the waveform once.

Boundary semantics: frames are taken from the raw overlap-add signal on
the analysis timeline — identical to the XLA path (stft.py:griffin_lim),
which re-frames the same raw OLA signal; both are framing-convention
agnostic inside the loop (validated in tests against the XLA path).
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
    (v4/v5-class) when the platform doesn't report capacity. On 16 MB-VMEM
    generations this makes Mosaic reject the launch with a budget error up
    front instead of crashing mid-compile (round-2 advisor finding)."""
    try:
        d = jax.devices()[0]
        cap = int(d.memory_stats().get("vmem_size_bytes", 0))
        if cap > 0:
            return int(cap * 0.78)
    except Exception:
        pass
    return 100 * 1024 * 1024


def _ola_norm(n_frames, fft_size, hop, window):
    """Squared-window overlap-add normalizer in (n+k-1, hop) block layout."""
    k = fft_size // hop
    nb = n_frames + k - 1
    norm = np.zeros((nb, hop), np.float32)
    w2 = (window * window).reshape(k, hop)
    for c in range(k):
        norm[c:c + n_frames, :] += w2[c]
    return np.maximum(norm, 1e-8)


def _make_kernel(n, fft, hop, n_bins, n_iters, momentum):
    k = fft // hop
    nb = n + k - 1
    eps = 1e-16

    def kernel(s_ref, m0_ref, m1_ref, m2_ref, m3_ref, win_ref, norm_ref,
               out_ref, cre_ref, cim_ref, tpre_ref, tpim_ref, y_ref):
        S = s_ref[0]                                     # (n, F)
        win = win_ref[...]                               # (k, hop)
        norm = norm_ref[...]                             # (nb, hop)

        cre_ref[...] = S
        cim_ref[...] = jnp.zeros_like(S)
        tpre_ref[...] = jnp.zeros_like(S)
        tpim_ref[...] = jnp.zeros_like(S)

        def synth_frames(re, im):
            """(n, F) spectrum -> windowed frames -> OLA into y_ref.

            The overlap-add is a sum of statically-padded chunks — static
            slices/pads only (Mosaic has no dynamic_slice on values)."""
            frames = (jnp.dot(re, m2_ref[...],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(im, m3_ref[...],
                                preferred_element_type=jnp.float32))
            y = jnp.zeros((nb, hop), jnp.float32)
            for c in range(k):
                chunk = frames[:, c * hop:(c + 1) * hop] * win[c][None, :]
                y = y + jnp.pad(chunk, ((c, nb - n - c), (0, 0)))
            y_ref[...] = y / norm

        def body(i, _):
            synth_frames(cre_ref[...], cim_ref[...])
            y = y_ref[...]
            # re-analysis: frame f = rows f..f+k-1 of y; windowed DFT as k
            # per-chunk matmuls against DFT row slices (no lane concat)
            tre = jnp.zeros((n, n_bins), jnp.float32)
            tim = jnp.zeros((n, n_bins), jnp.float32)
            for c in range(k):
                chunk = y[c:c + n, :] * win[c][None, :]
                tre = tre + jnp.dot(
                    chunk, m0_ref[c * hop:(c + 1) * hop, :],
                    preferred_element_type=jnp.float32)
                tim = tim + jnp.dot(
                    chunk, m1_ref[c * hop:(c + 1) * hop, :],
                    preferred_element_type=jnp.float32)
            a_re = tre + momentum * (tre - tpre_ref[...])
            a_im = tim + momentum * (tim - tpim_ref[...])
            mag = jnp.maximum(jnp.sqrt(a_re * a_re + a_im * a_im), eps)
            cre_ref[...] = S * a_re / mag
            cim_ref[...] = S * a_im / mag
            tpre_ref[...] = tre
            tpim_ref[...] = tim
            return 0

        jax.lax.fori_loop(0, n_iters, body, 0)
        synth_frames(cre_ref[...], cim_ref[...])
        out_ref[0] = y_ref[...]

    return kernel, nb


def griffin_lim_pallas(magnitude, fft_size, hop, window, *, n_iters=60,
                       momentum=0.99, length=None, mats=None,
                       interpret=None, center=True):
    """Drop-in for dsp.griffin_lim on TPU. magnitude: (B, n, F) -> (B, T).
    center selects the final trim only (see dsp.griffin_lim)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mats is None:
        mats = tuple(jnp.asarray(m) for m in dsp.dft_mats(fft_size))
    assert magnitude.ndim == 3, "pallas GL expects batched (B, n, F) input"
    B, n, F = magnitude.shape
    k = fft_size // hop
    assert fft_size % hop == 0

    kernel, nb = _make_kernel(n, fft_size, hop, F, n_iters, momentum)
    win2d = jnp.asarray(np.asarray(window, np.float32).reshape(k, hop))
    norm = jnp.asarray(_ola_norm(n, fft_size, hop,
                                 np.asarray(window, np.float32)))

    def full():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, n, F), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(), full(), full(), full(), full(), full()],
        out_specs=pl.BlockSpec((1, nb, hop), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, hop), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((n, F), jnp.float32),      # c_re
            pltpu.VMEM((n, F), jnp.float32),      # c_im
            pltpu.VMEM((n, F), jnp.float32),      # t_prev re
            pltpu.VMEM((n, F), jnp.float32),      # t_prev im
            pltpu.VMEM((nb, hop), jnp.float32),   # OLA buffer
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # the per-item working set (4 spectra + OLA buffer + DFT mats)
            # crosses Mosaic's default 16 MB scoped-vmem limit at LJSpeech
            # bench shapes (n=600 -> 16.02 MB). The limit is derived from
            # the attached device so the opt-in kernel fails with a clear
            # budget error (not a Mosaic crash) on small-VMEM generations;
            # it needs a >=64 MB-VMEM part (v4/v5-class) at bench shapes.
            vmem_limit_bytes=_device_vmem_budget()),
    )(magnitude.astype(jnp.float32), *mats, win2d, norm)

    wav = out.reshape(B, nb * hop)
    if center:
        wav = wav[:, fft_size // 2:]
    T = length if length is not None else hop * n
    return wav[:, :T]
