# coding: utf-8
"""Core weight-normalized ops, TPU-first.

Functional equivalents of the reference's weight-normalized layer factories
(reference: deepvoice3_pytorch/modules.py:80-109). Parameters are plain pytrees
(dicts of jnp arrays) and every layer is a pure `init(rng, ...) -> params` /
`apply(params, x, ...) -> y` pair, so the whole model jits, shards and
differentiates as one XLA program.

Layout conventions (TPU-friendly, channels-last so C maps to the 128-wide lane
dimension):
  * activations:        (B, T, C)
  * Linear v:           (in, out)                  g: (out,)   b: (out,)
  * Conv1d v:           (kw, in, out)              g: (out,)   b: (out,)
  * ConvTranspose1d v:  (kw, in, out)              g: (in,)    b: (out,)

Weight norm follows torch.nn.utils.weight_norm(dim=0) semantics on the torch
layouts: Linear (out,in) -> per-out-row norm; Conv1d (out,in,kw) -> per-out
norm over (in,kw); ConvTranspose1d (in,out,kw) -> per-IN norm over (out,kw).
The axes above are the transposed equivalents for our layouts.
"""

import contextvars
import math
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# weight-norm helpers
# ---------------------------------------------------------------------------

_EPS = 0.0  # torch weight_norm has no epsilon; keep exact


def _wn_weight(v, g, axes):
    """w = g * v / ||v||  with the norm taken over `axes` (broadcast on the rest)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
    gshape = [1] * v.ndim
    for i, s in enumerate(v.shape):
        if i not in axes:
            gshape[i] = s
    return v * (g.reshape(gshape) / norm)


def linear_weight(p):
    """Effective (in, out) weight of a weight-normalized linear layer."""
    return _wn_weight(p["v"], p["g"], axes=(0,))


def conv1d_weight(p):
    """Effective (kw, in, out) weight of a weight-normalized conv layer."""
    return _wn_weight(p["v"], p["g"], axes=(0, 1))


def conv_transpose1d_weight(p):
    """Effective (kw, in, out) weight; norm per input channel (torch dim=0
    on the (in, out, kw) torch layout)."""
    return _wn_weight(p["v"], p["g"], axes=(0, 2))


# ---------------------------------------------------------------------------
# initializers (match reference init distributions: modules.py:80-109)
# ---------------------------------------------------------------------------


def linear_init(rng, in_features, out_features, dropout=0.0, dtype=jnp.float32):
    """Weight-normalized Linear (reference modules.py:80-85)."""
    std = math.sqrt((1.0 - dropout) / in_features)
    v = std * jax.random.normal(rng, (in_features, out_features), dtype=jnp.float32)
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=0))
    return {
        "v": v.astype(dtype),
        "g": g.astype(dtype),
        "b": jnp.zeros((out_features,), dtype),
    }


def linear_apply(p, x, *, precision=None):
    w = linear_weight(p)
    return jnp.dot(x, w, precision=precision, preferred_element_type=x.dtype) + p["b"]


def embedding_init(rng, num_embeddings, embedding_dim, padding_idx=None, std=0.01,
                   dtype=jnp.float32):
    """Embedding (reference modules.py:88-91)."""
    w = std * jax.random.normal(rng, (num_embeddings, embedding_dim), dtype=jnp.float32)
    if padding_idx is not None:
        w = w.at[padding_idx].set(0.0)
    return {"w": w.astype(dtype)}


def embedding_apply(p, ids):
    return jnp.take(p["w"], ids, axis=0)


def conv1d_init(rng, in_channels, out_channels, kernel_size, dropout=0.0,
                std_mul=4.0, dtype=jnp.float32):
    """Weight-normalized Conv1d with fan-in scaled init (modules.py:94-100)."""
    std = math.sqrt((std_mul * (1.0 - dropout)) / (kernel_size * in_channels))
    v = std * jax.random.normal(
        rng, (kernel_size, in_channels, out_channels), dtype=jnp.float32)
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))
    return {
        "v": v.astype(dtype),
        "g": g.astype(dtype),
        "b": jnp.zeros((out_channels,), dtype),
    }


def conv_transpose1d_init(rng, in_channels, out_channels, kernel_size, dropout=0.0,
                          std_mul=1.0, dtype=jnp.float32):
    """Weight-normalized ConvTranspose1d (modules.py:103-109)."""
    std = math.sqrt((std_mul * (1.0 - dropout)) / (kernel_size * in_channels))
    v = std * jax.random.normal(
        rng, (kernel_size, in_channels, out_channels), dtype=jnp.float32)
    # torch weight_norm dim=0 on (in, out, kw): norm per input channel
    g = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2)))
    return {
        "v": v.astype(dtype),
        "g": g.astype(dtype),
        "b": jnp.zeros((out_channels,), dtype),
    }


# ---------------------------------------------------------------------------
# conv applications
# ---------------------------------------------------------------------------

_DN = ("NWC", "WIO", "NWC")  # batch-time-channel activations, (kw,in,out) kernels


# How kw>1 convs lower: "tapsum" = kw shifted (B*T,C)x(C,Cout) matmuls
# summed — plain MXU GEMMs, no convolution HLO. "xla" =
# lax.conv_general_dilated (XLA's TPU conv emitter). "im2col" = one
# (B*T, kw*C)x(kw*C, Cout) matmul over a gathered window. All three are
# numerically equivalent modulo tap summation order.
#
# The winner is CONTEXT-dependent (both measured on v5e, round 4):
#  * train step b64-bf16 (tools/conv_gemm_probe.py): tapsum 19.26 ms
#    vs xla 20.43 vs im2col 21.29 — XLA's conv emitter drags the
#    backward pass; the seq2seq half runs 10.7 -> 9.12 ms (+8-10 MFU).
#  * full-sequence inference b32 T600 f32 (fixed-length synthesis):
#    xla 9.16 ms vs tapsum 11.91 — forward-only, XLA's fused conv
#    emitter wins and tapsum's kw separate GEMM launches lose.
# So: the default lowering is "xla", and the training step re-traces
# its body under conv_lowering("tapsum") (trainer.py). Full table in
# DESIGN.md §4.1. DV3_CONV1D_MODE / DV3_CONV1D_MODE_TRAIN override.
CONV1D_MODE_DEFAULT = os.environ.get("DV3_CONV1D_MODE", "xla")
CONV1D_MODE_TRAIN = os.environ.get(
    "DV3_CONV1D_MODE_TRAIN", os.environ.get("DV3_CONV1D_MODE", "tapsum"))

# ContextVar, not a module global: tracing can happen on several threads at
# once (the serve worker lazily compiles new text-bucket programs while a
# train_step retrace runs elsewhere), and contextvars give each thread its
# own mode without any locking — a plain global would bake the train
# lowering into a concurrently-traced inference program.
_conv1d_mode = contextvars.ContextVar("dv3_conv1d_mode",
                                      default=CONV1D_MODE_DEFAULT)


def current_conv_mode():
    """Conv1d lowering mode in effect for the current thread/context."""
    return _conv1d_mode.get()


class strict_numerics:
    """Strict-parity trace context (round-4 verdict #2, north-star
    "bit-matching mel vs PyTorch CPU" — BASELINE.json).

    Composes the two numerics knobs that matter on TPU:
      * jax.default_matmul_precision("highest") — full-f32 MXU passes
        instead of the default bf16x3 decomposition (the dominant error
        term on TPU: ~1e-3 relative at these channel widths without it);
      * conv_lowering("tapsum") — kw explicit shifted GEMMs, the lowering
        whose tap-summation order matches torch's unfold-accumulate
        (measured the tightest of the three against torch CPU:
        whole-model linear 7.7e-7 vs 1.3e-6 for XLA's conv emitter,
        tools/strict_parity_probe.py).

    What remains inside this context is the irreducible cross-backend
    floor, measured ~1e-6 whole-model (DESIGN.md §8): GEMM reduction
    order (Eigen/MKL vs MXU tiling, ~1 ulp per dot) and transcendental
    implementations (exp/sigmoid/erf differ by ~1 ulp between torch CPU
    and XLA). tests/test_model_parity.py pins <=1e-5 under this context.
    """

    def __enter__(self):
        self._mm = jax.default_matmul_precision("highest")
        self._mm.__enter__()
        self._conv = conv_lowering("tapsum")
        self._conv.__enter__()

    def __exit__(self, *exc):
        self._conv.__exit__(*exc)
        self._mm.__exit__(*exc)


class conv_lowering:
    """Trace-time selector for the conv1d lowering mode.

    Use INSIDE a function being jitted (the body runs at trace time, so
    retraces re-enter the context): trainer.py wraps its loss/grad in
    `with conv_lowering(CONV1D_MODE_TRAIN):`. Runtime cost: zero — the
    choice is baked into the traced HLO. Exception-safe and per-thread
    (ContextVar token reset)."""

    def __init__(self, mode):
        self.mode = mode

    def __enter__(self):
        self._token = _conv1d_mode.set(self.mode)

    def __exit__(self, *exc):
        _conv1d_mode.reset(self._token)


def conv1d_apply(p, x, *, dilation=1, padding="same", causal=False,
                 precision=None):
    """1D convolution on (B, T, C) input, output length == input length.

    padding semantics mirror the reference (modules.py:112-167):
      * causal: left-pad (kw-1)*dilation (reference pads both sides then trims
        the tail, which is equivalent)
      * non-causal: symmetric (kw-1)//2*dilation on each side (odd kernels)
    """
    w = conv1d_weight(p)
    kw = w.shape[0]
    if kw == 1:
        # 1x1 conv is a matmul: keep it on the MXU without im2col
        return jnp.dot(x, w[0], precision=precision,
                       preferred_element_type=x.dtype) + p["b"]
    if causal:
        pad = ((kw - 1) * dilation, 0)
    elif padding == "same":
        pad = ((kw - 1) // 2 * dilation,) * 2
    else:
        pad = padding
    mode = _conv1d_mode.get()
    if mode == "pallas":
        # Pallas tap-accumulating kernel (ops/conv_pallas.py): one HBM
        # read of x and one write of y instead of tapsum's per-tap GEMM
        # round-trips. Falls back to tapsum when the call site is outside
        # the kernel contract (returns None: length-changing padding or
        # no VMEM-feasible batch block).
        from . import conv_pallas
        y = conv_pallas.conv1d_pallas(x, w, p["b"], pad, dilation)
        if y is not None:
            return y
        mode = "tapsum"
    if mode != "xla":
        T = x.shape[1]
        xp = jnp.pad(x, ((0, 0), pad, (0, 0)))
        taps = [lax.slice_in_dim(xp, j * dilation, j * dilation + T, axis=1)
                for j in range(kw)]
        if mode == "im2col":
            col = jnp.concatenate(taps, axis=-1)       # (B, T, kw*C)
            w2 = w.reshape(kw * w.shape[1], w.shape[2])
            return jnp.dot(col, w2, precision=precision,
                           preferred_element_type=x.dtype) + p["b"]
        assert mode == "tapsum", mode
        y = jnp.dot(taps[0], w[0], precision=precision,
                    preferred_element_type=x.dtype)
        for j in range(1, kw):
            y = y + jnp.dot(taps[j], w[j], precision=precision,
                            preferred_element_type=x.dtype)
        return y + p["b"]
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=(pad,),
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        precision=precision,
    )
    return out + p["b"]


def conv_transpose1d_apply(p, x, *, stride=2, precision=None):
    """Transposed conv on (B, T, C) -> (B, T*stride, C_out).

    The reference only uses kernel_size==stride (2, 2) upsampling
    (deepvoice3.py:519,527; nyanko.py:372,377), for which the transposed conv
    is exactly a per-step matmul followed by an interleave — a single MXU
    matmul here instead of a scatter.
    """
    w = conv_transpose1d_weight(p)  # (kw, in, out)
    kw, cin, cout = w.shape
    if kw == stride:
        B, T, _ = x.shape
        # y[b, t*stride + j, o] = sum_i x[b,t,i] * w[j,i,o] + b[o]
        w2 = w.transpose(1, 0, 2).reshape(cin, kw * cout)
        y = jnp.dot(x, w2, precision=precision, preferred_element_type=x.dtype)
        y = y.reshape(B, T * kw, cout)
        return y + p["b"]
    out = lax.conv_transpose(
        x, w, strides=(stride,), padding="VALID",
        dimension_numbers=_DN, precision=precision)
    return out + p["b"]


# ---------------------------------------------------------------------------
# misc functional pieces
# ---------------------------------------------------------------------------


# Dropout mask generation. "bits16" draws uint16 random bits and
# integer-compares against round(keep * 2^16) — a quarter of the
# generated bits and no int->float conversion. MEASURED NEGATIVE on v5e
# (tools/dropout_bits_probe.py, full b64 bf16 train step): 20.01 ms vs
# bernoulli's 19.39 — rbg emits 32-bit blocks either way, so the u16
# narrowing adds reshuffle work instead of removing generation, and the
# integer compare breaks the mask out of the f32 fusion the bernoulli
# path rides. Ships opt-in (DV3_DROPOUT_IMPL=bits16) as the recorded
# negative probe; default stays the measured-faster bernoulli.
DROPOUT_IMPL = os.environ.get("DV3_DROPOUT_IMPL", "bernoulli")


def dropout(rng, x, rate, *, training):
    """Inverted dropout matching F.dropout train-time semantics."""
    if not training or rate <= 0.0:
        return x
    keep = 1.0 - rate
    if DROPOUT_IMPL == "bits16":
        thresh = jnp.uint16(min(int(round(keep * 65536.0)), 65535))
        mask = jax.random.bits(rng, x.shape, jnp.uint16) < thresh
    else:
        mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def glu(x, axis=-1):
    """Gated linear unit: split in half, a * sigmoid(b) (torch.nn.functional.glu)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def softsign(x):
    return x / (1.0 + jnp.abs(x))


def sequence_mask(lengths, max_len):
    """(B,) lengths -> (B, max_len) float mask (reference train.py:261-271)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def get_mask_from_lengths(lengths, max_len):
    """True where PADDED (reference modules.py:232-241)."""
    pos = jnp.arange(max_len)[None, :]
    return pos >= lengths[:, None]
