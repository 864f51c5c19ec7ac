# coding: utf-8
"""Conv stack building blocks: Conv1dGLU, HighwayConv1d, 1x1 convs, deconvs.

A TPU-first redesign of the reference block zoo
(deepvoice3_pytorch/modules.py:112-229). Every stack is described by a static
list of `ConvSpec`s; parameters are a parallel list of pytrees. The same spec
list drives three code paths:

  * `stack_apply`   — full-sequence (teacher-forced / encoder / converter)
  * `stack_step`    — one autoregressive frame against ring buffers, used
                      inside `lax.scan` (replaces conv.py:17-46's per-module
                      Python dispatch and input_buffer mutation)
  * `stack_init_state` — builds the ring-buffer pytree

Ring-buffer semantics replicate the reference exactly (conv.py:34-44): a
causal conv with kernel kw and dilation d keeps the last (kw-1)*d + 1 input
frames; each step gathers stride-d taps and does one (B, kw*Cin) x
(kw*Cin, Cout) matmul — MXU-friendly, O(1) per step.
"""

import math
from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import core

SQRT_HALF = math.sqrt(0.5)


@dataclass(frozen=True)
class ConvSpec:
    """Static description of one layer in a conv stack."""
    kind: str                 # 'glu' | 'highway' | 'conv1x1' | 'conv' | 'convT'
    in_channels: int
    out_channels: int
    kernel_size: int = 1
    dilation: int = 1
    causal: bool = False
    residual: bool = False    # glu blocks: residual add * sqrt(0.5)
    std_mul: float = 1.0
    init_dropout: float = 0.0   # dropout used in the init std formula
    dropout: float = 0.0        # runtime input dropout (glu / highway)
    activation: Optional[str] = None  # for 'conv1x1'/'conv': 'relu'|'sigmoid'|None
    stride: int = 1           # for 'convT'
    highway_glu: bool = False  # HighwayConv1d(glu=True) variant
    speaker_proj: bool = False  # Conv1dGLU speaker softsign bias


def glu_spec(in_ch, out_ch, kw, dilation, causal, residual, std_mul, dropout,
             multispeaker=False):
    return ConvSpec("glu", in_ch, out_ch, kw, dilation, causal, residual,
                    std_mul, init_dropout=dropout, dropout=dropout,
                    speaker_proj=multispeaker)


def highway_spec(in_ch, out_ch, kw, dilation, causal, dropout, std_mul=None,
                 glu=False):
    if std_mul is None:
        std_mul = 4.0 if glu else 1.0
    return ConvSpec("highway", in_ch, out_ch, kw, dilation, causal, False,
                    std_mul, init_dropout=dropout, dropout=dropout,
                    highway_glu=glu)


def conv1x1_spec(in_ch, out_ch, std_mul, init_dropout=0.0, activation=None):
    return ConvSpec("conv1x1", in_ch, out_ch, 1, 1, False, False, std_mul,
                    init_dropout=init_dropout, activation=activation)


def convT_spec(in_ch, out_ch, kw=2, stride=2, std_mul=1.0):
    return ConvSpec("convT", in_ch, out_ch, kw, stride=stride, std_mul=std_mul)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def spec_init(rng, spec: ConvSpec, speaker_embed_dim: int = 0,
              dtype=jnp.float32):
    if spec.kind == "convT":
        return {"conv": core.conv_transpose1d_init(
            rng, spec.in_channels, spec.out_channels, spec.kernel_size,
            dropout=spec.init_dropout, std_mul=spec.std_mul, dtype=dtype)}
    rngs = jax.random.split(rng, 2)
    n_out = spec.out_channels * (2 if spec.kind in ("glu", "highway") else 1)
    params = {"conv": core.conv1d_init(
        rngs[0], spec.in_channels, n_out, spec.kernel_size,
        dropout=spec.init_dropout, std_mul=spec.std_mul, dtype=dtype)}
    if spec.speaker_proj:
        params["speaker_proj"] = core.linear_init(
            rngs[1], speaker_embed_dim, spec.out_channels, dtype=dtype)
    return params


def stack_init(rng, specs, speaker_embed_dim: int = 0, dtype=jnp.float32):
    rngs = jax.random.split(rng, max(len(specs), 1))
    return [spec_init(r, s, speaker_embed_dim, dtype)
            for r, s in zip(rngs, specs)]


# ---------------------------------------------------------------------------
# full-sequence apply
# ---------------------------------------------------------------------------


def _activate(x, name):
    if name == "relu":
        return jax.nn.relu(x)
    if name == "sigmoid":
        return jax.nn.sigmoid(x)
    return x


def spec_apply(params, spec: ConvSpec, x, *, speaker_embed_btc=None,
               training=False, rng=None):
    """Apply one layer to (B, T, C). Returns (B, T', C')."""
    if spec.kind in ("conv1x1", "conv"):
        y = core.conv1d_apply(params["conv"], x, dilation=spec.dilation,
                              causal=spec.causal)
        return _activate(y, spec.activation)
    if spec.kind == "convT":
        return core.conv_transpose1d_apply(params["conv"], x, stride=spec.stride)
    # glu / highway: input dropout then conv
    residual = x
    if training and spec.dropout > 0:
        rng, sub = jax.random.split(rng)
        x = core.dropout(sub, x, spec.dropout, training=True)
    y = core.conv1d_apply(params["conv"], x, dilation=spec.dilation,
                          causal=spec.causal)
    return _gate(params, spec, y, residual, speaker_embed_btc)


def _gate(params, spec, y, residual, speaker_embed_btc):
    """Shared gating logic between full-sequence and step paths.

    y: conv output with 2*out_channels on the last axis.
    """
    a, b = jnp.split(y, 2, axis=-1)
    if spec.kind == "glu":
        if spec.speaker_proj and speaker_embed_btc is not None:
            a = a + core.softsign(
                core.linear_apply(params["speaker_proj"], speaker_embed_btc))
        x = a * jax.nn.sigmoid(b)
        return (x + residual) * SQRT_HALF if spec.residual else x
    # highway
    if spec.highway_glu:
        x = a * jax.nn.sigmoid(b)
        return (x + residual) * SQRT_HALF
    t = jax.nn.sigmoid(b)
    return t * a + (1.0 - t) * residual


def stack_apply(params, specs, x, *, speaker_embed_btc=None, training=False,
                rng=None):
    for p, s in zip(params, specs):
        if training and rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        x = spec_apply(p, s, x, speaker_embed_btc=speaker_embed_btc,
                       training=training, rng=sub)
    return x


# ---------------------------------------------------------------------------
# incremental (ring-buffer) path
# ---------------------------------------------------------------------------


def buffer_len(spec: ConvSpec) -> int:
    return (spec.kernel_size - 1) * spec.dilation + 1


def spec_init_state(spec: ConvSpec, batch: int, dtype=jnp.float32):
    """Ring buffer for one layer (empty tuple if stateless)."""
    if spec.kind in ("glu", "highway") and spec.kernel_size > 1:
        return jnp.zeros((batch, buffer_len(spec), spec.in_channels), dtype)
    return ()


def stack_init_state(specs, batch: int, dtype=jnp.float32):
    return [spec_init_state(s, batch, dtype) for s in specs]


def _conv_step(conv_params, buf, x, spec):
    """One causal-conv step: push x into buf, matmul the dilated taps.

    x: (B, Cin) newest frame. Returns (new_buf, y (B, Cout_conv)).
    Equivalent to reference conv.py:17-46 (shift, stride-d gather, F.linear).
    """
    w = core.conv1d_weight(conv_params)        # (kw, in, out)
    kw, cin, cout = w.shape
    if kw == 1:
        return buf, jnp.dot(x, w[0], preferred_element_type=x.dtype) + conv_params["b"]
    new_buf = jnp.concatenate([buf[:, 1:, :], x[:, None, :]], axis=1)
    taps = new_buf[:, ::spec.dilation, :]      # (B, kw, in)
    y = jnp.dot(taps.reshape(x.shape[0], kw * cin), w.reshape(kw * cin, cout),
                preferred_element_type=x.dtype)
    return new_buf, y + conv_params["b"]


def spec_step(params, spec: ConvSpec, state, x, *, speaker_embed=None):
    """One frame through one layer. x: (B, C). Returns (new_state, y (B, C'))."""
    if spec.kind in ("conv1x1", "conv"):
        w = core.conv1d_weight(params["conv"])
        y = jnp.dot(x, w[0], preferred_element_type=x.dtype) + params["conv"]["b"]
        return state, _activate(y, spec.activation)
    if spec.kind == "convT":
        raise ValueError("convT has no incremental path (converter is offline)")
    residual = x
    if spec.kernel_size > 1:
        state, y = _conv_step(params["conv"], state, x, spec)
    else:
        _, y = _conv_step(params["conv"], (), x, spec)
    se = speaker_embed if spec.speaker_proj else None
    return state, _gate(params, spec, y, residual, se)


def stack_step(params, specs, states, x, *, speaker_embed=None):
    new_states = []
    for p, s, st in zip(params, specs, states):
        st, x = spec_step(p, s, st, x, speaker_embed=speaker_embed)
        new_states.append(st)
    return new_states, x
