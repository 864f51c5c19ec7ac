# coding: utf-8
"""Single-head dot-product attention with monotonic windowing.

TPU-first equivalent of the reference AttentionLayer
(deepvoice3_pytorch/deepvoice3.py:108-176): query proj -> QK^T -> padding mask
-> optional monotonic window -> softmax -> AV -> sqrt(T_k) scale -> out proj
-> residual * sqrt(0.5).

Differences by design:
  * the monotonic window is batched — `last_attended` is a (B,) vector, fixing
    the reference's single-sample `.data[0]` assumption (deepvoice3.py:445)
  * key/value projections can be precomputed once per utterance outside the
    decode loop (the reference recomputes them per step: deepvoice3.py:135-139)
"""

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from . import core

MASK_VALUE = -1.0e9  # large-negative instead of -inf: safe under softmax fusion


@dataclass(frozen=True)
class AttentionSpec:
    conv_channels: int
    embed_dim: int
    dropout: float = 0.1
    window_ahead: int = 3
    window_backward: int = 1
    key_projection: bool = True
    value_projection: bool = True


def attention_init(rng, spec: AttentionSpec, dtype=jnp.float32):
    r = jax.random.split(rng, 4)
    params = {"query_proj": core.linear_init(
        r[0], spec.conv_channels, spec.embed_dim, dtype=dtype)}
    if spec.key_projection:
        kp = core.linear_init(r[1], spec.embed_dim, spec.embed_dim, dtype=dtype)
        if spec.conv_channels == spec.embed_dim:
            # DeepVoice3 paper: init key proj == query proj
            # (deepvoice3.py:116-119). Copy, don't alias: duplicate buffers
            # in one pytree break donation in the jitted train step.
            kp = {"v": jnp.array(params["query_proj"]["v"]),
                  "g": jnp.array(params["query_proj"]["g"]),
                  "b": kp["b"]}
        params["key_proj"] = kp
    if spec.value_projection:
        params["value_proj"] = core.linear_init(
            r[2], spec.embed_dim, spec.embed_dim, dtype=dtype)
    params["out_proj"] = core.linear_init(
        r[3], spec.embed_dim, spec.conv_channels, dtype=dtype)
    return params


def project_keys_values(params, spec: AttentionSpec, keys, values):
    """Apply the (optional) key/value projections once per utterance."""
    if spec.key_projection:
        keys = core.linear_apply(params["key_proj"], keys)
    if spec.value_projection:
        values = core.linear_apply(params["value_proj"], values)
    return keys, values


def attention_apply(params, spec: AttentionSpec, query, keys, values, *,
                    mask=None, last_attended=None, training=False, rng=None,
                    projected=False):
    """Attention over (B, T_q, C) queries and (B, T_k, E) keys/values.

    Args:
        mask: (B, T_k) True where PADDED (ignored if None).
        last_attended: (B,) int32 monotonic window centers (None = no window).
        projected: keys/values already passed through project_keys_values.

    Returns:
        (out (B, T_q, C), attn (B, T_q, T_k))
    """
    if not projected:
        keys, values = project_keys_values(params, spec, keys, values)
    residual = query
    x = core.linear_apply(params["query_proj"], query)          # (B, Tq, E)
    scores = jnp.einsum("bqe,bke->bqk", x, keys,
                        preferred_element_type=jnp.float32)

    if mask is not None:
        scores = jnp.where(mask[:, None, :], MASK_VALUE, scores)

    if last_attended is not None:
        tk = keys.shape[1]
        idx = jnp.arange(tk)[None, :]                            # (1, Tk)
        la = jnp.asarray(last_attended)[:, None]                 # (B, 1)
        win_mask = (idx < la - spec.window_backward) | \
                   (idx >= la + spec.window_ahead)
        scores = jnp.where(win_mask[:, None, :], MASK_VALUE, scores)

    attn = jax.nn.softmax(scores, axis=-1)
    x = attn.astype(values.dtype)
    if training and spec.dropout > 0:
        x = core.dropout(rng, x, spec.dropout, training=True)

    x = jnp.einsum("bqk,bke->bqe", x, values,
                   preferred_element_type=values.dtype)

    # scale attention output by T_k * sqrt(1/T_k) == sqrt(T_k)
    s = values.shape[1]
    x = x * (s * math.sqrt(1.0 / s))

    x = core.linear_apply(params["out_proj"], x)
    x = (x + residual) * math.sqrt(0.5)
    return x, attn


def attention_step(params, spec: AttentionSpec, query, keys, values, *,
                   mask=None, last_attended=None):
    """Single decode-step attention. query: (B, C) -> (out (B, C), attn (B, T_k)).

    keys/values must be pre-projected (project_keys_values) — done once per
    utterance, outside lax.scan.
    """
    out, attn = attention_apply(
        params, spec, query[:, None, :], keys, values, mask=mask,
        last_attended=last_attended, training=False, projected=True)
    return out[:, 0], attn[:, 0]
