# coding: utf-8
"""Sinusoidal position encodings with a runtime (optionally per-sample) rate.

TPU-first redesign of the reference SinusoidalEncoding
(deepvoice3_pytorch/modules.py:10-64): the reference stores a raw-angle table
and, for per-speaker rates, falls back to a Python loop over the batch
(modules.py:54-64). Because sin/cos commute with the embedding gather
(`sin(w * table)[pos] == sin(w * table[pos])`), we gather raw angles at the
query positions and apply the rate + sin/cos in closed form — fully batched,
no loop, identical numerics.
"""

import numpy as np
import jax.numpy as jnp


def position_encoding_init(n_position, d_pos_vec, position_rate=1.0,
                           sinusoidal=True, dtype=np.float32):
    """Raw-angle (or sinusoidal) table, row 0 = zeros (reference modules.py:10-24)."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]           # (P, 1)
    i = np.arange(d_pos_vec, dtype=np.float64)[None, :]               # (1, D)
    angles = position_rate * pos / np.power(10000.0, 2.0 * (i // 2) / d_pos_vec)
    angles[0, :] = 0.0
    # reference casts to float32 BEFORE sin/cos (modules.py:19-22); match that
    angles = angles.astype(dtype)
    if sinusoidal:
        angles[1:, 0::2] = np.sin(angles[1:, 0::2])
        angles[1:, 1::2] = np.cos(angles[1:, 1::2])
    return angles


def sinusoidal_encode_table(table, w):
    """Apply rate w then sin/cos to a full raw-angle table (modules.py:27-31).

    Row 0 (padding position) is left as w*row0 == 0.
    """
    y = w * table
    even = jnp.sin(y[1:, 0::2])
    odd = jnp.cos(y[1:, 1::2])
    d = table.shape[1]
    out = jnp.zeros_like(y[1:])
    out = out.at[:, 0::2].set(even)
    out = out.at[:, 1::2].set(odd)
    return jnp.concatenate([y[:1], out], axis=0)


def sinusoidal_encoding(positions, table, w=1.0):
    """Batched sinusoidal encoding lookup.

    Args:
        positions: (B, T) int positions (0 = padding -> zero vector).
        table: (max_positions, D) raw-angle table (position_rate=1,
            sinusoidal=False) — a constant or a trainable param.
        w: scalar or (B,) per-sample position rate.

    Returns:
        (B, T, D) encodings, numerically identical to the reference's
        per-batch table rebuild + gather.
    """
    ang = jnp.take(table, positions, axis=0)             # (B, T, D)
    w = jnp.asarray(w, dtype=ang.dtype)
    if w.ndim == 0:
        y = w * ang
    else:
        y = w[:, None, None] * ang
    d = table.shape[1]
    col = jnp.arange(d)
    is_even = (col % 2) == 0
    enc = jnp.where(is_even, jnp.sin(y), jnp.cos(y))
    # padding position (0) stays the raw scaled angle == 0, like table row 0
    pad = (positions == 0)[..., None]
    return jnp.where(pad, y, enc)
