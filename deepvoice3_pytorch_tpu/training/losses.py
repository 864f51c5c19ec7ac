# coding: utf-8
"""Training losses (reference train.py:261-601), all in-graph.

The guided-attention penalty — numba-JIT'd per-batch host loops in the
reference (train.py:585-601) — is a closed-form broadcast here, computed on
device inside the jitted train step; nothing crosses the host boundary.
"""

import jax
import jax.numpy as jnp

from ..ops.core import sequence_mask


def logit(x, eps=1e-8):
    """log((x+eps)/(1-x+eps)) (reference train.py:537-538), guarded against
    XLA reassociating `1 - x + eps` into `(1+eps) - x` == 0 in f32 when x
    saturates to exactly 1.0 (log(0) -> -inf -> 0*inf NaNs the loss)."""
    return jnp.log(jnp.maximum(x + eps, eps)) - \
        jnp.log(jnp.maximum(1.0 - x + eps, eps))


def masked_l1_loss(y_hat, y, mask):
    """sum(|y_hat - y| * mask) / sum(mask broadcast over channels)
    (reference MaskedL1Loss, train.py:274-290). mask: (B, T, 1)."""
    mask_ = jnp.broadcast_to(mask, y_hat.shape)
    return jnp.sum(jnp.abs(y_hat - y) * mask_) / jnp.sum(mask_)


def l1_loss(y_hat, y):
    return jnp.mean(jnp.abs(y_hat - y))


def masked_mean(y, mask):
    mask_ = jnp.broadcast_to(mask, y.shape)
    return jnp.sum(y * mask_) / jnp.sum(mask_)


def binary_divergence(y_hat, y, mask, masked_loss_weight):
    """Logit-domain BCE between [0,1] spectrograms
    (reference spec_loss, train.py:570-579)."""
    y_hat_logits = logit(y_hat)
    z = -y * y_hat_logits + jax.nn.softplus(y_hat_logits)
    w = masked_loss_weight
    if w > 0:
        return w * masked_mean(z, mask) + (1 - w) * jnp.mean(z)
    return jnp.mean(z)


def spec_loss(y_hat, y, mask, *, masked_loss_weight=0.5,
              binary_divergence_weight=0.1, priority_bin=None,
              priority_w=0.0):
    """(l1_loss, binary_div) blend (reference train.py:546-582)."""
    w = masked_loss_weight
    if w > 0:
        l1 = w * masked_l1_loss(y_hat, y, mask) + (1 - w) * l1_loss(y_hat, y)
    else:
        l1 = l1_loss(y_hat, y)

    if priority_bin is not None and priority_w > 0:
        if w > 0:
            priority = w * masked_l1_loss(
                y_hat[..., :priority_bin], y[..., :priority_bin], mask) \
                + (1 - w) * l1_loss(y_hat[..., :priority_bin],
                                    y[..., :priority_bin])
        else:
            priority = l1_loss(y_hat[..., :priority_bin],
                               y[..., :priority_bin])
        l1 = (1 - priority_w) * l1 + priority_w * priority

    if binary_divergence_weight <= 0:
        binary_div = jnp.zeros(())
    else:
        binary_div = binary_divergence(y_hat, y, mask, w)
    return l1, binary_div


def bce_loss(y_hat, y):
    """nn.BCELoss on probabilities (reference train.py:614,714).

    Torch's BCELoss clamps each log term at -100 rather than clipping the
    probabilities — in f32 a clip to 1 - 1e-12 rounds straight back to 1.0
    (ulp near 1 is ~6e-8), so log(1 - y_hat) still hits -inf and
    0 * -inf NaNs the loss the moment the done sigmoid saturates (which a
    converging model reliably does: observed at step ~309 of LJSpeech-preset
    training). The clamp needs the double-where pattern: a plain
    maximum(log(x), -100) fixes the value but its VJP still multiplies the
    selector by log's infinite cotangent at x=0 (0 * inf = NaN), so the
    saturated lanes must be routed around log entirely. Saturated lanes get
    the exact torch value (-100) and zero gradient (torch's clipped-huge
    gradient is clip_thresh-bound anyway).

    Known dead zone vs torch (round-2 advisor finding): torch's clamp only
    bites below e^-100 (~3.7e-44), so probabilities in (e^-100, 1.2e-38)
    — f32 subnormals — get -100 here instead of their true log (up to ~13
    nats / element) with zero gradient. The threshold deliberately stays
    at the smallest NORMAL f32: XLA flushes subnormals to zero on TPU and
    CPU (an e^-100 threshold itself FTZs to 0.0 and reintroduces the
    log(0) NaN — measured), so on this stack subnormal probabilities
    cannot reach the loss and the gap is unobservable."""
    tiny = jnp.float32(1.1754944e-38)       # smallest f32 normal
    lo_sat = y_hat < tiny                   # is finite, so no inf cotangent
    hi_sat = 1.0 - y_hat < tiny
    log_p = jnp.where(lo_sat, -100.0,
                      jnp.log(jnp.where(lo_sat, 0.5, y_hat)))
    log_1mp = jnp.where(hi_sat, -100.0,
                        jnp.log1p(-jnp.where(hi_sat, 0.5, y_hat)))
    return -jnp.mean(y * log_p + (1 - y) * log_1mp)


def guided_attention_matrix(input_lengths, decoder_lengths, max_input_len,
                            max_decoder_len, g=0.2):
    """Soft diagonal penalty W[b, t_dec, n_text] = 1 - exp(-((n/N - t/T)^2) /
    (2 g^2)), zero outside the valid lengths — closed-form equivalent of the
    reference's numba kernel (train.py:585-601), batched on device."""
    N = input_lengths.astype(jnp.float32)[:, None, None]
    T = decoder_lengths.astype(jnp.float32)[:, None, None]
    n = jnp.arange(max_input_len, dtype=jnp.float32)[None, None, :]
    t = jnp.arange(max_decoder_len, dtype=jnp.float32)[None, :, None]
    w = 1.0 - jnp.exp(-((n / N - t / T) ** 2) / (2.0 * g * g))
    valid = (n < N) & (t < T)
    return jnp.where(valid, w, 0.0)  # (B, T_dec, N_text)


def guided_attention_loss(attn, input_lengths, decoder_lengths, g=0.2):
    """attn: (n_layers, B, T_dec, T_text) alignments. Mean of attn * W
    (reference train.py:734-740: torch mean over the full tensor)."""
    W = guided_attention_matrix(input_lengths, decoder_lengths,
                                attn.shape[-1], attn.shape[-2], g)
    return jnp.mean(attn * W[None])
