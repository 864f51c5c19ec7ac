# coding: utf-8
"""Nyanko / DCTTS-style model (arXiv:1710.08969) — TPU-native.

Functional redesign of reference deepvoice3_pytorch/nyanko.py: highway-conv
encoder splitting into keys/values, audio-encoder -> single attention ->
audio-decoder, highway converter with two 2x deconv upsamples. Single-speaker
only (enforced in builder, reference builder.py:120-121).
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import core
from ..ops import conv_blocks as cb
from ..ops import attention as attn_ops
from ..ops.positional import position_encoding_init

SQRT_HALF = math.sqrt(0.5)


# ---------------------------------------------------------------------------
# Encoder (reference nyanko.py:15-71)
# ---------------------------------------------------------------------------


def encoder_specs(embed_dim, channels, kernel_size, dropout):
    E, D, k = embed_dim, channels, kernel_size
    hw = lambda dil, kw=None: cb.highway_spec(2 * D, 2 * D, kw or k, dil,
                                              False, dropout, std_mul=1.0)
    return (
        cb.conv1x1_spec(E, 2 * D, 1.0, activation="relu"),
        cb.conv1x1_spec(2 * D, 2 * D, 2.0),
        hw(1), hw(3), hw(9), hw(27),
        hw(1), hw(3), hw(9), hw(27),
        hw(1), hw(1),
        hw(1, kw=1),
    )


@dataclass(frozen=True)
class NyankoEncoderConfig:
    n_vocab: int
    embed_dim: int
    channels: int
    kernel_size: int = 3
    padding_idx: Optional[int] = 0
    embedding_weight_std: float = 0.01
    dropout: float = 0.1

    @property
    def specs(self):
        return encoder_specs(self.embed_dim, self.channels, self.kernel_size,
                             self.dropout)


def encoder_init(rng, cfg: NyankoEncoderConfig, dtype=jnp.float32):
    r = jax.random.split(rng, 2)
    return {
        "embed_tokens": core.embedding_init(
            r[0], cfg.n_vocab, cfg.embed_dim, cfg.padding_idx,
            cfg.embedding_weight_std, dtype),
        "layers": cb.stack_init(r[1], cfg.specs, 0, dtype),
    }


def encoder_apply(params, cfg: NyankoEncoderConfig, text_sequences, *,
                  speaker_embed=None, training=False, rng=None):
    x = core.embedding_apply(params["embed_tokens"], text_sequences)
    x = cb.stack_apply(params["layers"], cfg.specs, x, training=training,
                       rng=rng)
    keys, values = jnp.split(x, 2, axis=-1)
    return keys, values


# ---------------------------------------------------------------------------
# Decoder (reference nyanko.py:74-343)
# ---------------------------------------------------------------------------


def audio_encoder_specs(in_dim, r, channels, kernel_size, dropout):
    D, k, F = channels, kernel_size, in_dim * r
    hwc = lambda dil: cb.highway_spec(D, D, k, dil, True, dropout,
                                      std_mul=1.0)
    return (
        cb.conv1x1_spec(F, D, 1.0, activation="relu"),
        cb.conv1x1_spec(D, D, 2.0, activation="relu"),
        cb.conv1x1_spec(D, D, 2.0),
        hwc(1), hwc(3), hwc(9), hwc(27),
        hwc(1), hwc(3), hwc(9), hwc(27),
        hwc(3), hwc(3),
    )


def audio_decoder_specs(channels, kernel_size, dropout):
    D, k = channels, kernel_size
    hwc = lambda dil: cb.highway_spec(D, D, k, dil, True, dropout,
                                      std_mul=1.0)
    return (
        cb.conv1x1_spec(2 * D, D, 1.0),
        hwc(1), hwc(3), hwc(9), hwc(27),
        hwc(1), hwc(1),
        cb.conv1x1_spec(D, D, 1.0, activation="relu"),
        cb.conv1x1_spec(D, D, 2.0, activation="relu"),
        cb.conv1x1_spec(D, D, 2.0, activation="relu"),
    )


@dataclass(frozen=True)
class NyankoDecoderConfig:
    embed_dim: int
    in_dim: int = 80
    r: int = 1
    channels: int = 256
    kernel_size: int = 3
    max_positions: int = 512
    padding_idx: Optional[int] = 0
    dropout: float = 0.1
    use_memory_mask: bool = False
    force_monotonic_attention: bool = False
    query_position_rate: float = 1.0
    key_position_rate: float = 1.29
    window_ahead: int = 3
    window_backward: int = 1
    key_projection: bool = False
    value_projection: bool = False
    max_decoder_steps: int = 200
    min_decoder_steps: int = 10
    trainable_positional_encodings: bool = False

    @property
    def audio_encoder(self):
        return audio_encoder_specs(self.in_dim, self.r, self.channels,
                                   self.kernel_size, self.dropout)

    @property
    def audio_decoder(self):
        return audio_decoder_specs(self.channels, self.kernel_size,
                                   self.dropout)

    @property
    def attention_spec(self):
        return attn_ops.AttentionSpec(
            self.channels, self.channels, self.dropout, self.window_ahead,
            self.window_backward, self.key_projection, self.value_projection)

    @property
    def num_attention_layers(self):
        return 1


def decoder_init(rng, cfg: NyankoDecoderConfig, dtype=jnp.float32):
    r = jax.random.split(rng, 5)
    D, F = cfg.channels, cfg.in_dim * cfg.r
    return {
        # fixed sinusoidal tables, rate baked in (reference nyanko.py:162-169)
        "embed_query_positions": {"w": jnp.asarray(position_encoding_init(
            cfg.max_positions, D, cfg.query_position_rate, sinusoidal=True))},
        "embed_keys_positions": {"w": jnp.asarray(position_encoding_init(
            cfg.max_positions, D, cfg.key_position_rate, sinusoidal=True))},
        "audio_encoder": cb.stack_init(r[0], cfg.audio_encoder, 0, dtype),
        "attention": attn_ops.attention_init(r[1], cfg.attention_spec, dtype),
        "audio_decoder": cb.stack_init(r[2], cfg.audio_decoder, 0, dtype),
        "last_conv": core.conv1d_init(r[3], D, F, 1, std_mul=2.0, dtype=dtype),
        "fc": core.linear_init(r[4], F, 1, dtype=dtype),
    }


def decoder_apply(params, cfg: NyankoDecoderConfig, encoder_out, inputs, *,
                  text_positions=None, frame_positions=None,
                  speaker_embed=None, lengths=None, training=False, rng=None):
    """Teacher-forced forward (reference nyanko.py:177-248)."""
    keys, values = encoder_out
    B = keys.shape[0]

    if inputs.shape[-1] == cfg.in_dim:
        inputs = inputs.reshape(B, inputs.shape[1] // cfg.r,
                                cfg.in_dim * cfg.r)

    mask = (core.get_mask_from_lengths(lengths, keys.shape[1])
            if cfg.use_memory_mask and lengths is not None else None)

    if text_positions is not None:
        keys = keys + core.embedding_apply(
            params["embed_keys_positions"], text_positions)
    frame_pos_embed = None
    if frame_positions is not None:
        frame_pos_embed = core.embedding_apply(
            params["embed_query_positions"], frame_positions)

    x = inputs
    if training and rng is not None:
        rng, sub = jax.random.split(rng)
    else:
        sub = None
    x = cb.stack_apply(params["audio_encoder"], cfg.audio_encoder, x,
                       training=training, rng=sub)
    Q = x

    q = x if frame_pos_embed is None else x + frame_pos_embed
    if training and rng is not None:
        rng, sub = jax.random.split(rng)
    R, alignments = attn_ops.attention_apply(
        params["attention"], cfg.attention_spec, q, keys, values, mask=mask,
        training=training, rng=sub)

    x = jnp.concatenate([R, Q], axis=-1)
    if training and rng is not None:
        rng, sub = jax.random.split(rng)
    else:
        sub = None
    x = cb.stack_apply(params["audio_decoder"], cfg.audio_decoder, x,
                       training=training, rng=sub)
    decoder_states = x
    x = core.conv1d_apply(params["last_conv"], x)

    outputs = jax.nn.sigmoid(x)
    done = jax.nn.sigmoid(core.linear_apply(params["fc"], x))

    return outputs, alignments[None], done, decoder_states


def decoder_init_state(cfg: NyankoDecoderConfig, batch: int,
                       dtype=jnp.float32):
    return {
        "audio_encoder": cb.stack_init_state(cfg.audio_encoder, batch, dtype),
        "audio_decoder": cb.stack_init_state(cfg.audio_decoder, batch, dtype),
        "last_attended": jnp.zeros((batch, 1), jnp.int32),
        "t": jnp.int32(0),
    }


def decoder_precompute(params, cfg: NyankoDecoderConfig, encoder_out, *,
                       text_positions=None, speaker_embed=None):
    keys, values = encoder_out
    if text_positions is not None:
        keys = keys + core.embedding_apply(
            params["embed_keys_positions"], text_positions)
    projected = attn_ops.project_keys_values(
        params["attention"], cfg.attention_spec, keys, values)
    return projected, None


def make_decoder_step(params, cfg: NyankoDecoderConfig, projected_kv,
                      w_query=None, *, speaker_embed=None, mask=None):
    keys, values = projected_kv

    def step_fn(state, x_t):
        t = state["t"]
        B = x_t.shape[0]
        fpe = jnp.take(params["embed_query_positions"]["w"],
                       jnp.full((B,), 0, jnp.int32) + t + 1, axis=0)

        ae_states, x = cb.stack_step(
            params["audio_encoder"], cfg.audio_encoder,
            state["audio_encoder"], x_t)
        Q = x

        la = state["last_attended"][:, 0] \
            if cfg.force_monotonic_attention else None
        R, align = attn_ops.attention_step(
            params["attention"], cfg.attention_spec, x + fpe, keys, values,
            mask=mask, last_attended=la)
        new_la = state["last_attended"]
        if cfg.force_monotonic_attention:
            new_la = jnp.argmax(align, axis=-1).astype(jnp.int32)[:, None]

        x = jnp.concatenate([R, Q], axis=-1)
        ad_states, x = cb.stack_step(
            params["audio_decoder"], cfg.audio_decoder,
            state["audio_decoder"], x)
        decoder_state = x
        w_last = core.conv1d_weight(params["last_conv"])[0]
        y = jnp.dot(x, w_last, preferred_element_type=x.dtype) \
            + params["last_conv"]["b"]
        output = jax.nn.sigmoid(y)
        done = jax.nn.sigmoid(core.linear_apply(params["fc"], y))[:, 0]

        new_state = {"audio_encoder": ae_states, "audio_decoder": ad_states,
                     "last_attended": new_la, "t": t + 1}
        return new_state, (output, align, done, decoder_state)

    return step_fn


def fused_decode_inputs(params, cfg: NyankoDecoderConfig, encoder_out,
                        text_positions, max_steps, *, speaker_embed=None):
    """Launch-ready inputs for the fused Pallas decode / streaming path.

    Table rows are already sinusoidal with the rate baked in; the step-t
    query encoding is row t+1. jnp.take clamps out-of-range steps to the
    last table row (max_decoder_steps can exceed max_positions), matching
    the scan path's jnp.take semantics."""
    projected_kv, _ = decoder_precompute(params, cfg, encoder_out,
                                         text_positions=text_positions)
    steps = jnp.arange(1, max_steps + 1, dtype=jnp.int32)
    fpe_table = jnp.take(params["embed_query_positions"]["w"], steps,
                         axis=0)
    return dict(projected_kv=[projected_kv], fpe_table=fpe_table,
                fpe_raw=False, w_query=None, speaker_bias=None)


def decoder_decode(params, cfg: NyankoDecoderConfig, encoder_out,
                   text_positions, *, speaker_embed=None, lengths=None,
                   initial_input=None, test_inputs=None,
                   max_decoder_steps=None, early_exit=False, fused=False):
    from . import decode as decode_lib

    keys, _ = encoder_out
    B, Tk = keys.shape[0], keys.shape[1]
    max_steps = max_decoder_steps or cfg.max_decoder_steps

    mask = (core.get_mask_from_lengths(lengths, Tk)
            if lengths is not None else None)
    if initial_input is None:
        initial_input = jnp.zeros((B, cfg.in_dim * cfg.r), keys.dtype)

    if fused and test_inputs is None:
        from ..ops import fused_decode as fd

        if fd.vmem_bytes_estimate(params, cfg, B, Tk) > fd.VMEM_BUDGET_BYTES:
            fused = False   # too big for VMEM residency; use the scan path

    if fused and test_inputs is None:
        from ..ops import fused_decode as fd

        fi = fused_decode_inputs(params, cfg, encoder_out, text_positions,
                                 max_steps)
        if early_exit:
            outputs, aligns, done, dstates, num_steps = \
                fd.fused_decode_chunked(
                    params, cfg, fi["projected_kv"], fi["fpe_table"], mask,
                    initial_input, max_steps, cfg.min_decoder_steps)
        else:
            outputs, aligns, done, dstates = fd.fused_decode(
                params, cfg, fi["projected_kv"], fi["fpe_table"], mask,
                initial_input, max_steps)
            num_steps = jnp.int32(max_steps)
        lengths_out = decode_lib._length_from_done(
            done, cfg.min_decoder_steps, num_steps)
        return decode_lib.DecodeLoopOut(outputs, aligns, done, dstates,
                                        lengths_out, num_steps)

    projected_kv, _ = decoder_precompute(params, cfg, encoder_out,
                                         text_positions=text_positions)
    step_fn = make_decoder_step(params, cfg, projected_kv, mask=mask)
    state = decoder_init_state(cfg, B, keys.dtype)

    if early_exit and test_inputs is None:
        return decode_lib.decode_while(
            step_fn, state, initial_input, max_steps, cfg.min_decoder_steps,
            out_dim=cfg.in_dim * cfg.r, align_len=Tk, state_dim=cfg.channels,
            batch=B, dtype=keys.dtype)
    return decode_lib.decode_scan(
        step_fn, state, initial_input, max_steps, cfg.min_decoder_steps,
        test_inputs=test_inputs)


# ---------------------------------------------------------------------------
# Converter (reference nyanko.py:354-402)
# ---------------------------------------------------------------------------


def converter_specs(in_dim, out_dim, channels, kernel_size, dropout):
    C, k, F, Fd = channels, kernel_size, in_dim, out_dim
    hw = lambda ch, dil: cb.highway_spec(ch, ch, k, dil, False, dropout,
                                         std_mul=1.0)
    return (
        cb.conv1x1_spec(F, C, 1.0),
        hw(C, 1), hw(C, 3),
        cb.convT_spec(C, C, 2, 2, std_mul=1.0),
        hw(C, 1), hw(C, 3),
        cb.convT_spec(C, C, 2, 2, std_mul=1.0),
        hw(C, 1), hw(C, 3),
        cb.conv1x1_spec(C, 2 * C, 1.0),
        hw(2 * C, 1), hw(2 * C, 1),
        cb.conv1x1_spec(2 * C, Fd, 1.0),
        cb.conv1x1_spec(Fd, Fd, 1.0, activation="relu"),
        cb.conv1x1_spec(Fd, Fd, 2.0, activation="relu"),
        cb.conv1x1_spec(Fd, Fd, 2.0, activation="sigmoid"),
    )


@dataclass(frozen=True)
class NyankoConverterConfig:
    in_dim: int
    out_dim: int
    channels: int = 512
    kernel_size: int = 3
    dropout: float = 0.1
    time_upsampling: int = 4  # fixed: two 2x deconvs

    @property
    def specs(self):
        return converter_specs(self.in_dim, self.out_dim, self.channels,
                               self.kernel_size, self.dropout)


def converter_init(rng, cfg: NyankoConverterConfig, dtype=jnp.float32):
    return {"layers": cb.stack_init(rng, cfg.specs, 0, dtype)}


def converter_apply(params, cfg: NyankoConverterConfig, x, *,
                    speaker_embed=None, training=False, rng=None):
    return cb.stack_apply(params["layers"], cfg.specs, x, training=training,
                          rng=rng)
