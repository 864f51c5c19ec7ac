# coding: utf-8
"""DeepVoice3 (arXiv:1710.07654) — TPU-native encoder/decoder/converter.

Functional redesign of the reference deepvoice3_pytorch/deepvoice3.py. All
configs are frozen dataclasses of static metadata (tuples of ConvSpec); params
are pytrees; every apply is a pure function that jits/shards whole.

Key departures from the reference (by design, not omission):
  * the autoregressive decoder is a `lax.scan` (models/decode.py) over a
    decode-state pytree instead of a Python while-loop with module-level
    mutable ring buffers (reference deepvoice3.py:397-473, conv.py:34-44)
  * `last_attended` is per-batch (B,) — the reference reads `.data[0]` and
    only supports B=1 at inference (deepvoice3.py:445)
  * averaged alignments are a true mean; the reference accumulates
    `ave_alignment + ave_alignment` (deepvoice3.py:449), a doubling bug
"""

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import core
from ..ops import conv_blocks as cb
from ..ops import attention as attn_ops
from ..ops.positional import position_encoding_init, sinusoidal_encoding

SQRT_HALF = math.sqrt(0.5)


def expand_speaker_embed(speaker_embed, T):
    """(B, D) -> (B, T, D) (reference deepvoice3.py:13-21)."""
    if speaker_embed is None:
        return None
    return jnp.broadcast_to(speaker_embed[:, None, :],
                            (speaker_embed.shape[0], T, speaker_embed.shape[1]))


@jax.custom_vjp
def grad_multiply(x, scale):
    return x


def _grad_multiply_fwd(x, scale):
    return x, scale


def _grad_multiply_bwd(scale, g):
    return g * scale, None


grad_multiply.defvjp(_grad_multiply_fwd, _grad_multiply_bwd)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_conv_specs(embed_dim, convolutions, dropout, multispeaker):
    """Reference Encoder stack construction (deepvoice3.py:44-67)."""
    specs = []
    in_channels = embed_dim
    std_mul = 1.0
    for (out_channels, kernel_size, dilation) in convolutions:
        if in_channels != out_channels:
            specs.append(cb.conv1x1_spec(in_channels, out_channels, std_mul,
                                         activation="relu"))
            in_channels = out_channels
            std_mul = 2.0
        specs.append(cb.glu_spec(in_channels, out_channels, kernel_size,
                                 dilation, False, True, std_mul, dropout,
                                 multispeaker=multispeaker))
        in_channels = out_channels
        std_mul = 4.0
    specs.append(cb.conv1x1_spec(in_channels, embed_dim, std_mul,
                                 init_dropout=dropout))
    return tuple(specs)


@dataclass(frozen=True)
class EncoderConfig:
    n_vocab: int
    embed_dim: int
    n_speakers: int = 1
    speaker_embed_dim: int = 16
    padding_idx: Optional[int] = 0
    embedding_weight_std: float = 0.1
    convolutions: Tuple = ((64, 5, 1),) * 7
    dropout: float = 0.1
    apply_grad_scaling: bool = False
    num_attention_layers: int = 1

    @property
    def specs(self):
        return encoder_conv_specs(self.embed_dim, self.convolutions,
                                  self.dropout, self.n_speakers > 1)


def encoder_init(rng, cfg: EncoderConfig, dtype=jnp.float32):
    r = jax.random.split(rng, 4)
    params = {
        "embed_tokens": core.embedding_init(
            r[0], cfg.n_vocab, cfg.embed_dim, cfg.padding_idx,
            cfg.embedding_weight_std, dtype),
        "layers": cb.stack_init(r[1], cfg.specs, cfg.speaker_embed_dim, dtype),
    }
    if cfg.n_speakers > 1:
        params["speaker_fc1"] = core.linear_init(
            r[2], cfg.speaker_embed_dim, cfg.embed_dim, dropout=cfg.dropout,
            dtype=dtype)
        params["speaker_fc2"] = core.linear_init(
            r[3], cfg.speaker_embed_dim, cfg.embed_dim, dropout=cfg.dropout,
            dtype=dtype)
    return params


def encoder_apply(params, cfg: EncoderConfig, text_sequences, *,
                  speaker_embed=None, training=False, rng=None):
    """(B, T) int tokens -> (keys, values) each (B, T, embed_dim).

    Mirrors reference Encoder.forward (deepvoice3.py:69-105).
    """
    x = core.embedding_apply(params["embed_tokens"], text_sequences)
    if training:
        rng, sub = jax.random.split(rng)
        x = core.dropout(sub, x, cfg.dropout, training=True)

    speaker_embed_btc = expand_speaker_embed(speaker_embed, x.shape[1])
    if speaker_embed_btc is not None:
        if training:
            rng, sub = jax.random.split(rng)
            speaker_embed_btc = core.dropout(sub, speaker_embed_btc,
                                             cfg.dropout, training=True)
        x = x + core.softsign(
            core.linear_apply(params["speaker_fc1"], speaker_embed_btc))

    input_embedding = x

    x = cb.stack_apply(params["layers"], cfg.specs, x,
                       speaker_embed_btc=speaker_embed_btc,
                       training=training, rng=rng)

    keys = x
    if speaker_embed_btc is not None:
        keys = keys + core.softsign(
            core.linear_apply(params["speaker_fc2"], speaker_embed_btc))

    if cfg.apply_grad_scaling and cfg.num_attention_layers:
        keys = grad_multiply(keys, 1.0 / (2.0 * cfg.num_attention_layers))

    values = (keys + input_embedding) * SQRT_HALF
    return keys, values


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decoder_prenet_specs(in_dim, r, preattention, dropout, multispeaker):
    """Reference Decoder prenet construction (deepvoice3.py:219-238)."""
    specs = []
    in_channels = in_dim * r
    std_mul = 1.0
    for (out_channels, kernel_size, dilation) in preattention:
        if in_channels != out_channels:
            specs.append(cb.conv1x1_spec(in_channels, out_channels, std_mul,
                                         activation="relu"))
            in_channels = out_channels
            std_mul = 2.0
        specs.append(cb.glu_spec(in_channels, out_channels, kernel_size,
                                 dilation, True, True, std_mul, dropout,
                                 multispeaker=multispeaker))
        in_channels = out_channels
        std_mul = 4.0
    return tuple(specs)


def decoder_conv_specs(convolutions, dropout, multispeaker):
    """Main causal stack; residual applied OUTSIDE (after attention)
    (deepvoice3.py:244-260)."""
    specs = []
    std_mul = 4.0
    for (out_channels, kernel_size, dilation) in convolutions:
        specs.append(cb.glu_spec(out_channels, out_channels, kernel_size,
                                 dilation, True, False, std_mul, dropout,
                                 multispeaker=multispeaker))
        std_mul = 4.0
    return tuple(specs)


@dataclass(frozen=True)
class DecoderConfig:
    embed_dim: int
    n_speakers: int = 1
    speaker_embed_dim: int = 16
    in_dim: int = 80
    r: int = 5
    max_positions: int = 512
    padding_idx: Optional[int] = 0
    preattention: Tuple = ((128, 5, 1),) * 4
    convolutions: Tuple = ((128, 5, 1),) * 4
    attention: Tuple = (True,) * 4          # per-conv-layer attention flags
    dropout: float = 0.1
    use_memory_mask: bool = False
    force_monotonic_attention: Tuple = (False,) * 4
    query_position_rate: float = 1.0
    key_position_rate: float = 1.29
    window_ahead: int = 3
    window_backward: int = 1
    key_projection: bool = True
    value_projection: bool = True
    max_decoder_steps: int = 200
    min_decoder_steps: int = 10
    trainable_positional_encodings: bool = False

    @property
    def prenet_specs(self):
        return decoder_prenet_specs(self.in_dim, self.r, self.preattention,
                                    self.dropout, self.n_speakers > 1)

    @property
    def conv_specs(self):
        return decoder_conv_specs(self.convolutions, self.dropout,
                                  self.n_speakers > 1)

    @property
    def attention_specs(self):
        conv_channels = self.convolutions[0][0]
        return tuple(
            attn_ops.AttentionSpec(conv_channels, self.embed_dim, self.dropout,
                                   self.window_ahead, self.window_backward,
                                   self.key_projection, self.value_projection)
            if use else None for use in self.attention)

    @property
    def num_attention_layers(self):
        return sum(1 for a in self.attention if a)


def decoder_init(rng, cfg: DecoderConfig, dtype=jnp.float32):
    r = jax.random.split(rng, 8)
    conv_channels = cfg.convolutions[0][0]
    params = {
        # raw-angle tables; sin/cos + rate applied at lookup (ops/positional.py)
        "embed_query_positions": {"w": jnp.asarray(position_encoding_init(
            cfg.max_positions, conv_channels, 1.0, sinusoidal=False))},
        "embed_keys_positions": {"w": jnp.asarray(position_encoding_init(
            cfg.max_positions, cfg.embed_dim, 1.0, sinusoidal=False))},
        "prenet": cb.stack_init(r[0], cfg.prenet_specs, cfg.speaker_embed_dim,
                                dtype),
        "convs": cb.stack_init(r[1], cfg.conv_specs, cfg.speaker_embed_dim,
                               dtype),
        "attention": [
            attn_ops.attention_init(rr, spec, dtype) if spec is not None else {}
            for rr, spec in zip(jax.random.split(r[2], len(cfg.attention)),
                                cfg.attention_specs)],
        "last_conv": core.conv1d_init(r[3], conv_channels, cfg.in_dim * cfg.r,
                                      1, dropout=cfg.dropout, std_mul=4.0,
                                      dtype=dtype),
        "fc": core.linear_init(r[4], cfg.in_dim * cfg.r, 1, dtype=dtype),
    }
    if cfg.n_speakers > 1:
        params["speaker_proj1"] = core.linear_init(
            r[5], cfg.speaker_embed_dim, 1, dropout=cfg.dropout, dtype=dtype)
        params["speaker_proj2"] = core.linear_init(
            r[6], cfg.speaker_embed_dim, 1, dropout=cfg.dropout, dtype=dtype)
    return params


def _position_rates(params, cfg, speaker_embed):
    """Key/query position-rate multipliers, per-batch when multi-speaker
    (reference deepvoice3.py:303-314)."""
    w_key = cfg.key_position_rate
    w_query = cfg.query_position_rate
    if speaker_embed is not None and "speaker_proj1" in params:
        w_key = w_key * jax.nn.sigmoid(
            core.linear_apply(params["speaker_proj1"], speaker_embed))[..., 0]
        w_query = w_query * jax.nn.sigmoid(
            core.linear_apply(params["speaker_proj2"], speaker_embed))[..., 0]
    return w_key, w_query


def decoder_apply(params, cfg: DecoderConfig, encoder_out, inputs, *,
                  text_positions=None, frame_positions=None,
                  speaker_embed=None, lengths=None, training=False, rng=None):
    """Teacher-forced decoder forward (reference Decoder.forward,
    deepvoice3.py:277-365).

    inputs: (B, T, in_dim) mel frames or (B, T//r, in_dim*r) grouped.
    Returns (outputs (B,T//r,in_dim*r), alignments (N,B,T//r,T_k),
             done (B,T//r,1), decoder_states (B,T//r,C)).
    """
    keys, values = encoder_out
    B = keys.shape[0]

    if inputs.shape[-1] == cfg.in_dim:
        inputs = inputs.reshape(B, inputs.shape[1] // cfg.r,
                                cfg.in_dim * cfg.r)

    speaker_embed_btc = expand_speaker_embed(speaker_embed, inputs.shape[1])
    if speaker_embed_btc is not None and training:
        rng, sub = jax.random.split(rng)
        speaker_embed_btc = core.dropout(sub, speaker_embed_btc, cfg.dropout,
                                         training=True)

    if cfg.use_memory_mask and lengths is not None:
        mask = core.get_mask_from_lengths(lengths, keys.shape[1])
    else:
        mask = None

    w_key, w_query = _position_rates(params, cfg, speaker_embed)
    if text_positions is not None:
        text_pos_embed = sinusoidal_encoding(
            text_positions, params["embed_keys_positions"]["w"], w_key)
        keys = keys + text_pos_embed
    frame_pos_embed = None
    if frame_positions is not None:
        frame_pos_embed = sinusoidal_encoding(
            frame_positions, params["embed_query_positions"]["w"], w_query)

    x = inputs
    if training:
        rng, sub = jax.random.split(rng)
        x = core.dropout(sub, x, cfg.dropout, training=True)

    # Prenet
    x = cb.stack_apply(params["prenet"], cfg.prenet_specs, x,
                       speaker_embed_btc=speaker_embed_btc,
                       training=training, rng=rng)

    # Causal convs + attention
    alignments = []
    for p_conv, spec, p_attn, attn_spec in zip(
            params["convs"], cfg.conv_specs, params["attention"],
            cfg.attention_specs):
        residual = x
        if training and rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        x = cb.spec_apply(p_conv, spec, x,
                          speaker_embed_btc=speaker_embed_btc,
                          training=training, rng=sub)
        if attn_spec is not None:
            q = x if frame_pos_embed is None else x + frame_pos_embed
            if training and rng is not None:
                rng, sub = jax.random.split(rng)
            x, alignment = attn_ops.attention_apply(
                p_attn, attn_spec, q, keys, values, mask=mask,
                training=training, rng=sub)
            alignments.append(alignment)
        x = (x + residual) * SQRT_HALF

    decoder_states = x
    x = core.conv1d_apply(params["last_conv"], x)

    outputs = jax.nn.sigmoid(x)
    done = jax.nn.sigmoid(core.linear_apply(params["fc"], x))

    return outputs, jnp.stack(alignments), done, decoder_states


# ---------------------------------------------------------------------------
# Incremental decoding (lax.scan / lax.while_loop over ring buffers)
# ---------------------------------------------------------------------------


def decoder_init_state(cfg: DecoderConfig, batch: int, dtype=jnp.float32):
    """Decode-state pytree: ring buffers + per-batch last_attended + t."""
    return {
        "prenet": cb.stack_init_state(cfg.prenet_specs, batch, dtype),
        "convs": cb.stack_init_state(cfg.conv_specs, batch, dtype),
        "last_attended": jnp.zeros((batch, len(cfg.convolutions)), jnp.int32),
        "t": jnp.int32(0),
    }


def decoder_precompute(params, cfg: DecoderConfig, encoder_out, *,
                       text_positions=None, speaker_embed=None):
    """Once-per-utterance work hoisted out of the decode loop:
    text position encodings on keys, per-attention-layer key/value projections
    (the reference redoes the projections every frame: deepvoice3.py:135-139).
    """
    keys, values = encoder_out
    w_key, w_query = _position_rates(params, cfg, speaker_embed)
    if text_positions is not None:
        keys = keys + sinusoidal_encoding(
            text_positions, params["embed_keys_positions"]["w"], w_key)
    projected = []
    for p_attn, attn_spec in zip(params["attention"], cfg.attention_specs):
        if attn_spec is None:
            projected.append(None)
        else:
            projected.append(attn_ops.project_keys_values(
                p_attn, attn_spec, keys, values))
    return projected, w_query


def make_decoder_step(params, cfg: DecoderConfig, projected_kv, w_query, *,
                      speaker_embed=None, mask=None):
    """Build step_fn(state, x_t) for models/decode.py loops."""
    n_att = cfg.num_attention_layers

    def step_fn(state, x_t):
        t = state["t"]
        B = x_t.shape[0]
        frame_pos = jnp.full((B, 1), 0, jnp.int32) + t + 1
        fpe = sinusoidal_encoding(
            frame_pos, params["embed_query_positions"]["w"], w_query)[:, 0]

        x = x_t
        prenet_states, x = cb.stack_step(
            params["prenet"], cfg.prenet_specs, state["prenet"], x,
            speaker_embed=speaker_embed)

        conv_states = []
        new_la = state["last_attended"]
        ave_align = None
        for idx, (p_conv, spec, p_attn, attn_spec) in enumerate(zip(
                params["convs"], cfg.conv_specs, params["attention"],
                cfg.attention_specs)):
            residual = x
            st, x = cb.spec_step(p_conv, spec, state["convs"][idx], x,
                                 speaker_embed=speaker_embed)
            conv_states.append(st)
            if attn_spec is not None:
                q = x + fpe
                la = (new_la[:, idx]
                      if cfg.force_monotonic_attention[idx] else None)
                keys_i, values_i = projected_kv[idx]
                x, align = attn_ops.attention_step(
                    p_attn, attn_spec, q, keys_i, values_i, mask=mask,
                    last_attended=la)
                if cfg.force_monotonic_attention[idx]:
                    new_la = new_la.at[:, idx].set(
                        jnp.argmax(align, axis=-1).astype(jnp.int32))
                ave_align = align if ave_align is None else ave_align + align
            x = (x + residual) * SQRT_HALF

        decoder_state = x
        w_last = core.conv1d_weight(params["last_conv"])[0]
        y = jnp.dot(x, w_last, preferred_element_type=x.dtype) \
            + params["last_conv"]["b"]
        output = jax.nn.sigmoid(y)
        done = jax.nn.sigmoid(core.linear_apply(params["fc"], y))[:, 0]
        ave_align = ave_align / n_att

        new_state = {"prenet": prenet_states, "convs": conv_states,
                     "last_attended": new_la, "t": t + 1}
        return new_state, (output, ave_align, done, decoder_state)

    return step_fn


def fused_decode_inputs(params, cfg: DecoderConfig, encoder_out,
                        text_positions, max_steps, *, speaker_embed=None):
    """Launch-ready inputs for the fused Pallas decode (and the streaming
    path, which drives the same kernel chunk-by-chunk from the host):
    projected attention K/V, the raw query-position angle table for steps
    1..max_steps, per-sample query position rates, and the per-layer
    multi-speaker GLU softsign biases."""
    B = encoder_out[0].shape[0]
    projected_kv, w_query = decoder_precompute(
        params, cfg, encoder_out, text_positions=text_positions,
        speaker_embed=speaker_embed)
    steps = jnp.arange(1, max_steps + 1, dtype=jnp.int32)
    raw_angles = jnp.take(params["embed_query_positions"]["w"], steps,
                          axis=0)                          # (T, C) raw
    wq = jnp.asarray(w_query, jnp.float32)
    if wq.ndim == 0:
        wq = jnp.full((B,), wq)
    speaker_bias = None
    if speaker_embed is not None:
        speaker_bias = []
        for plist, specs in ((params["prenet"], cfg.prenet_specs),
                             (params["convs"], cfg.conv_specs)):
            for p, s in zip(plist, specs):
                if s.kind == "glu" and s.speaker_proj:
                    speaker_bias.append(core.softsign(core.linear_apply(
                        p["speaker_proj"], speaker_embed)))
    return dict(projected_kv=projected_kv, fpe_table=raw_angles,
                fpe_raw=True, w_query=wq, speaker_bias=speaker_bias)


def decoder_decode(params, cfg: DecoderConfig, encoder_out, text_positions, *,
                   speaker_embed=None, lengths=None, initial_input=None,
                   test_inputs=None, max_decoder_steps=None,
                   early_exit=False, fused=False):
    """Greedy autoregressive decoding (reference Decoder.incremental_forward,
    deepvoice3.py:367-485), compiled as one scan/while program — or, with
    fused=True, as ONE Pallas kernel holding weights/KV/ring-buffers in VMEM
    for the whole decode (ops/fused_decode.py).

    Unlike the reference, the memory (padding) mask is applied when `lengths`
    is given, making batched synthesis over ragged texts correct.
    """
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
                                 max_steps, speaker_embed=speaker_embed)
        if early_exit:
            # chunked launches + done latch between chunks: real-checkpoint
            # synthesis stops after ~1-2 chunks instead of max_steps frames
            outputs, aligns, done, dstates, num_steps = \
                fd.fused_decode_chunked(
                    params, cfg, fi["projected_kv"], fi["fpe_table"], mask,
                    initial_input, max_steps, cfg.min_decoder_steps,
                    w_query=fi["w_query"], speaker_bias=fi["speaker_bias"],
                    fpe_raw=True)
        else:
            outputs, aligns, done, dstates = fd.fused_decode(
                params, cfg, fi["projected_kv"], fi["fpe_table"], mask,
                initial_input, max_steps, w_query=fi["w_query"],
                speaker_bias=fi["speaker_bias"], fpe_raw=True)
            num_steps = jnp.int32(max_steps)
        lengths_out = decode_lib._length_from_done(
            done, cfg.min_decoder_steps, num_steps)
        return decode_lib.DecodeLoopOut(outputs, aligns, done, dstates,
                                        lengths_out, num_steps)

    projected_kv, w_query = decoder_precompute(
        params, cfg, encoder_out, text_positions=text_positions,
        speaker_embed=speaker_embed)
    step_fn = make_decoder_step(params, cfg, projected_kv, w_query,
                                speaker_embed=speaker_embed, mask=mask)
    state = decoder_init_state(cfg, B, keys.dtype)

    if early_exit and test_inputs is None:
        return decode_lib.decode_while(
            step_fn, state, initial_input, max_steps, cfg.min_decoder_steps,
            out_dim=cfg.in_dim * cfg.r, align_len=Tk,
            state_dim=cfg.convolutions[0][0], batch=B, dtype=keys.dtype)
    return decode_lib.decode_scan(
        step_fn, state, initial_input, max_steps, cfg.min_decoder_steps,
        test_inputs=test_inputs)


# ---------------------------------------------------------------------------
# Converter (postnet)
# ---------------------------------------------------------------------------


def converter_specs(in_dim, out_dim, convolutions, time_upsampling, dropout,
                    multispeaker):
    """Reference Converter stack (deepvoice3.py:501-580)."""
    ch = convolutions[0][0]
    ms = multispeaker

    def up_block(dilated):
        return [
            cb.convT_spec(ch, ch, 2, 2,
                          std_mul=1.0 if not dilated else 4.0),
            cb.glu_spec(ch, ch, 3, 1, False, True, 1.0, dropout, ms),
            cb.glu_spec(ch, ch, 3, 3, False, True, 4.0, dropout, ms),
        ]

    specs = [cb.conv1x1_spec(in_dim, ch, 1.0)]
    if time_upsampling == 4:
        specs += [cb.convT_spec(ch, ch, 2, 2, std_mul=1.0),
                  cb.glu_spec(ch, ch, 3, 1, False, True, 1.0, dropout, ms),
                  cb.glu_spec(ch, ch, 3, 3, False, True, 4.0, dropout, ms),
                  cb.convT_spec(ch, ch, 2, 2, std_mul=4.0),
                  cb.glu_spec(ch, ch, 3, 1, False, True, 1.0, dropout, ms),
                  cb.glu_spec(ch, ch, 3, 3, False, True, 4.0, dropout, ms)]
    elif time_upsampling == 2:
        specs += [cb.convT_spec(ch, ch, 2, 2, std_mul=1.0),
                  cb.glu_spec(ch, ch, 3, 1, False, True, 1.0, dropout, ms),
                  cb.glu_spec(ch, ch, 3, 3, False, True, 4.0, dropout, ms)]
    elif time_upsampling == 1:
        specs += [cb.glu_spec(ch, ch, 3, 3, False, True, 4.0, dropout, ms)]
    else:
        raise ValueError("Not supported time_upsampling: %d" % time_upsampling)

    in_channels = ch
    std_mul = 4.0
    for (out_channels, kernel_size, dilation) in convolutions:
        if in_channels != out_channels:
            specs.append(cb.conv1x1_spec(in_channels, out_channels, std_mul,
                                         activation="relu"))
            in_channels = out_channels
            std_mul = 2.0
        specs.append(cb.glu_spec(in_channels, out_channels, kernel_size,
                                 dilation, False, True, std_mul, dropout, ms))
        in_channels = out_channels
        std_mul = 4.0
    specs.append(cb.conv1x1_spec(in_channels, out_dim, std_mul,
                                 init_dropout=dropout))
    return tuple(specs)


@dataclass(frozen=True)
class ConverterConfig:
    in_dim: int
    out_dim: int
    n_speakers: int = 1
    speaker_embed_dim: int = 16
    convolutions: Tuple = ((256, 5, 1),) * 4
    time_upsampling: int = 1
    dropout: float = 0.1

    @property
    def specs(self):
        return converter_specs(self.in_dim, self.out_dim, self.convolutions,
                               self.time_upsampling, self.dropout,
                               self.n_speakers > 1)


def converter_init(rng, cfg: ConverterConfig, dtype=jnp.float32):
    return {"layers": cb.stack_init(rng, cfg.specs, cfg.speaker_embed_dim,
                                    dtype)}


def converter_apply(params, cfg: ConverterConfig, x, *, speaker_embed=None,
                    training=False, rng=None):
    """(B, T, in_dim) -> (B, T * upsampling, out_dim), sigmoid output.

    Re-expands (and re-drops, at train time) the speaker embedding whenever an
    upsampling layer changes T (reference deepvoice3.py:593-599).
    """
    se_btc = None

    def get_se(T):
        nonlocal rng
        if speaker_embed is None:
            return None
        se = expand_speaker_embed(speaker_embed, T)
        if training:
            nonlocal_rng, sub = jax.random.split(rng)
            rng = nonlocal_rng
            se = core.dropout(sub, se, cfg.dropout, training=True)
        return se

    for p, s in zip(params["layers"], cfg.specs):
        if s.speaker_proj:
            if se_btc is None or se_btc.shape[1] != x.shape[1]:
                se_btc = get_se(x.shape[1])
        if training and rng is not None:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        x = cb.spec_apply(p, s, x, speaker_embed_btc=se_btc,
                          training=training, rng=sub)
    return jax.nn.sigmoid(x)
