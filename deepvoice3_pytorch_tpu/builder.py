# coding: utf-8
"""Model builders: deepvoice3 / nyanko / deepvoice3_multispeaker.

Mirrors the reference preset architectures (deepvoice3_pytorch/builder.py:
deepvoice3 at 7-93, nyanko at 96-169, deepvoice3_multispeaker at 172-258),
producing a frozen `TTSModelConfig` (static) instead of an nn.Module; params
come from `model_init`.
"""

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .models import deepvoice3 as dv3
from .models import nyanko as nk
from .ops import core


@dataclass(frozen=True)
class TTSModelConfig:
    builder: str
    encoder: object
    decoder: object
    converter: object
    mel_dim: int = 80
    linear_dim: int = 513
    n_speakers: int = 1
    speaker_embed_dim: int = 16
    downsample_step: int = 1
    use_decoder_state_for_postnet_input: bool = False
    speaker_embedding_weight_std: float = 0.01
    freeze_embedding: bool = False
    trainable_positional_encodings: bool = False

    @property
    def family(self):
        """Module implementing this architecture's apply functions."""
        return nk if self.builder == "nyanko" else dv3

    @property
    def r(self):
        return self.decoder.r


def _monotonic_tuple(force_monotonic_attention, n_layers):
    if isinstance(force_monotonic_attention, bool):
        return (force_monotonic_attention,) * n_layers
    return tuple(force_monotonic_attention)


def deepvoice3(n_vocab, embed_dim=256, mel_dim=80, linear_dim=513, r=4,
               downsample_step=1,
               n_speakers=1, speaker_embed_dim=16, padding_idx=0,
               dropout=(1 - 0.95), kernel_size=5,
               encoder_channels=128,
               decoder_channels=256,
               converter_channels=256,
               query_position_rate=1.0,
               key_position_rate=1.29,
               use_memory_mask=False,
               trainable_positional_encodings=False,
               force_monotonic_attention=True,
               use_decoder_state_for_postnet_input=True,
               max_positions=512,
               embedding_weight_std=0.1,
               speaker_embedding_weight_std=0.01,
               freeze_embedding=False,
               window_ahead=3,
               window_backward=1,
               key_projection=False,
               value_projection=False,
               ):
    """DeepVoice3: 10-layer dilated encoder, 5-layer decoder with attention
    at layers [T,F,F,F,T] (reference builder.py:7-93)."""
    time_upsampling = max(downsample_step // r, 1)
    h, k = encoder_channels, kernel_size
    encoder = dv3.EncoderConfig(
        n_vocab=n_vocab, embed_dim=embed_dim, n_speakers=n_speakers,
        speaker_embed_dim=speaker_embed_dim, padding_idx=padding_idx,
        embedding_weight_std=embedding_weight_std,
        convolutions=((h, k, 1), (h, k, 3), (h, k, 9), (h, k, 27),
                      (h, k, 1), (h, k, 3), (h, k, 9), (h, k, 27),
                      (h, k, 1), (h, k, 3)),
        dropout=dropout, num_attention_layers=2)

    h = decoder_channels
    attention = (True, False, False, False, True)
    decoder = dv3.DecoderConfig(
        embed_dim=embed_dim, n_speakers=n_speakers,
        speaker_embed_dim=speaker_embed_dim, in_dim=mel_dim, r=r,
        max_positions=max_positions, padding_idx=padding_idx,
        preattention=((h, k, 1), (h, k, 3)),
        convolutions=((h, k, 1), (h, k, 3), (h, k, 9), (h, k, 27), (h, k, 1)),
        attention=attention, dropout=dropout,
        use_memory_mask=use_memory_mask,
        force_monotonic_attention=_monotonic_tuple(force_monotonic_attention,
                                                   5),
        query_position_rate=query_position_rate,
        key_position_rate=key_position_rate,
        window_ahead=window_ahead, window_backward=window_backward,
        key_projection=key_projection, value_projection=value_projection,
        trainable_positional_encodings=trainable_positional_encodings)

    in_dim = h // r if use_decoder_state_for_postnet_input else mel_dim
    h = converter_channels
    converter = dv3.ConverterConfig(
        in_dim=in_dim, out_dim=linear_dim, n_speakers=n_speakers,
        speaker_embed_dim=speaker_embed_dim,
        convolutions=((h, k, 1), (h, k, 3), (2 * h, k, 1), (2 * h, k, 3)),
        time_upsampling=time_upsampling, dropout=dropout)

    return TTSModelConfig(
        builder="deepvoice3", encoder=encoder, decoder=decoder,
        converter=converter, mel_dim=mel_dim, linear_dim=linear_dim,
        n_speakers=n_speakers, speaker_embed_dim=speaker_embed_dim,
        downsample_step=downsample_step,
        use_decoder_state_for_postnet_input=use_decoder_state_for_postnet_input,
        speaker_embedding_weight_std=speaker_embedding_weight_std,
        freeze_embedding=freeze_embedding,
        trainable_positional_encodings=trainable_positional_encodings)


def nyanko(n_vocab, embed_dim=128, mel_dim=80, linear_dim=513, r=1,
           downsample_step=4,
           n_speakers=1, speaker_embed_dim=16, padding_idx=0,
           dropout=(1 - 0.95), kernel_size=3,
           encoder_channels=256,
           decoder_channels=256,
           converter_channels=512,
           query_position_rate=1.0,
           key_position_rate=1.29,
           use_memory_mask=False,
           trainable_positional_encodings=False,
           force_monotonic_attention=True,
           use_decoder_state_for_postnet_input=False,
           max_positions=512, embedding_weight_std=0.01,
           speaker_embedding_weight_std=0.01,
           freeze_embedding=False,
           window_ahead=3,
           window_backward=1,
           key_projection=False,
           value_projection=False,
           ):
    """Nyanko/DCTTS (reference builder.py:96-169). Single-speaker, r=1,
    downsample_step=4 only."""
    assert encoder_channels == decoder_channels
    if n_speakers != 1:
        raise ValueError("Multi-speaker is not supported")
    if not (downsample_step == 4 and r == 1):
        raise ValueError(
            "Not supported. You need to change hardcoded parameters")

    encoder = nk.NyankoEncoderConfig(
        n_vocab=n_vocab, embed_dim=embed_dim, channels=encoder_channels,
        kernel_size=kernel_size, padding_idx=padding_idx,
        embedding_weight_std=embedding_weight_std, dropout=dropout)

    decoder = nk.NyankoDecoderConfig(
        embed_dim=embed_dim, in_dim=mel_dim, r=r, channels=decoder_channels,
        kernel_size=kernel_size, max_positions=max_positions,
        padding_idx=padding_idx, dropout=dropout,
        use_memory_mask=use_memory_mask,
        force_monotonic_attention=bool(force_monotonic_attention),
        query_position_rate=query_position_rate,
        key_position_rate=key_position_rate,
        window_ahead=window_ahead, window_backward=window_backward,
        key_projection=key_projection, value_projection=value_projection,
        trainable_positional_encodings=trainable_positional_encodings)

    in_dim = decoder_channels // r if use_decoder_state_for_postnet_input \
        else mel_dim
    converter = nk.NyankoConverterConfig(
        in_dim=in_dim, out_dim=linear_dim, channels=converter_channels,
        kernel_size=kernel_size, dropout=dropout)

    return TTSModelConfig(
        builder="nyanko", encoder=encoder, decoder=decoder,
        converter=converter, mel_dim=mel_dim, linear_dim=linear_dim,
        n_speakers=n_speakers, speaker_embed_dim=speaker_embed_dim,
        downsample_step=downsample_step,
        use_decoder_state_for_postnet_input=use_decoder_state_for_postnet_input,
        speaker_embedding_weight_std=speaker_embedding_weight_std,
        freeze_embedding=freeze_embedding,
        trainable_positional_encodings=trainable_positional_encodings)


def deepvoice3_multispeaker(n_vocab, embed_dim=256, mel_dim=80,
                            linear_dim=513, r=4,
                            downsample_step=1,
                            n_speakers=1, speaker_embed_dim=16, padding_idx=0,
                            dropout=(1 - 0.95), kernel_size=5,
                            encoder_channels=128,
                            decoder_channels=256,
                            converter_channels=256,
                            query_position_rate=1.0,
                            key_position_rate=1.29,
                            use_memory_mask=False,
                            trainable_positional_encodings=False,
                            force_monotonic_attention=True,
                            use_decoder_state_for_postnet_input=True,
                            max_positions=512,
                            embedding_weight_std=0.1,
                            speaker_embedding_weight_std=0.01,
                            freeze_embedding=False,
                            window_ahead=3,
                            window_backward=1,
                            key_projection=True,
                            value_projection=True,
                            ):
    """Multi-speaker DeepVoice3: attention only at decoder layer 0, key/value
    projections on (reference builder.py:172-258)."""
    time_upsampling = max(downsample_step // r, 1)
    h, k = encoder_channels, kernel_size
    encoder = dv3.EncoderConfig(
        n_vocab=n_vocab, embed_dim=embed_dim, n_speakers=n_speakers,
        speaker_embed_dim=speaker_embed_dim, padding_idx=padding_idx,
        embedding_weight_std=embedding_weight_std,
        convolutions=((h, k, 1), (h, k, 3), (h, k, 9), (h, k, 27),
                      (h, k, 1), (h, k, 3), (h, k, 9), (h, k, 27),
                      (h, k, 1), (h, k, 3)),
        dropout=dropout, num_attention_layers=1)

    h = decoder_channels
    attention = (True, False, False, False, False)
    decoder = dv3.DecoderConfig(
        embed_dim=embed_dim, n_speakers=n_speakers,
        speaker_embed_dim=speaker_embed_dim, in_dim=mel_dim, r=r,
        max_positions=max_positions, padding_idx=padding_idx,
        preattention=((h, k, 1),),
        convolutions=((h, k, 1), (h, k, 3), (h, k, 9), (h, k, 27), (h, k, 1)),
        attention=attention, dropout=dropout,
        use_memory_mask=use_memory_mask,
        force_monotonic_attention=_monotonic_tuple(force_monotonic_attention,
                                                   5),
        query_position_rate=query_position_rate,
        key_position_rate=key_position_rate,
        window_ahead=window_ahead, window_backward=window_backward,
        key_projection=key_projection, value_projection=value_projection,
        trainable_positional_encodings=trainable_positional_encodings)

    in_dim = h // r if use_decoder_state_for_postnet_input else mel_dim
    h = converter_channels
    converter = dv3.ConverterConfig(
        in_dim=in_dim, out_dim=linear_dim, n_speakers=n_speakers,
        speaker_embed_dim=speaker_embed_dim,
        convolutions=((h, k, 1), (h, k, 3), (2 * h, k, 1), (2 * h, k, 3)),
        time_upsampling=time_upsampling, dropout=dropout)

    return TTSModelConfig(
        builder="deepvoice3_multispeaker", encoder=encoder, decoder=decoder,
        converter=converter, mel_dim=mel_dim, linear_dim=linear_dim,
        n_speakers=n_speakers, speaker_embed_dim=speaker_embed_dim,
        downsample_step=downsample_step,
        use_decoder_state_for_postnet_input=use_decoder_state_for_postnet_input,
        speaker_embedding_weight_std=speaker_embedding_weight_std,
        freeze_embedding=freeze_embedding,
        trainable_positional_encodings=trainable_positional_encodings)


# ---------------------------------------------------------------------------
# init + top-level forward
# ---------------------------------------------------------------------------


def model_init(rng, cfg: TTSModelConfig, dtype=jnp.float32):
    r = jax.random.split(rng, 4)
    fam = cfg.family
    params = {
        "encoder": fam.encoder_init(r[0], cfg.encoder, dtype),
        "decoder": fam.decoder_init(r[1], cfg.decoder, dtype),
        "converter": fam.converter_init(r[2], cfg.converter, dtype),
    }
    if cfg.n_speakers > 1:
        params["embed_speakers"] = core.embedding_init(
            r[3], cfg.n_speakers, cfg.speaker_embed_dim, None,
            cfg.speaker_embedding_weight_std, dtype)
    return params


def model_forward(params, cfg: TTSModelConfig, text_sequences, mel_targets, *,
                  speaker_ids=None, text_positions=None, frame_positions=None,
                  input_lengths=None, training=False, rng=None):
    """Teacher-forced full-model forward (reference
    MultiSpeakerTTSModel.forward, __init__.py:65-97).

    Returns (mel_outputs (B,T,mel), linear_outputs (B,T',linear),
             alignments (N,B,T/r,T_k), done (B,T/r,1)).
    """
    fam = cfg.family
    B = text_sequences.shape[0]

    speaker_embed = None
    if speaker_ids is not None:
        speaker_embed = core.embedding_apply(params["embed_speakers"],
                                             speaker_ids)

    if training:
        rng, r_enc, r_dec, r_conv = jax.random.split(rng, 4)
    else:
        r_enc = r_dec = r_conv = None

    encoder_out = fam.encoder_apply(
        params["encoder"], cfg.encoder, text_sequences,
        speaker_embed=speaker_embed, training=training, rng=r_enc)

    mel_outputs, alignments, done, decoder_states = fam.decoder_apply(
        params["decoder"], cfg.decoder, encoder_out, mel_targets,
        text_positions=text_positions, frame_positions=frame_positions,
        speaker_embed=speaker_embed, lengths=input_lengths,
        training=training, rng=r_dec)

    mel_outputs = mel_outputs.reshape(B, -1, cfg.mel_dim)

    if cfg.use_decoder_state_for_postnet_input:
        postnet_inputs = decoder_states.reshape(B, mel_outputs.shape[1], -1)
    else:
        postnet_inputs = mel_outputs

    linear_outputs = fam.converter_apply(
        params["converter"], cfg.converter, postnet_inputs,
        speaker_embed=speaker_embed, training=training, rng=r_conv)

    return mel_outputs, linear_outputs, alignments, done


def model_decode(params, cfg: TTSModelConfig, text_sequences,
                 text_positions, *, speaker_ids=None, input_lengths=None,
                 max_decoder_steps=None, early_exit=True,
                 test_inputs=None, fused=False):
    """Encoder + greedy autoregressive decode (no postnet).

    Returns (mel_outputs (B,T,mel), postnet_inputs (B,T,·), alignments,
             done (B,T/r), lengths (B,)). Split out of model_synthesize so
    callers can trim the decoder-rate buffers to the decoded lengths before
    paying for the converter and vocoder (synthesis.tts_batch)."""
    fam = cfg.family
    B = text_sequences.shape[0]

    speaker_embed = None
    if speaker_ids is not None:
        speaker_embed = core.embedding_apply(params["embed_speakers"],
                                             speaker_ids)

    encoder_out = fam.encoder_apply(
        params["encoder"], cfg.encoder, text_sequences,
        speaker_embed=speaker_embed)

    decode_kwargs = {}
    if fused:
        decode_kwargs["fused"] = True
    out = fam.decoder_decode(
        params["decoder"], cfg.decoder, encoder_out, text_positions,
        speaker_embed=speaker_embed, lengths=input_lengths,
        max_decoder_steps=max_decoder_steps, early_exit=early_exit,
        test_inputs=test_inputs, **decode_kwargs)
    if fused:
        # Fence XLA's optimizer at the Pallas-kernel boundary: without it,
        # fusing the kernel's outputs into the downstream converter sends
        # compile time from ~20s to >30min (measured on v5e remote compile).
        out = jax.tree_util.tree_map(jax.lax.optimization_barrier, out)

    mel_outputs = out.outputs.reshape(B, -1, cfg.mel_dim)

    if cfg.use_decoder_state_for_postnet_input:
        postnet_inputs = out.decoder_states.reshape(
            B, mel_outputs.shape[1], -1)
    else:
        postnet_inputs = mel_outputs

    return (mel_outputs, postnet_inputs, out.alignments, out.done,
            out.lengths)


def model_postnet(params, cfg: TTSModelConfig, postnet_inputs, *,
                  speaker_ids=None):
    """Converter half of synthesis: postnet inputs -> linear spectrogram."""
    speaker_embed = None
    if speaker_ids is not None:
        speaker_embed = core.embedding_apply(params["embed_speakers"],
                                             speaker_ids)
    return cfg.family.converter_apply(
        params["converter"], cfg.converter, postnet_inputs,
        speaker_embed=speaker_embed)


def model_synthesize(params, cfg: TTSModelConfig, text_sequences,
                     text_positions, *, speaker_ids=None, input_lengths=None,
                     max_decoder_steps=None, early_exit=True,
                     test_inputs=None, fused=False):
    """Greedy autoregressive synthesis; the full pipeline is one XLA program.

    Returns (mel_outputs, linear_outputs, alignments (B,T/r,T_k),
             done (B,T/r), lengths (B,)).
    """
    mel_outputs, postnet_inputs, alignments, done, lengths = model_decode(
        params, cfg, text_sequences, text_positions,
        speaker_ids=speaker_ids, input_lengths=input_lengths,
        max_decoder_steps=max_decoder_steps, early_exit=early_exit,
        test_inputs=test_inputs, fused=fused)
    linear_outputs = model_postnet(params, cfg, postnet_inputs,
                                   speaker_ids=speaker_ids)
    return (mel_outputs, linear_outputs, alignments, done, lengths)
