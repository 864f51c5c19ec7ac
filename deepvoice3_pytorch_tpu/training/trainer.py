# coding: utf-8
"""Train state + jitted/pjit-sharded train step.

One XLA program per step: forward (seq2seq and/or postnet), all losses
(masked L1, binary divergence, done BCE, in-graph guided attention), backward,
gradient clip, Adam update, lr schedule. The reference's host-side work per
step (numba guided attention, per-group lr pokes — train.py:627-632,735-738)
all lives in-graph here.
"""

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..builder import TTSModelConfig, model_forward
from ..ops import core
from . import losses
from . import lrschedule as lrs


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Any  # int32 scalar


class LossConfig(NamedTuple):
    r: int
    downsample_step: int
    masked_loss_weight: float = 0.5
    binary_divergence_weight: float = 0.1
    priority_bin: Optional[int] = None
    priority_freq_weight: float = 0.0
    use_guided_attention: bool = True
    guided_attention_sigma: float = 0.2
    train_seq2seq: bool = True
    train_postnet: bool = True


def loss_config_from_hparams(hp):
    linear_dim = hp.fft_size // 2 + 1
    return LossConfig(
        r=hp.outputs_per_step,
        downsample_step=hp.downsample_step,
        masked_loss_weight=hp.masked_loss_weight,
        binary_divergence_weight=hp.binary_divergence_weight,
        priority_bin=int(hp.priority_freq / (hp.sample_rate * 0.5)
                         * linear_dim),
        priority_freq_weight=hp.priority_freq_weight,
        use_guided_attention=hp.use_guided_attention,
        guided_attention_sigma=hp.guided_attention_sigma,
    )


def make_optimizer(hp, lr_fn):
    """Adam(beta1, beta2, eps) + global-norm clip (reference train.py:755-759,
    975-979). amsgrad supported via optax.amsgrad."""
    scale = (optax.amsgrad if getattr(hp, "amsgrad", False) else optax.adam)
    opt = scale(learning_rate=lr_fn, b1=hp.adam_beta1, b2=hp.adam_beta2,
                eps=hp.adam_eps)
    chain = [opt]
    if hp.clip_thresh > 0:
        chain = [optax.clip_by_global_norm(hp.clip_thresh)] + chain
    if getattr(hp, "weight_decay", 0.0) > 0:
        chain = [optax.add_decayed_weights(hp.weight_decay)] + chain
    return optax.chain(*chain)


def make_lr_fn(hp):
    if hp.lr_schedule is None or hp.lr_schedule == "":
        return lambda step: hp.initial_learning_rate
    return lrs.get_schedule(hp.lr_schedule, hp.initial_learning_rate,
                            **dict(hp.lr_schedule_kwargs))


def trainable_mask(params, cfg: TTSModelConfig, *, train_seq2seq=True,
                   train_postnet=True):
    """0/1 multiplier pytree for gradients: frozen positional tables
    (reference __init__.py:48-63), frozen text embedding, and partial
    seq2seq/postnet training (train.py:684-701)."""
    def zeros_like_tree(t):
        return jax.tree.map(lambda x: 0.0, t)

    def ones_like_tree(t):
        return jax.tree.map(lambda x: 1.0, t)

    mask = ones_like_tree(params)
    dec = mask["decoder"]
    if not cfg.trainable_positional_encodings:
        for k in ("embed_query_positions", "embed_keys_positions"):
            if k in dec:
                dec[k] = zeros_like_tree(dec[k])
    if cfg.freeze_embedding:
        mask["encoder"]["embed_tokens"] = zeros_like_tree(
            mask["encoder"]["embed_tokens"])
    if not train_seq2seq:
        mask["encoder"] = zeros_like_tree(mask["encoder"])
        mask["decoder"] = zeros_like_tree(mask["decoder"])
    if not train_postnet:
        mask["converter"] = zeros_like_tree(mask["converter"])
    return mask


def compute_losses(outputs, batch, lc: LossConfig):
    """Assemble the reference's loss blend (train.py:704-740).

    batch dict: x, input_lengths, mel (downsampled), y (linear),
    text_positions, frame_positions, done, target_lengths, speaker_ids.
    """
    mel_outputs, linear_outputs, attn, done_hat = outputs
    r = lc.r
    mel = batch["mel"]
    y = batch["y"]
    w = lc.binary_divergence_weight

    target_lengths = batch["target_lengths"]
    decoder_lengths = target_lengths // (r * lc.downsample_step)

    metrics = {}
    loss = 0.0

    # Mask construction mirrors reference train.py:665-680 exactly,
    # including the downsample_step == 1 quirk: the reference reuses the
    # decoder-domain mask (valid length target_lengths // r, NOT
    # target_lengths) for the LINEAR loss too when no downsampling is in
    # effect ("target_mask = decoder_target_mask"). All shipped presets use
    # downsample_step=4 so this only shows up in r>1/ds=1 configs, but
    # training-dynamics parity (tests/test_training_parity.py) holds us to
    # the reference's gradient flow, quirks included.
    if lc.masked_loss_weight > 0:
        decoder_target_mask = core.sequence_mask(
            target_lengths // (r * lc.downsample_step),
            mel.shape[1])[..., None]
        if lc.downsample_step > 1:
            target_mask = core.sequence_mask(target_lengths,
                                             y.shape[1])[..., None]
        else:
            target_mask = decoder_target_mask
        decoder_target_mask = decoder_target_mask[:, r:, :]
        target_mask = target_mask[:, r:, :]
    else:
        decoder_target_mask, target_mask = None, None

    if lc.train_seq2seq:
        mel_l1, mel_bd = losses.spec_loss(
            mel_outputs[:, :-r, :], mel[:, r:, :], decoder_target_mask,
            masked_loss_weight=lc.masked_loss_weight,
            binary_divergence_weight=lc.binary_divergence_weight)
        mel_loss = (1 - w) * mel_l1 + w * mel_bd
        done_loss = losses.bce_loss(done_hat, batch["done"])
        loss = loss + mel_loss + done_loss
        metrics.update(mel_l1_loss=mel_l1, mel_binary_div_loss=mel_bd,
                       mel_loss=mel_loss, done_loss=done_loss)

        if lc.use_guided_attention:
            attn_loss = losses.guided_attention_loss(
                attn, batch["input_lengths"], decoder_lengths,
                g=lc.guided_attention_sigma)
            loss = loss + attn_loss
            metrics["attn_loss"] = attn_loss

    if lc.train_postnet:
        lin_l1, lin_bd = losses.spec_loss(
            linear_outputs[:, :-r, :], y[:, r:, :], target_mask,
            masked_loss_weight=lc.masked_loss_weight,
            binary_divergence_weight=lc.binary_divergence_weight,
            priority_bin=lc.priority_bin,
            priority_w=lc.priority_freq_weight)
        linear_loss = (1 - w) * lin_l1 + w * lin_bd
        loss = loss + linear_loss
        metrics.update(linear_l1_loss=lin_l1, linear_binary_div_loss=lin_bd,
                       linear_loss=linear_loss)

    metrics["loss"] = loss
    return loss, metrics


def resolve_conv_mode(conv_mode, seq_sharding):
    """Conv lowering actually traced into the step (see make_train_step's
    docstring for why pallas + sequence parallelism falls back)."""
    if conv_mode is None:
        conv_mode = core.CONV1D_MODE_TRAIN
    if conv_mode == "pallas" and seq_sharding is not None:
        conv_mode = "tapsum"
    return conv_mode


def make_train_step(cfg: TTSModelConfig, lc: LossConfig, optimizer, mask,
                    compute_dtype=jnp.float32, seq_sharding=None,
                    conv_mode=None):
    """Build the jitted train step. Call under a mesh with sharded batch for
    data parallelism; XLA inserts the gradient all-reduce.

    compute_dtype selects the mixed-precision speed path (hparams
    compute_dtype="bfloat16"): master params, losses, and Adam moments stay
    float32; the forward/backward runs with bf16 params and activations
    (the params cast happens inside the differentiated function, so
    gradients flow back to the f32 masters; the TPU MXU accumulates bf16
    matmuls in f32 regardless, and attention scores/softmax are computed
    in f32 by ops/attention.py). Loss-trajectory parity vs f32 is tested
    in tests/test_training.py::test_bf16_training_parity.

    seq_sharding (a NamedSharding over (B, T, ...), from
    parallel.mesh.seq_sharding) turns on sequence parallelism: the decoder
    input and loss targets are pinned batch-over-'data' x time-over-'model',
    and GSPMD propagates the time sharding through the conv stacks (halo
    exchanges) and attention (time-sharded query rows). Numeric equivalence
    with the unsharded step is pinned by
    tests/test_multichip.py::test_sp2_step_matches_single_device.

    conv_mode overrides the conv lowering traced into the step (None =
    ops.core.CONV1D_MODE_TRAIN, the measured train-step default).
    'pallas' composes with data parallelism (batch-sharded inputs keep
    whole rows per device) but NOT with sequence parallelism: GSPMD has
    no partitioning rule for the kernel's time-dim halo, so a
    time-sharded operand would be all-gathered (or fail to partition),
    silently destroying the sp speedup — that combination falls back to
    tapsum here."""
    compute_dtype = jnp.dtype(compute_dtype)
    conv_mode = resolve_conv_mode(conv_mode, seq_sharding)

    def _cast(tree):
        return jax.tree.map(
            lambda x: x.astype(compute_dtype)
            if x.dtype == jnp.float32 else x, tree)

    def loss_fn(params, batch, rng):
        # mel_in is the bf16 copy fed to the network; batch['mel'] stays the
        # untouched f32 loss target (quantizing the target would add a bf16
        # rounding noise floor to mel_loss).
        mel_in = batch["mel"]
        if seq_sharding is not None:
            mel_in = jax.lax.with_sharding_constraint(mel_in, seq_sharding)
            batch = dict(batch, y=jax.lax.with_sharding_constraint(
                batch["y"], seq_sharding))
        if compute_dtype != jnp.float32:
            params = _cast(params)
            mel_in = mel_in.astype(compute_dtype)
        if lc.train_seq2seq:
            outputs = model_forward(
                params, cfg, batch["x"], mel_in,
                speaker_ids=batch.get("speaker_ids"),
                text_positions=batch["text_positions"],
                frame_positions=batch["frame_positions"],
                input_lengths=batch["input_lengths"],
                training=True, rng=rng)
            if not lc.train_postnet:
                outputs = (outputs[0], None, outputs[2], outputs[3])
        else:
            # postnet-only: converter over ground-truth (downsampled) mel
            fam = cfg.family
            linear = fam.converter_apply(
                params["converter"], cfg.converter, mel_in,
                training=True, rng=rng)
            outputs = (None, linear, None, None)
        if compute_dtype != jnp.float32:
            # losses in f32 (targets in the batch are untouched f32)
            outputs = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if x is not None and x.dtype == compute_dtype else x,
                outputs, is_leaf=lambda x: x is None)
        return compute_losses(outputs, batch, lc)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng):
        # conv lowering is context-dependent: tapsum wins the train step
        # (+8-10 MFU), XLA's conv emitter wins forward-only synthesis.
        # The context manager runs at trace time, so any retrace of this
        # step re-selects the training mode (ops/core.py:conv_lowering).
        with core.conv_lowering(conv_mode):
            (_, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def init_train_state(params, optimizer):
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.int32(0))
