# coding: utf-8
"""Training-dynamics parity vs the PyTorch reference with shared weights.

Forward parity (test_model_parity.py) proves the applies match; these tests
prove the TRAINING stack matches: the loss blend (reference train.py:704-740),
the gradient flow through the functional weight-norm (g, v) reparametrization
(reference modules.py:85,100 trains WITH weight norm active — named a hard
part in SURVEY.md §7), and the Adam(0.5, 0.9, eps 1e-6) update chain
(reference train.py:755-759, 975-979).

The torch side drives the reference's OWN loss code imported in place
(spec_loss / MaskedL1Loss / sequence_mask / guided_attentions from
/root/reference/train.py — see reference_util.import_reference_train);
gradients come from torch autograd and are mapped into our pytree layouts by
the same import_state_dict used for weights (transposes commute with
gradients), so trees are compared leaf-by-leaf.
"""
import numpy as np
import pytest
import torch
from torch import nn

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu import builder as jx_builder
from deepvoice3_pytorch_tpu.ops import core
from deepvoice3_pytorch_tpu.training import trainer
from deepvoice3_pytorch_tpu.utils.torch_import import import_state_dict

from reference_util import import_reference, import_reference_train

import_reference()
ref_train = import_reference_train()
from deepvoice3_pytorch import builder as ref_builder  # noqa: E402


# ---------------------------------------------------------------------------
# fixtures: paired models (shared weights, dropout off) + a training batch
# ---------------------------------------------------------------------------

def _model_kwargs(builder_name):
    common = dict(n_vocab=149, embed_dim=64, mel_dim=80, linear_dim=129,
                  n_speakers=1, speaker_embed_dim=16, dropout=0.0,
                  use_memory_mask=True, force_monotonic_attention=True,
                  max_positions=128)
    if builder_name == "nyanko":
        common.update(r=1, downsample_step=4, kernel_size=3,
                      embed_dim=32, encoder_channels=32, decoder_channels=32,
                      converter_channels=32)
    else:
        common.update(r=4, downsample_step=1, kernel_size=5,
                      encoder_channels=64, decoder_channels=64,
                      converter_channels=32)
        if builder_name == "deepvoice3_multispeaker":
            common["n_speakers"] = 7
    return common


def _build_pair(builder_name, seed=0):
    torch.manual_seed(seed)
    kwargs = _model_kwargs(builder_name)
    ref = getattr(ref_builder, builder_name)(**kwargs)
    ref.train()  # dropout=0.0, so train mode only flips module flags
    cfg = getattr(jx_builder, builder_name)(**kwargs)
    # .copy() matters: .numpy() VIEWS torch storage, and jnp.asarray on the
    # CPU backend is zero-copy for aligned arrays — without the copy,
    # opt_t.step() in the trajectory test mutates the "jax" params in place.
    sd = {k: v.detach().numpy().copy() for k, v in ref.state_dict().items()}
    params = jax.tree.map(jnp.asarray, import_state_dict(sd, cfg))
    return ref, cfg, params


def _make_batch(cfg, seed=0, B=2, T_text=16, T_dec=10):
    """Batch in the reference train-loop's post-collate, post-downsample
    form: mel already downsampled (train.py:639-640), y full-resolution,
    target_lengths in full spectrogram frames."""
    r, ds = cfg.r, cfg.downsample_step
    rs = np.random.RandomState(seed)
    x = rs.randint(1, 149, (B, T_text)).astype(np.int64)
    lengths = np.array([T_text, T_text - 3])[:B].astype(np.int64)
    tp = np.tile(np.arange(1, T_text + 1), (B, 1)).astype(np.int64)
    tp = tp * (tp <= lengths[:, None])  # collate pads positions with 0
    fp = np.tile(np.arange(1, T_dec + 1), (B, 1)).astype(np.int64)

    T_mel = T_dec * r                   # downsampled-domain frames
    T_spec = T_mel * ds                 # spectrogram-domain frames
    mel = rs.rand(B, T_mel, 80).astype(np.float32) * 0.8 + 0.1
    y = rs.rand(B, T_spec, 129).astype(np.float32) * 0.8 + 0.1
    target_lengths = np.array([T_spec, T_spec - 2 * r * ds])[:B] \
        .astype(np.int64)
    done = np.zeros((B, T_dec, 1), dtype=np.float32)
    for b in range(B):
        done[b, target_lengths[b] // (r * ds) - 1:, 0] = 1.0
    spk = rs.randint(0, cfg.n_speakers, (B,)).astype(np.int64) \
        if cfg.n_speakers > 1 else None
    return dict(x=x, input_lengths=lengths, mel=mel, y=y,
                text_positions=tp, frame_positions=fp, done=done,
                target_lengths=target_lengths, speaker_ids=spk)


def _loss_config(cfg, priority_w=0.3):
    # priority_bin mirrors train.py:718: priority_freq 3000 Hz of a 22050 Hz
    # / linear_dim=129 spectrogram; priority_w is turned ON (the reference
    # default is 0) so the priority-band L1 path is exercised too.
    priority_bin = int(3000 / (22050 * 0.5) * 129)
    return trainer.LossConfig(
        r=cfg.r, downsample_step=cfg.downsample_step,
        masked_loss_weight=0.5, binary_divergence_weight=0.1,
        priority_bin=priority_bin, priority_freq_weight=priority_w,
        use_guided_attention=True, guided_attention_sigma=0.2), priority_bin


# ---------------------------------------------------------------------------
# torch side: reference forward + the reference's exact loss assembly
# ---------------------------------------------------------------------------

def _ref_forward(ref, cfg, batch):
    """MultiSpeakerTTSModel.forward (reference __init__.py:65-97) with
    .view() replaced by .reshape() — torch>=2.6 trips on non-contiguous
    .view(); reshape is numerically identical and keeps autograd."""
    x = torch.from_numpy(batch["x"])
    mel = torch.from_numpy(batch["mel"])
    spk = batch["speaker_ids"]
    speaker_embed = ref.embed_speakers(torch.from_numpy(spk)) \
        if spk is not None else None
    mel_outputs, alignments, done, decoder_states = ref.seq2seq(
        x, mel, speaker_embed,
        torch.from_numpy(batch["text_positions"]),
        torch.from_numpy(batch["frame_positions"]),
        torch.from_numpy(batch["input_lengths"]))
    B = x.shape[0]
    mel_outputs = mel_outputs.reshape(B, -1, 80)
    postnet_inputs = decoder_states.reshape(B, mel_outputs.size(1), -1) \
        if cfg.use_decoder_state_for_postnet_input else mel_outputs
    linear_outputs = ref.postnet(postnet_inputs, speaker_embed)
    return mel_outputs, linear_outputs, alignments, done


def _ref_loss(ref, cfg, batch, priority_bin, priority_w):
    """The reference train step's loss assembly, verbatim semantics
    (train.py:663-740), using the reference's own loss functions."""
    r, ds = cfg.r, cfg.downsample_step
    mel = torch.from_numpy(batch["mel"])
    y = torch.from_numpy(batch["y"])
    done = torch.from_numpy(batch["done"])
    target_lengths = torch.from_numpy(batch["target_lengths"])
    input_lengths = batch["input_lengths"]
    decoder_lengths = batch["target_lengths"] // r // ds

    decoder_target_mask = ref_train.sequence_mask(
        target_lengths // (r * ds), max_len=mel.size(1)).unsqueeze(-1)
    if ds > 1:
        target_mask = ref_train.sequence_mask(
            target_lengths, max_len=y.size(1)).unsqueeze(-1)
    else:
        target_mask = decoder_target_mask
    decoder_target_mask = decoder_target_mask[:, r:, :]
    target_mask = target_mask[:, r:, :]

    mel_outputs, linear_outputs, attn, done_hat = _ref_forward(ref, cfg,
                                                               batch)
    w = 0.1  # binary_divergence_weight (reference hparams default)
    mel_l1_loss, mel_binary_div = ref_train.spec_loss(
        mel_outputs[:, :-r, :], mel[:, r:, :], decoder_target_mask)
    mel_loss = (1 - w) * mel_l1_loss + w * mel_binary_div
    done_loss = nn.BCELoss()(done_hat, done)
    linear_l1_loss, linear_binary_div = ref_train.spec_loss(
        linear_outputs[:, :-r, :], y[:, r:, :], target_mask,
        priority_bin=priority_bin, priority_w=priority_w)
    linear_loss = (1 - w) * linear_l1_loss + w * linear_binary_div
    loss = mel_loss + linear_loss + done_loss

    soft_mask = torch.from_numpy(ref_train.guided_attentions(
        input_lengths, decoder_lengths, attn.size(-2), g=0.2))
    attn_loss = (attn * soft_mask).mean()
    loss = loss + attn_loss
    metrics = dict(mel_l1_loss=mel_l1_loss, mel_binary_div_loss=mel_binary_div,
                   mel_loss=mel_loss, done_loss=done_loss,
                   linear_l1_loss=linear_l1_loss,
                   linear_binary_div_loss=linear_binary_div,
                   linear_loss=linear_loss, attn_loss=attn_loss, loss=loss)
    return loss, metrics


# ---------------------------------------------------------------------------
# jax side
# ---------------------------------------------------------------------------

def _jax_batch(batch):
    out = {k: jnp.asarray(v) for k, v in batch.items() if v is not None}
    if batch.get("speaker_ids") is None:
        out["speaker_ids"] = None
    return out


def _jax_loss_fn(cfg, lc):
    def loss_fn(params, batch):
        outputs = jx_builder.model_forward(
            params, cfg, batch["x"], batch["mel"],
            speaker_ids=batch.get("speaker_ids"),
            text_positions=batch["text_positions"],
            frame_positions=batch["frame_positions"],
            input_lengths=batch["input_lengths"],
            training=True, rng=jax.random.PRNGKey(0))
        return trainer.compute_losses(outputs, batch, lc)
    return loss_fn


BUILDERS = ["deepvoice3", "nyanko", "deepvoice3_multispeaker"]


# ---------------------------------------------------------------------------
# 1. loss-value equality
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("builder_name", BUILDERS)
def test_loss_value_parity(builder_name):
    ref, cfg, params = _build_pair(builder_name)
    batch = _make_batch(cfg)
    lc, priority_bin = _loss_config(cfg)

    with torch.no_grad():
        _, ref_metrics = _ref_loss(ref, cfg, batch, priority_bin,
                                   lc.priority_freq_weight)
    _, jx_metrics = _jax_loss_fn(cfg, lc)(params, _jax_batch(batch))

    for k, ref_v in ref_metrics.items():
        jx_v = float(jx_metrics[k])
        np.testing.assert_allclose(
            jx_v, float(ref_v), rtol=1e-6, atol=2e-7,
            err_msg="loss component %r differs (%s)" % (k, builder_name))


# ---------------------------------------------------------------------------
# 2. per-leaf gradient parity
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("builder_name", BUILDERS)
def test_gradient_parity(builder_name):
    """jax.grad of the full loss vs torch autograd through the reference's
    loss assembly, per parameter leaf. Exercises the weight-norm (g, v)
    gradient flow (reference modules.py:85,100) and the tapsum train-time
    conv lowering actually used by the train step."""
    ref, cfg, params = _build_pair(builder_name)
    batch = _make_batch(cfg)
    lc, priority_bin = _loss_config(cfg)

    loss_t, _ = _ref_loss(ref, cfg, batch, priority_bin,
                          lc.priority_freq_weight)
    loss_t.backward()
    grad_sd = {}
    for name, p in ref.named_parameters():
        grad_sd[name] = (p.grad if p.grad is not None
                         else torch.zeros_like(p)).numpy()
    ref_grads = import_state_dict(grad_sd, cfg)

    loss_fn = _jax_loss_fn(cfg, lc)
    with core.conv_lowering(core.CONV1D_MODE_TRAIN):
        jx_grads = jax.jit(jax.grad(
            lambda p, b: loss_fn(p, b)[0]))(params, _jax_batch(batch))

    flat_ref = jax.tree_util.tree_flatten_with_path(ref_grads)[0]
    flat_jx = jax.tree_util.tree_flatten_with_path(jx_grads)[0]
    assert [p for p, _ in flat_ref] == [p for p, _ in flat_jx]
    for (path, g_ref), (_, g_jx) in zip(flat_ref, flat_jx):
        name = jax.tree_util.keystr(path)
        g_ref = np.asarray(g_ref)
        g_jx = np.asarray(g_jx)
        # scale-aware bound: gradients span ~6 orders of magnitude across
        # leaves; each leaf is held to 1e-4 of its own max magnitude
        # (plus a 1e-7 absolute floor for all-zero leaves)
        tol = 1e-4 * max(np.abs(g_ref).max(), 1e-3) + 1e-7
        err = np.abs(g_jx - g_ref).max()
        assert err <= tol, \
            "grad mismatch at %s (%s): max|diff|=%.3e tol=%.3e" \
            % (name, builder_name, err, tol)


# ---------------------------------------------------------------------------
# 3. 10-step Adam trajectory
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("builder_name", BUILDERS)
def test_adam_trajectory_parity(builder_name):
    """10 teacher-forced Adam(0.5, 0.9, eps 1e-6) steps on the same batch:
    per-step loss trajectory within 1e-3 relative, final parameter deltas
    leafwise-close. Covers the whole update chain: grads -> global-norm
    clip (clip_thresh 1.0, reference train.py:755-759) -> Adam
    (reference train.py:975-979) -> apply."""
    from types import SimpleNamespace

    ref, cfg, params = _build_pair(builder_name)
    batch = _make_batch(cfg)
    lc, priority_bin = _loss_config(cfg)
    lr, n_steps = 5e-4, 10

    # ---- torch trajectory
    trainable = list(ref.get_trainable_parameters())
    opt_t = torch.optim.Adam(trainable, lr=lr, betas=(0.5, 0.9), eps=1e-6)
    losses_t = []
    for _ in range(n_steps):
        opt_t.zero_grad()
        loss_t, _ = _ref_loss(ref, cfg, batch, priority_bin,
                              lc.priority_freq_weight)
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(trainable, 1.0)
        opt_t.step()
        losses_t.append(float(loss_t))

    # ---- jax trajectory through the production train step
    hp = SimpleNamespace(adam_beta1=0.5, adam_beta2=0.9, adam_eps=1e-6,
                         clip_thresh=1.0, lr_schedule=None,
                         initial_learning_rate=lr)
    optimizer = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, optimizer, mask)
    state = trainer.init_train_state(params, optimizer)
    params0 = jax.tree.map(np.asarray, params)
    jb = _jax_batch(batch)
    losses_j = []
    for _ in range(n_steps):
        state, metrics = step_fn(state, jb, jax.random.PRNGKey(0))
        losses_j.append(float(metrics["loss"]))

    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-3,
                               err_msg="loss trajectory diverged (%s)"
                               % builder_name)

    # ---- final parameter deltas (what training actually changed)
    sd_after = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ref_after = import_state_dict(sd_after, cfg)
    flat_ref0 = jax.tree_util.tree_flatten_with_path(params0)[0]
    flat_refN = jax.tree_util.tree_flatten_with_path(ref_after)[0]
    flat_jxN = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, state.params))[0]
    # Leaves whose TRUE gradient is zero by symmetry (e.g. attention
    # key_proj bias: softmax over keys is invariant to the per-query
    # constant shift Q.b, so dL/db == 0 exactly) still move under Adam:
    # f32 gradient noise g~1e-9 lands in the eps-dominated regime where the
    # update is lr*g/eps — a 500x amplification at lr=5e-4, eps=1e-6 — and
    # torch/jax noise is uncorrelated. Bound that regime instead of
    # comparing noise to noise: a noise gradient |g|<=1e-8 can move a leaf
    # by at most n_steps*lr*|g|/eps.
    noise_floor = n_steps * lr * (1e-8 / 1e-6)   # = 5e-5
    for (path, p0), (_, pr), (_, pj) in zip(flat_ref0, flat_refN, flat_jxN):
        d_ref = np.asarray(pr) - p0
        d_jx = pj - p0
        name = jax.tree_util.keystr(path)
        if np.abs(d_ref).max() < noise_floor:
            assert np.abs(d_jx).max() < noise_floor, \
                "leaf %s (%s) untrained in torch (|d_ref|max=%.3e) but " \
                "moved %.3e in jax" % (name, builder_name,
                                       np.abs(d_ref).max(),
                                       np.abs(d_jx).max())
            continue
        # Adam updates are ~lr-sized; hold each leaf's 10-step delta to
        # 2% of the leaf's own max |delta| (1e-7 floor for frozen leaves)
        tol = 2e-2 * max(np.abs(d_ref).max(), 1e-5) + 1e-7
        err = np.abs(d_jx - d_ref).max()
        assert err <= tol, \
            "param-delta mismatch at %s (%s): max|diff|=%.3e tol=%.3e " \
            "(|d_ref|max=%.3e)" % (name, builder_name,
                                   err, tol, np.abs(d_ref).max())
