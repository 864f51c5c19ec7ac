# coding: utf-8
"""Losses vs reference, sharded train step, data pipeline, checkpointing."""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu import builder as jx_builder
from deepvoice3_pytorch_tpu.training import losses, trainer, dataset, \
    checkpoint as ckpt
from deepvoice3_pytorch_tpu.training.lrschedule import (
    noam_learning_rate_decay, step_learning_rate_decay,
    cyclic_cosine_annealing)
from deepvoice3_pytorch_tpu.parallel import mesh as mesh_lib


# ---------------------------------------------------------------------------
# losses vs torch reference formulas
# ---------------------------------------------------------------------------


def test_masked_l1_matches_torch():
    rs = np.random.RandomState(0)
    a = rs.rand(2, 10, 4).astype(np.float32)
    b = rs.rand(2, 10, 4).astype(np.float32)
    lengths = np.array([10, 6])
    mask_t = (torch.arange(10)[None] < torch.tensor(lengths)[:, None]) \
        .float().unsqueeze(-1)
    mask_e = mask_t.expand(2, 10, 4)
    want = (torch.nn.L1Loss(reduction="sum")(
        torch.from_numpy(a) * mask_e, torch.from_numpy(b) * mask_e)
        / mask_e.sum()).item()
    mask = jnp.asarray(mask_t.numpy())
    got = float(losses.masked_l1_loss(jnp.asarray(a), jnp.asarray(b), mask))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_binary_divergence_matches_reference_formula():
    rs = np.random.RandomState(1)
    y_hat = rs.rand(2, 8, 4).astype(np.float32) * 0.9 + 0.05
    y = rs.rand(2, 8, 4).astype(np.float32)
    # reference: z = -y*logit(y_hat) + log1p(exp(logit(y_hat)))
    yh = torch.from_numpy(y_hat)
    yl = torch.log(yh + 1e-8) - torch.log(1 - yh + 1e-8)
    z = -torch.from_numpy(y) * yl + torch.log1p(torch.exp(yl))
    mask = jnp.ones((2, 8, 1))
    got = float(losses.binary_divergence(jnp.asarray(y_hat), jnp.asarray(y),
                                         mask, 0.5))
    want = (0.5 * z.mean() + 0.5 * z.mean()).item()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_guided_attention_matches_reference_numba_formula():
    def ref_guided_attention(N, max_N, T, max_T, g):
        W = np.zeros((max_N, max_T), dtype=np.float32)
        for n in range(N):
            for t in range(T):
                W[n, t] = 1 - np.exp(-(n / N - t / T) ** 2 / (2 * g * g))
        return W

    input_lengths = np.array([12, 9])
    decoder_lengths = np.array([20, 15])
    max_N, max_T = 14, 22
    want = np.zeros((2, max_T, max_N), np.float32)
    for b in range(2):
        want[b] = ref_guided_attention(input_lengths[b], max_N,
                                       decoder_lengths[b], max_T, 0.2).T
    got = np.asarray(losses.guided_attention_matrix(
        jnp.asarray(input_lengths), jnp.asarray(decoder_lengths),
        max_N, max_T, 0.2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bce_matches_torch():
    rs = np.random.RandomState(2)
    y_hat = rs.rand(4, 7, 1).astype(np.float32) * 0.98 + 0.01
    y = (rs.rand(4, 7, 1) > 0.5).astype(np.float32)
    want = torch.nn.BCELoss()(torch.from_numpy(y_hat),
                              torch.from_numpy(y)).item()
    got = float(losses.bce_loss(jnp.asarray(y_hat), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_bce_saturated_probabilities_finite():
    """A converging model saturates the done sigmoid to exactly 1.0 in f32
    (observed at step ~309 of LJSpeech-preset training), where an
    eps=1e-12 probability clip is a no-op (1 - 1e-12 rounds to 1.0) and
    log(0) * 0 NaNs the whole loss. Torch's BCELoss clamps the log terms
    at -100 instead — loss AND gradient must stay finite, matching torch."""
    y_hat = np.array([[1.0], [0.0], [1.0], [0.5]], np.float32)
    y = np.array([[1.0], [0.0], [0.0], [1.0]], np.float32)
    got = float(losses.bce_loss(jnp.asarray(y_hat), jnp.asarray(y)))
    want = torch.nn.BCELoss()(torch.from_numpy(y_hat),
                              torch.from_numpy(y)).item()
    assert np.isfinite(got)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    g = jax.grad(lambda p: losses.bce_loss(p, jnp.asarray(y)))(
        jnp.asarray(y_hat))
    assert np.isfinite(np.asarray(g)).all()


def test_lr_schedules():
    # identical to reference lrschedule.py formulas
    np.testing.assert_allclose(
        float(noam_learning_rate_decay(5e-4, 0)),
        5e-4 * 4000 ** 0.5 * min(1 * 4000 ** -1.5, 1 ** -0.5))
    np.testing.assert_allclose(
        float(noam_learning_rate_decay(5e-4, 50000)),
        5e-4 * 4000 ** 0.5 * min(50001 * 4000 ** -1.5, 50001 ** -0.5),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(step_learning_rate_decay(1e-3, 60000)), 1e-3 * 0.98 ** 2)
    v = float(cyclic_cosine_annealing(1e-3, 1, 500000, 10))
    np.testing.assert_allclose(v, 1e-3, rtol=1e-5)


# ---------------------------------------------------------------------------
# train step (sharded over the 8-device CPU mesh)
# ---------------------------------------------------------------------------


class _HP:
    outputs_per_step = 4
    downsample_step = 1
    masked_loss_weight = 0.5
    binary_divergence_weight = 0.1
    priority_freq = 3000
    priority_freq_weight = 0.0
    use_guided_attention = True
    guided_attention_sigma = 0.2
    sample_rate = 22050
    fft_size = 256
    adam_beta1 = 0.5
    adam_beta2 = 0.9
    adam_eps = 1e-6
    amsgrad = False
    clip_thresh = 0.1
    weight_decay = 0.0
    initial_learning_rate = 5e-4
    lr_schedule = "noam_learning_rate_decay"
    lr_schedule_kwargs = {}


def _tiny_cfg(**kw):
    args = dict(n_vocab=149, embed_dim=64, encoder_channels=32,
                decoder_channels=32, converter_channels=32, linear_dim=129,
                r=4, dropout=0.05, max_positions=128)
    args.update(kw)
    return jx_builder.deepvoice3(**args)


def _tiny_batch(B=8, T_text=16, T_dec=8, r=4, mel_dim=80, lin_dim=129):
    rs = np.random.RandomState(0)
    return {
        "x": rs.randint(1, 149, (B, T_text)).astype(np.int32),
        "input_lengths": np.full((B,), T_text, np.int32),
        "mel": rs.rand(B, T_dec * r, mel_dim).astype(np.float32),
        "y": rs.rand(B, T_dec * r, lin_dim).astype(np.float32),
        "text_positions": np.tile(np.arange(1, T_text + 1),
                                  (B, 1)).astype(np.int32),
        "frame_positions": np.tile(np.arange(1, T_dec + 1),
                                   (B, 1)).astype(np.int32),
        "done": np.ones((B, T_dec, 1), np.float32),
        "target_lengths": np.full((B,), T_dec * r, np.int32),
    }


def test_train_step_runs_and_decreases_loss():
    hp = _HP()
    cfg = _tiny_cfg(dropout=0.0)
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    lc = trainer.loss_config_from_hparams(hp)
    lr_fn = trainer.make_lr_fn(hp)
    opt = trainer.make_optimizer(hp, lr_fn)
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)

    batch = jax.tree.map(jnp.asarray, _tiny_batch())
    losses_seen = []
    for i in range(25):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
        losses_seen.append(float(metrics["loss"]))
    assert int(state.step) == 25
    assert np.isfinite(losses_seen).all()
    assert np.mean(losses_seen[-5:]) < np.mean(losses_seen[:5]), losses_seen


def test_train_step_sharded_data_parallel():
    hp = _HP()
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)

    # single-device result first (donation would otherwise delete the
    # aliased buffers shard_params may return)
    state2 = trainer.init_train_state(jax.tree.map(jnp.array, params), opt)
    state2, metrics2 = step_fn(state2, jax.tree.map(jnp.asarray,
                                                    _tiny_batch(B=8)),
                               jax.random.PRNGKey(0))

    mesh = mesh_lib.make_mesh()  # 8 CPU devices on 'data'
    assert mesh.shape["data"] == 8
    batch = mesh_lib.shard_batch(mesh, _tiny_batch(B=8))
    params_r = mesh_lib.shard_params(params, mesh)
    state = trainer.init_train_state(params_r, opt)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # sharded result == single-device result (same rng, same batch)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics2["loss"]), rtol=1e-5)


def test_bf16_training_parity():
    """compute_dtype='bfloat16' (hparams.py speed path): master params and
    optimizer state stay f32, loss trajectory tracks the f32 run."""
    hp = _HP()
    cfg = _tiny_cfg(dropout=0.0)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    batch = jax.tree.map(jnp.asarray, _tiny_batch())

    traces = {}
    for dtype in ("float32", "bfloat16"):
        params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
        mask = trainer.trainable_mask(params, cfg)
        step_fn = trainer.make_train_step(cfg, lc, opt, mask,
                                          compute_dtype=dtype)
        state = trainer.init_train_state(params, opt)
        losses_seen = []
        for i in range(30):
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(i))
            losses_seen.append(float(metrics["loss"]))
        traces[dtype] = losses_seen
        # masters stay f32 regardless of compute dtype
        assert all(x.dtype == jnp.float32
                   for x in jax.tree.leaves(state.params))

    f32, bf16 = np.asarray(traces["float32"]), np.asarray(traces["bfloat16"])
    assert np.isfinite(bf16).all()
    # same trajectory within bf16 resolution: every step close in relative
    # terms, and the same overall descent
    np.testing.assert_allclose(bf16, f32, rtol=0.05)
    assert bf16[-5:].mean() < bf16[:5].mean()


def test_trainable_mask_freezes_positions():
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    mask = trainer.trainable_mask(params, cfg)
    assert mask["decoder"]["embed_query_positions"]["w"] == 0.0
    assert mask["decoder"]["embed_keys_positions"]["w"] == 0.0
    assert mask["encoder"]["embed_tokens"]["w"] == 1.0
    m2 = trainer.trainable_mask(params, cfg, train_postnet=False)
    assert all(x == 0.0 for x in jax.tree.leaves(m2["converter"]))


def test_partial_training_modes():
    hp = _HP()
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    batch = jax.tree.map(jnp.asarray, _tiny_batch())
    for s2s, pn in [(True, False), (False, True)]:
        # postnet-only feeds ground-truth mel to the converter, which needs
        # use_decoder_state_for_postnet_input=False (as in the reference)
        cfg = _tiny_cfg(use_decoder_state_for_postnet_input=s2s)
        params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
        lc = trainer.loss_config_from_hparams(hp)._replace(
            train_seq2seq=s2s, train_postnet=pn)
        mask = trainer.trainable_mask(params, cfg, train_seq2seq=s2s,
                                      train_postnet=pn)
        step_fn = trainer.make_train_step(cfg, lc, opt, mask)
        state = trainer.init_train_state(params, opt)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


# ---------------------------------------------------------------------------
# dataset pipeline
# ---------------------------------------------------------------------------


def _fake_corpus(tmp_path, n=12, multi_speaker=False):
    rs = np.random.RandomState(0)
    lines = []
    for i in range(n):
        T = int(rs.randint(40, 120))
        mel = rs.rand(T, 80).astype(np.float32)
        lin = rs.rand(T, 129).astype(np.float32)
        np.save(tmp_path / f"x-mel-{i:05d}.npy", mel)
        np.save(tmp_path / f"x-spec-{i:05d}.npy", lin)
        cols = [f"x-spec-{i:05d}.npy", f"x-mel-{i:05d}.npy", str(T),
                "hello world %d." % i]
        if multi_speaker:
            cols.append(str(i % 3))
        lines.append("|".join(cols))
    (tmp_path / "train.txt").write_text("\n".join(lines), encoding="utf-8")
    return tmp_path


def test_dataset_and_collate(tmp_path):
    from deepvoice3_pytorch_tpu.frontend import en
    root = _fake_corpus(tmp_path)
    ds = dataset.TTSDataset(str(root), en, replace_pronunciation_prob=0.0)
    assert len(ds) == 12
    item = ds[0]
    assert item["mel"].shape[1] == 80 and item["linear"].shape[1] == 129

    sampler = dataset.SimilarTimeLengthSampler(ds.meta.frame_lengths,
                                               batch_size=4)
    loader = dataset.DataLoader(ds, sampler, r=4, downsample_step=1,
                                length_bucket_step=16, frame_bucket_step=8)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    r, ds_step = 4, 1
    assert b["mel"].shape[0] == 4
    assert b["mel"].shape[1] % r == 0
    assert b["x"].shape[1] % 16 == 0
    assert b["frame_positions"].shape[1] == b["mel"].shape[1] // r
    assert b["done"].shape[1] == b["mel"].shape[1] // r
    # b_pad: first r*ds frames of mel are zero
    assert np.abs(b["mel"][:, :r // ds_step]).max() == 0.0
    assert (b["text_positions"][:, 0] == 1).all()


def test_dataset_downsample(tmp_path):
    from deepvoice3_pytorch_tpu.frontend import en
    root = _fake_corpus(tmp_path)
    ds = dataset.TTSDataset(str(root), en, 0.0)
    sampler = dataset.SimilarTimeLengthSampler(ds.meta.frame_lengths,
                                               batch_size=4)
    loader = dataset.DataLoader(ds, sampler, r=1, downsample_step=4)
    b = next(iter(loader))
    assert b["y"].shape[1] == b["mel"].shape[1] * 4
    assert b["done"].shape[1] == b["mel"].shape[1]


def test_multispeaker_dataset(tmp_path):
    from deepvoice3_pytorch_tpu.frontend import en
    root = _fake_corpus(tmp_path, multi_speaker=True)
    ds = dataset.TTSDataset(str(root), en, 0.0)
    assert ds.multi_speaker
    sampler = dataset.SimilarTimeLengthSampler(ds.meta.frame_lengths,
                                               batch_size=4)
    b = next(iter(dataset.DataLoader(ds, sampler, r=4, downsample_step=1)))
    assert "speaker_ids" in b and b["speaker_ids"].shape == (4,)
    # speaker filtering
    ds1 = dataset.TTSDataset(str(root), en, 0.0, speaker_id=0)
    assert not ds1.multi_speaker and len(ds1) == 4


def test_sampler_groups_similar_lengths():
    lengths = list(range(100))
    sampler = dataset.SimilarTimeLengthSampler(lengths, batch_size=8,
                                               batch_group_size=32)
    spreads = []
    for batch_idx in sampler:
        ls = [lengths[i] for i in batch_idx]
        spreads.append(max(ls) - min(ls))
    assert np.mean(spreads) < 40  # much tighter than random (~90)


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    hp = _HP()
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    opt_state = opt.init(params)

    path = ckpt.save_checkpoint(str(tmp_path), params, opt_state, 100, 2)
    assert os.path.exists(path)

    template = jx_builder.model_init(jax.random.PRNGKey(1), cfg)
    p2, os2, step, epoch = ckpt.load_checkpoint(path, template,
                                                opt_state)
    assert step == 100 and epoch == 2
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert os2 is not None


def test_checkpoint_async_matches_sync(tmp_path):
    """async_save writes the same content a synchronous save would, and the
    device snapshot makes it immune to the train step's buffer donation:
    steps taken AFTER submit must not leak into the written file."""
    hp = _HP()
    cfg = _tiny_cfg(dropout=0.0)
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    lc = trainer.loss_config_from_hparams(hp)
    lr_fn = trainer.make_lr_fn(hp)
    opt = trainer.make_optimizer(hp, lr_fn)
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask)
    state = trainer.init_train_state(params, opt)
    batch = jax.tree.map(jnp.asarray, _tiny_batch())
    for i in range(3):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(i))

    sync_dir, async_dir = str(tmp_path / "sync"), str(tmp_path / "async")
    ckpt.save_checkpoint(sync_dir, state.params, state.opt_state, 3, 0)
    ckpt.save_checkpoint(async_dir, state.params, state.opt_state, 3, 0,
                         async_save=True)
    # mutate the live (donated) buffers while the async write may be in
    # flight — the file must hold the step-3 values
    for i in range(5):
        state, _ = step_fn(state, batch, jax.random.PRNGKey(100 + i))
    ckpt.wait_pending_saves()

    a = ckpt._load_blob(ckpt.checkpoint_path(sync_dir, 3))
    b = ckpt._load_blob(ckpt.checkpoint_path(async_dir, 3))
    assert a["global_step"] == b["global_step"] == 3
    assert a["opt_fingerprint"] == b["opt_fingerprint"]
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_async_surfaces_write_errors(tmp_path):
    # a background write into a nonexistent directory must fail loudly at
    # the flush point, not be swallowed by the writer thread
    blob = {"params": {"w": np.zeros(3, np.float32)}, "opt_state": None,
            "opt_fingerprint": None, "global_step": 1, "global_epoch": 0}
    ckpt._writer.submit(blob, str(tmp_path / "missing_dir" / "x.ckpt"))
    with pytest.raises(RuntimeError, match="async checkpoint save failed"):
        ckpt.wait_pending_saves()
    ckpt.wait_pending_saves()  # error queue drained; writer is reusable


def test_checkpoint_halves_and_restore_parts(tmp_path):
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    p_s2s = ckpt.save_checkpoint(str(tmp_path), params, None, 5, 0,
                                 train_seq2seq=True, train_postnet=False)
    p_pn = ckpt.save_checkpoint(str(tmp_path), params, None, 5, 0,
                                train_seq2seq=False, train_postnet=True)
    assert "_seq2seq" in p_s2s and "_postnet" in p_pn

    template = jx_builder.model_init(jax.random.PRNGKey(9), cfg)
    merged = ckpt.restore_parts(p_s2s, template)
    np.testing.assert_array_equal(
        np.asarray(merged["encoder"]["embed_tokens"]["w"]),
        np.asarray(params["encoder"]["embed_tokens"]["w"]))
    # converter untouched (not in the seq2seq half)
    np.testing.assert_array_equal(
        np.asarray(merged["converter"]["layers"][0]["conv"]["v"]),
        np.asarray(template["converter"]["layers"][0]["conv"]["v"]))

    # shape-tolerant: different n_vocab keeps template embedding
    cfg2 = _tiny_cfg(n_vocab=300)
    template2 = jx_builder.model_init(jax.random.PRNGKey(3), cfg2)
    merged2 = ckpt.restore_parts(p_s2s, template2)
    assert merged2["encoder"]["embed_tokens"]["w"].shape[0] == 300

    # load_embedding
    p3 = ckpt.load_embedding(p_s2s, template)
    np.testing.assert_array_equal(
        np.asarray(p3["encoder"]["embed_tokens"]["w"]),
        np.asarray(params["encoder"]["embed_tokens"]["w"]))


def test_checkpoint_detects_optimizer_chain_change(tmp_path):
    """Saving with Adam and resuming with Adam+weight_decay (extra chain
    element) must fail loudly, not silently misalign leaves."""
    hp = _HP()
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    path = ckpt.save_checkpoint(str(tmp_path), params, opt.init(params),
                                100, 2)

    hp2 = _HP()
    hp2.weight_decay = 0.01
    opt2 = trainer.make_optimizer(hp2, trainer.make_lr_fn(hp2))
    with pytest.raises(ValueError, match="reset[_-]optimizer"):
        ckpt.load_checkpoint(path, params, opt2.init(params))

    # --reset-optimizer escapes: params load, optimizer state dropped
    p2, os2, step, _ = ckpt.load_checkpoint(path, params, opt2.init(params),
                                            reset_optimizer=True)
    assert os2 is None and step == 100


def test_checkpoint_detects_corrupt_opt_leaves(tmp_path):
    """Reordered/reshaped optimizer leaves are rejected by the per-leaf
    shape check even when the structure fingerprint is absent (old format)."""
    hp = _HP()
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    opt_state = opt.init(params)

    leaves = ckpt.flatten_opt_state(opt_state)
    # find two differently-shaped leaves and swap them
    by_shape = {}
    swap = None
    for i, leaf in enumerate(leaves):
        shape = tuple(np.shape(leaf))
        for j, other in by_shape.items():
            if other != shape:
                swap = (j, i)
        by_shape[i] = shape
        if swap:
            break
    assert swap is not None
    i, j = swap
    leaves[i], leaves[j] = leaves[j], leaves[i]
    with pytest.raises(ValueError, match="shape"):
        ckpt.unflatten_opt_state(opt_state, leaves)

    # dropped leaf -> count mismatch error
    with pytest.raises(ValueError, match="leaves"):
        ckpt.unflatten_opt_state(opt_state,
                                 ckpt.flatten_opt_state(opt_state)[:-1])


def test_latest_checkpoint(tmp_path):
    cfg = _tiny_cfg()
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    ckpt.save_checkpoint(str(tmp_path), params, None, 10, 0)
    ckpt.save_checkpoint(str(tmp_path), params, None, 20, 0)
    ckpt.save_checkpoint(str(tmp_path), params, None, 30, 0,
                         train_seq2seq=True, train_postnet=False)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest.endswith("checkpoint_step000000020.ckpt")


def test_train_step_pallas_conv_mode_matches_tapsum():
    """make_train_step(conv_mode='pallas') routes every kw>1 conv through
    the Pallas tap-accumulating kernel (ops/conv_pallas.py) in forward
    AND backward; one full step must reproduce tapsum's metrics and
    updated params to the f32 reassociation class (the kernel sums taps
    in f32 exactly like tapsum, so the tolerance is tight)."""
    hp = _HP()
    cfg = _tiny_cfg(dropout=0.0)
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    batch = jax.tree.map(jnp.asarray, _tiny_batch())

    results = {}
    for mode in ("tapsum", "pallas"):
        step_fn = trainer.make_train_step(cfg, lc, opt, mask,
                                          conv_mode=mode)
        state = trainer.init_train_state(jax.tree.map(jnp.array, params),
                                         opt)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        results[mode] = (float(metrics["loss"]),
                         float(metrics["grad_norm"]), state.params)

    np.testing.assert_allclose(results["pallas"][0], results["tapsum"][0],
                               rtol=1e-6)
    np.testing.assert_allclose(results["pallas"][1], results["tapsum"][1],
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(results["tapsum"][2]),
                    jax.tree.leaves(results["pallas"][2])):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)
