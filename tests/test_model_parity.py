# coding: utf-8
"""Whole-model numerical parity vs the PyTorch reference with shared weights.

This is the north-star contract: reference weights imported into our pytrees
must produce matching mel/linear/alignment/done outputs in eval mode.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu import builder as jx_builder
from deepvoice3_pytorch_tpu.ops.core import strict_numerics
from deepvoice3_pytorch_tpu.utils.torch_import import import_state_dict

from reference_util import import_reference

import_reference()
from deepvoice3_pytorch import builder as ref_builder  # noqa: E402

# Strict-parity bound (round-4 verdict #2): whole-model forward under
# strict_numerics() must match torch CPU to 1e-5. The measured floor is
# ~1.3e-6 (linear output, 20 weight-normed conv layers deep — error budget
# in DESIGN.md §8), so this carries ~8x headroom for backend/version skew
# while sitting 20x below the old 2e-4 bound it replaces.
ATOL = 1e-5


def _state_dict_np(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _common_kwargs(n_speakers=1):
    return dict(n_vocab=149, embed_dim=64, mel_dim=80, linear_dim=129,
                r=4, downsample_step=1, n_speakers=n_speakers,
                speaker_embed_dim=16, dropout=0.05, kernel_size=5,
                encoder_channels=64, decoder_channels=64,
                converter_channels=32, use_memory_mask=True,
                force_monotonic_attention=True, max_positions=128)


def _make_inputs(B=2, T_text=20, T_dec=12, r=4, n_speakers=1, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randint(1, 149, (B, T_text)).astype(np.int64)
    mel = rs.rand(B, T_dec * r, 80).astype(np.float32)
    tp = np.tile(np.arange(1, T_text + 1), (B, 1)).astype(np.int64)
    fp = np.tile(np.arange(1, T_dec + 1), (B, 1)).astype(np.int64)
    lengths = np.array([T_text, T_text - 3])[:B].astype(np.int64)
    spk = rs.randint(0, n_speakers, (B,)).astype(np.int64) \
        if n_speakers > 1 else None
    return x, mel, tp, fp, lengths, spk


@pytest.mark.parametrize("builder_name,n_speakers", [
    ("deepvoice3", 1),
    ("deepvoice3", 1),
    ("deepvoice3_multispeaker", 7),
])
def test_deepvoice3_forward_parity(builder_name, n_speakers):
    torch.manual_seed(0)
    kwargs = _common_kwargs(n_speakers)
    ref = getattr(ref_builder, builder_name)(**kwargs).eval()
    cfg = getattr(jx_builder, builder_name)(**kwargs)
    params = jax.tree.map(jnp.asarray, import_state_dict(_state_dict_np(ref),
                                                         cfg))

    x, mel, tp, fp, lengths, spk = _make_inputs(n_speakers=n_speakers)

    with torch.no_grad():
        # call seq2seq+postnet separately: the reference top-level forward
        # uses .view() which trips on non-contiguous tensors in torch>=2.6
        mel_t, align_t, done_t, dec_states = ref.seq2seq(
            torch.from_numpy(x), torch.from_numpy(mel),
            ref.embed_speakers(torch.from_numpy(spk)) if spk is not None else None,
            torch.from_numpy(tp), torch.from_numpy(fp),
            torch.from_numpy(lengths))
        B = x.shape[0]
        mel_t = mel_t.reshape(B, -1, 80)
        postnet_in = dec_states.reshape(B, mel_t.shape[1], -1) \
            if cfg.use_decoder_state_for_postnet_input else mel_t
        spk_embed = ref.embed_speakers(torch.from_numpy(spk)) \
            if spk is not None else None
        lin_t = ref.postnet(postnet_in, spk_embed)

    with strict_numerics():
        mel_j, lin_j, align_j, done_j = jx_builder.model_forward(
            params, cfg, jnp.asarray(x), jnp.asarray(mel),
            speaker_ids=jnp.asarray(spk) if spk is not None else None,
            text_positions=jnp.asarray(tp), frame_positions=jnp.asarray(fp),
            input_lengths=jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(mel_j), mel_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(done_j), done_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(align_j), align_t.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(lin_j), lin_t.numpy(), atol=ATOL)


def test_nyanko_forward_parity():
    torch.manual_seed(0)
    kwargs = dict(n_vocab=149, embed_dim=32, mel_dim=80, linear_dim=129,
                  r=1, downsample_step=4, n_speakers=1, speaker_embed_dim=16,
                  dropout=0.05, kernel_size=3, encoder_channels=32,
                  decoder_channels=32, converter_channels=32,
                  use_memory_mask=True, force_monotonic_attention=True,
                  max_positions=128)
    ref = ref_builder.nyanko(**kwargs).eval()
    cfg = jx_builder.nyanko(**kwargs)
    params = jax.tree.map(jnp.asarray, import_state_dict(_state_dict_np(ref),
                                                         cfg))

    x, mel, tp, fp, lengths, _ = _make_inputs(T_dec=12, r=1)

    with torch.no_grad():
        mel_t, align_t, done_t, dec_states = ref.seq2seq(
            torch.from_numpy(x), torch.from_numpy(mel), None,
            torch.from_numpy(tp), torch.from_numpy(fp),
            torch.from_numpy(lengths))
        B = x.shape[0]
        mel_t = mel_t.reshape(B, -1, 80)
        lin_t = ref.postnet(mel_t, None)

    with strict_numerics():
        mel_j, lin_j, align_j, done_j = jx_builder.model_forward(
            params, cfg, jnp.asarray(x), jnp.asarray(mel),
            text_positions=jnp.asarray(tp), frame_positions=jnp.asarray(fp),
            input_lengths=jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(mel_j), mel_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(done_j), done_t.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(align_j), align_t.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(lin_j), lin_t.numpy(), atol=ATOL)


@pytest.mark.parametrize("builder_name", ["deepvoice3", "nyanko"])
def test_offline_equals_online_decoder(builder_name):
    """Teacher-forced offline forward ≡ incremental (scan) decode — the
    reference's strongest invariant (tests/test_deepvoice3.py:182-231)."""
    if builder_name == "nyanko":
        cfg = jx_builder.nyanko(n_vocab=149, embed_dim=32,
                                encoder_channels=32, decoder_channels=32,
                                converter_channels=32, linear_dim=129,
                                dropout=0.0, max_positions=128,
                                force_monotonic_attention=False)
        r = 1
    else:
        cfg = jx_builder.deepvoice3(n_vocab=149, embed_dim=64,
                                    encoder_channels=32, decoder_channels=32,
                                    converter_channels=32, linear_dim=129,
                                    r=4, dropout=0.0, max_positions=128,
                                    force_monotonic_attention=False)
        r = 4
    params = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    fam = cfg.family

    B, T_text, T_dec = 2, 18, 10
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randint(1, 149, (B, T_text)))
    mel = jnp.asarray(rs.rand(B, T_dec * r, 80).astype(np.float32))
    tp = jnp.asarray(np.tile(np.arange(1, T_text + 1), (B, 1)))
    fp = jnp.asarray(np.tile(np.arange(1, T_dec + 1), (B, 1)))

    encoder_out = fam.encoder_apply(params["encoder"], cfg.encoder, x)
    off_out, off_align, off_done, off_states = fam.decoder_apply(
        params["decoder"], cfg.decoder, encoder_out, mel,
        text_positions=tp, frame_positions=fp)

    grouped = mel.reshape(B, T_dec, 80 * r)
    on = fam.decoder_decode(params["decoder"], cfg.decoder, encoder_out, tp,
                            test_inputs=grouped)

    np.testing.assert_allclose(np.asarray(on.outputs), np.asarray(off_out),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(on.decoder_states),
                               np.asarray(off_states), atol=1e-5)
    np.testing.assert_allclose(np.asarray(on.done),
                               np.asarray(off_done[..., 0]), atol=1e-5)


def test_incremental_decode_parity_vs_reference():
    """Greedy incremental decode vs reference incremental_forward, B=1,
    shared weights, monotonic attention on."""
    torch.manual_seed(0)
    kwargs = _common_kwargs()
    ref = ref_builder.deepvoice3(**kwargs).eval()
    cfg = jx_builder.deepvoice3(**kwargs)
    params = jax.tree.map(jnp.asarray, import_state_dict(_state_dict_np(ref),
                                                         cfg))

    T_text = 15
    rs = np.random.RandomState(5)
    x = rs.randint(1, 149, (1, T_text)).astype(np.int64)
    tp = np.arange(1, T_text + 1)[None].astype(np.int64)
    max_steps = 20

    ref.seq2seq.decoder.max_decoder_steps = max_steps
    with torch.no_grad():
        enc_out = ref.seq2seq.encoder(torch.from_numpy(x))
        out_t, align_t, done_t, states_t = \
            ref.seq2seq.decoder.incremental_forward(
                enc_out, torch.from_numpy(tp))
    T_ref = out_t.shape[1]

    fam = cfg.family
    with strict_numerics():
        enc_j = fam.encoder_apply(params["encoder"], cfg.encoder,
                                  jnp.asarray(x))
        on = fam.decoder_decode(params["decoder"], cfg.decoder, enc_j,
                                jnp.asarray(tp), max_decoder_steps=max_steps)
    n = int(on.lengths[0])
    # decoded length must agree with the reference (±1: the reference loop
    # breaks AFTER emitting the done-crossing frame, deepvoice3.py:469-473)
    assert abs(n - T_ref) <= 1, (n, T_ref)
    m = min(T_ref, n)
    np.testing.assert_allclose(np.asarray(on.outputs[:, :m]),
                               out_t.numpy()[:, :m], atol=ATOL)
    np.testing.assert_allclose(np.asarray(on.decoder_states[:, :m]),
                               states_t.numpy()[:, :m], atol=ATOL)


def test_incremental_decode_parity_batched_vs_reference():
    """Batched (B=2) greedy decode with per-item monotonic attention windows
    vs the reference's B=1 incremental_forward run item by item.

    The reference's incremental decoder is effectively single-batch — its
    `last_attended` is a Python scalar (reference deepvoice3.py:388-390,
    444-445) — so batched monotonic windowing is new design work here
    (SURVEY.md hard parts): each batch item must carry its own window
    trajectory. Parity is item-wise against independent reference runs on
    the same rows, including decoded-length agreement (±1)."""
    torch.manual_seed(0)
    kwargs = _common_kwargs()
    ref = ref_builder.deepvoice3(**kwargs).eval()
    cfg = jx_builder.deepvoice3(**kwargs)
    params = jax.tree.map(jnp.asarray, import_state_dict(_state_dict_np(ref),
                                                         cfg))

    B, T_text = 2, 15
    rs = np.random.RandomState(11)
    x = rs.randint(1, 149, (B, T_text)).astype(np.int64)
    tp = np.tile(np.arange(1, T_text + 1), (B, 1)).astype(np.int64)
    max_steps = 20
    ref.seq2seq.decoder.max_decoder_steps = max_steps

    fam = cfg.family
    with strict_numerics():
        enc_j = fam.encoder_apply(params["encoder"], cfg.encoder,
                                  jnp.asarray(x))
        on = fam.decoder_decode(params["decoder"], cfg.decoder, enc_j,
                                jnp.asarray(tp), max_decoder_steps=max_steps)

    for i in range(B):
        with torch.no_grad():
            # the reference decoder keeps ring buffers across calls; clear
            # them per item (reference deepvoice3.py:280-284)
            ref.seq2seq.decoder.start_fresh_sequence()
            enc_out = ref.seq2seq.encoder(torch.from_numpy(x[i:i + 1]))
            out_t, align_t, done_t, states_t = \
                ref.seq2seq.decoder.incremental_forward(
                    enc_out, torch.from_numpy(tp[i:i + 1]))
        T_ref = out_t.shape[1]
        n = int(on.lengths[i])
        assert abs(n - T_ref) <= 1, (i, n, T_ref)
        m = min(T_ref, n)
        np.testing.assert_allclose(np.asarray(on.outputs[i, :m]),
                                   out_t.numpy()[0, :m], atol=ATOL)
        np.testing.assert_allclose(np.asarray(on.decoder_states[i, :m]),
                                   states_t.numpy()[0, :m], atol=ATOL)
        # NOTE: averaged alignments are deliberately NOT compared — the
        # reference's incremental path accumulates
        # `ave_alignment + ave_alignment` (reference deepvoice3.py:449),
        # doubling the first attention layer instead of summing layers, so
        # its "average" is just layer 0. Ours is the true mean. Per-layer
        # alignment parity is covered by test_deepvoice3_forward_parity.


def test_decode_scan_equals_while():
    cfg = jx_builder.deepvoice3(n_vocab=149, embed_dim=64,
                                encoder_channels=32, decoder_channels=32,
                                converter_channels=32, linear_dim=129,
                                r=4, dropout=0.0, max_positions=128)
    params = jx_builder.model_init(jax.random.PRNGKey(1), cfg)
    fam = cfg.family
    B, T_text = 2, 16
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randint(1, 149, (B, T_text)))
    tp = jnp.asarray(np.tile(np.arange(1, T_text + 1), (B, 1)))
    enc = fam.encoder_apply(params["encoder"], cfg.encoder, x)
    a = fam.decoder_decode(params["decoder"], cfg.decoder, enc, tp,
                           max_decoder_steps=15, early_exit=False)
    b = fam.decoder_decode(params["decoder"], cfg.decoder, enc, tp,
                           max_decoder_steps=15, early_exit=True)
    n = int(b.num_steps)
    np.testing.assert_allclose(np.asarray(a.outputs[:, :n]),
                               np.asarray(b.outputs[:, :n]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.lengths), np.asarray(b.lengths))


def test_synthesize_deterministic():
    """Two synthesis calls give identical outputs (reference issue38 test)."""
    cfg = jx_builder.deepvoice3(n_vocab=149, embed_dim=64,
                                encoder_channels=32, decoder_channels=32,
                                converter_channels=32, linear_dim=129,
                                r=4, dropout=0.0, max_positions=128)
    params = jx_builder.model_init(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(np.random.RandomState(0).randint(1, 149, (1, 12)))
    tp = jnp.asarray(np.arange(1, 13)[None])
    out1 = jx_builder.model_synthesize(params, cfg, x, tp,
                                       max_decoder_steps=12)
    out2 = jx_builder.model_synthesize(params, cfg, x, tp,
                                       max_decoder_steps=12)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
