# coding: utf-8
"""convert_checkpoint.py: a real torch .pth from the reference loads here
and produces identical forward outputs (checkpoint migration contract)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from reference_util import import_reference  # noqa: E402

import_reference()
from deepvoice3_pytorch import builder as ref_builder  # noqa: E402

from deepvoice3_pytorch_tpu import builder as jx_builder  # noqa: E402
from deepvoice3_pytorch_tpu.training import checkpoint as ckpt  # noqa: E402
import convert_checkpoint  # noqa: E402


def test_convert_reference_pth_roundtrip(tmp_path):
    kwargs = dict(n_vocab=149, embed_dim=64, mel_dim=80, linear_dim=129,
                  r=4, downsample_step=1, n_speakers=1,
                  speaker_embed_dim=16, dropout=0.05, kernel_size=5,
                  encoder_channels=64, decoder_channels=64,
                  converter_channels=32, use_memory_mask=True,
                  force_monotonic_attention=True, max_positions=128)
    torch.manual_seed(0)
    ref = ref_builder.deepvoice3(**kwargs).eval()

    # save exactly like the reference does (train.py:803-808)
    pth = tmp_path / "checkpoint_step000012345.pth"
    torch.save({
        "state_dict": ref.state_dict(),
        "optimizer": None,
        "global_step": 12345,
        "global_epoch": 7,
    }, str(pth))

    cfg = jx_builder.deepvoice3(**kwargs)
    out = tmp_path / "converted.ckpt"
    params, step = convert_checkpoint.convert(str(pth), str(out), cfg)
    assert step == 12345

    # reload through the normal checkpoint path
    template = jx_builder.model_init(jax.random.PRNGKey(0), cfg)
    loaded, _, step2, epoch2 = ckpt.load_checkpoint(str(out), template,
                                                    reset_optimizer=True)
    assert step2 == 12345 and epoch2 == 7

    # forward parity vs the torch model through the converted weights
    rs = np.random.RandomState(0)
    B, T_text, T_dec = 2, 16, 8
    x = rs.randint(1, 149, (B, T_text)).astype(np.int64)
    mel = rs.rand(B, T_dec * 4, 80).astype(np.float32)
    tp = np.tile(np.arange(1, T_text + 1), (B, 1)).astype(np.int64)
    fp = np.tile(np.arange(1, T_dec + 1), (B, 1)).astype(np.int64)
    lengths = np.array([T_text, T_text - 3]).astype(np.int64)

    with torch.no_grad():
        mel_t, align_t, done_t, dec_states = ref.seq2seq(
            torch.from_numpy(x), torch.from_numpy(mel), None,
            torch.from_numpy(tp), torch.from_numpy(fp),
            torch.from_numpy(lengths))

    mel_j, _, _, done_j = jx_builder.model_forward(
        jax.tree.map(jnp.asarray, loaded), cfg, jnp.asarray(x),
        jnp.asarray(mel), text_positions=jnp.asarray(tp),
        frame_positions=jnp.asarray(fp), input_lengths=jnp.asarray(lengths))

    np.testing.assert_allclose(np.asarray(mel_j).reshape(mel_t.shape),
                               mel_t.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(done_j), done_t.numpy(), atol=1e-5)


def test_migrated_checkpoint_tts_end_to_end(tmp_path):
    """The full migration story: a reference .pth, converted, drives this
    framework's tts() and matches the reference's own inference-path
    outputs on the same text — mel/linear spectrograms (atol 1e-4 class on
    normalized values) and decoded length (±1; the reference loop breaks
    after emitting the done-crossing frame, reference deepvoice3.py:469-473,
    synthesis.py:42-73)."""
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu import synthesis as jx_synth
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    import convert_checkpoint

    kwargs = dict(n_vocab=en.n_vocab, embed_dim=64, mel_dim=80,
                  linear_dim=129, r=4, downsample_step=1, n_speakers=1,
                  speaker_embed_dim=16, dropout=0.05, kernel_size=5,
                  encoder_channels=64, decoder_channels=64,
                  converter_channels=32, use_memory_mask=True,
                  force_monotonic_attention=True, max_positions=128)
    torch.manual_seed(7)
    ref = ref_builder.deepvoice3(**kwargs).eval()
    pth = tmp_path / "checkpoint_step000000777.pth"
    torch.save({"state_dict": ref.state_dict(), "optimizer": None,
                "global_step": 777, "global_epoch": 1}, str(pth))

    cfg = jx_builder.deepvoice3(**kwargs)
    params, _ = convert_checkpoint.convert(
        str(pth), str(tmp_path / "converted.ckpt"), cfg)
    params = jax.tree.map(jnp.asarray, params)

    text = "hello world."
    max_steps = 30
    seq = np.asarray(en.text_to_sequence(text, p=0.0), np.int64)[None]
    tp = np.arange(1, seq.shape[1] + 1)[None].astype(np.int64)

    # reference inference path (synthesis.py:42-73 body: seq2seq inference
    # mode + postnet; audio inversion compared separately via DSP goldens)
    ref.seq2seq.decoder.max_decoder_steps = max_steps
    with torch.no_grad():
        mel_t, align_t, done_t, dec_states = ref.seq2seq(
            torch.from_numpy(seq), None, None, torch.from_numpy(tp),
            None, None)
        B = 1
        mel_t = mel_t.reshape(B, -1, 80)
        postnet_in = dec_states.reshape(B, mel_t.shape[1], -1)
        lin_t = ref.postnet(postnet_in, None)
    T_ref = mel_t.shape[1]

    # this framework's full tts path on the converted checkpoint
    class _HP:
        sample_rate = 22050
        fft_size = 256
        hop_size = 64
        num_mels = 80
        fmin = 125
        fmax = 7600
        preemphasis = 0.97
        min_level_db = -100
        ref_level_db = 20
        power = 1.4
        griffin_lim_iters = 4
        rescaling = False
        allow_clipping_in_normalization = True

    ap = AudioProcessor(_HP())
    out = jx_synth.tts_batch(params, cfg, ap, en, [text], p=0.0,
                             max_decoder_steps=max_steps, early_exit=True,
                             pad_to=1, fused=False)[0]

    n_dec = out["num_decoder_steps"]
    n_mel = n_dec * cfg.r
    assert abs(n_mel - T_ref) <= cfg.r, (n_mel, T_ref)

    m = min(n_mel, T_ref)
    # tts returns denormalized spectrograms (reference tts does the same);
    # compare in normalized units (denormalized span is 100 dB)
    mel_ours = out["mel"][:m] / 100.0
    mel_ref = np.asarray(ap._denormalize(mel_t.numpy()[0, :m])) / 100.0
    np.testing.assert_allclose(mel_ours, mel_ref, atol=5e-4)

    # the converter is non-causal, so rows near the (±r differing) tail see
    # different context; compare outside its receptive field
    m_lin = m - 16
    lin_ours = out["linear"][:m_lin] / 100.0
    lin_ref = np.asarray(ap._denormalize(lin_t.numpy()[0, :m_lin])) / 100.0
    np.testing.assert_allclose(lin_ours, lin_ref, atol=5e-4)

    assert out["waveform"].ndim == 1 and np.isfinite(out["waveform"]).all()
