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
