# coding: utf-8
"""Fused Pallas decoder (ops/fused_decode.py) ≡ scan decoder
(models/decode.py) — the whole-loop kernel must reproduce the reference
decode semantics exactly (same contract the reference tests hold between
batch and incremental paths, reference tests/test_deepvoice3.py:182-231)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu import builder as b
from deepvoice3_pytorch_tpu.builder import model_synthesize


def _tiny(n_speakers=1, **kw):
    kwargs = dict(n_vocab=149, embed_dim=64, mel_dim=16, linear_dim=65,
                  r=2, downsample_step=1, dropout=0.05, kernel_size=3,
                  encoder_channels=32, decoder_channels=32,
                  converter_channels=32, use_memory_mask=True,
                  key_projection=True, value_projection=True,
                  max_positions=64, force_monotonic_attention=True)
    kwargs.update(kw)
    cfg = b.deepvoice3(**kwargs)
    params = b.model_init(jax.random.PRNGKey(42), cfg)
    return cfg, params


def _inputs(B=3, T_text=12):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randint(1, 149, (B, T_text)), jnp.int32)
    pos = jnp.asarray(np.tile(np.arange(1, T_text + 1), (B, 1)), jnp.int32)
    lengths = jnp.asarray([T_text, T_text - 3, T_text - 5], jnp.int32)
    return x, pos, lengths


@pytest.mark.parametrize("monotonic", [True, False])
def test_fused_matches_scan(monotonic):
    cfg, params = _tiny(force_monotonic_attention=monotonic)
    x, pos, lengths = _inputs()
    T = 11

    ref = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=T, early_exit=False)
    got = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=T, early_exit=False, fused=True)

    names = ["mel", "linear", "align", "done", "lengths"]
    for name, a, c in zip(names, ref, got):
        a, c = np.asarray(a, np.float64), np.asarray(c, np.float64)
        assert a.shape == c.shape, (name, a.shape, c.shape)
        assert np.abs(a - c).max() < 2e-5, (name, np.abs(a - c).max())


def test_fused_matches_scan_no_mask():
    cfg, params = _tiny(use_memory_mask=False)
    x, pos, _ = _inputs()
    T = 7
    ref = model_synthesize(params, cfg, x, pos, max_decoder_steps=T,
                           early_exit=False)
    got = model_synthesize(params, cfg, x, pos, max_decoder_steps=T,
                           early_exit=False, fused=True)
    for a, c in zip(ref, got):
        assert np.abs(np.asarray(a, np.float64)
                      - np.asarray(c, np.float64)).max() < 2e-5


def test_fused_matches_scan_nyanko():
    cfg = b.nyanko(n_vocab=149, embed_dim=32, mel_dim=16, linear_dim=65,
                   r=1, downsample_step=4, kernel_size=3,
                   encoder_channels=32, decoder_channels=32,
                   converter_channels=32, use_memory_mask=True,
                   force_monotonic_attention=True, max_positions=64)
    params = b.model_init(jax.random.PRNGKey(7), cfg)
    x, pos, lengths = _inputs()
    T = 9
    ref = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=T, early_exit=False)
    got = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=T, early_exit=False, fused=True)
    names = ["mel", "linear", "align", "done", "lengths"]
    for name, a, c in zip(names, ref, got):
        a, c = np.asarray(a, np.float64), np.asarray(c, np.float64)
        assert a.shape == c.shape, (name, a.shape, c.shape)
        assert np.abs(a - c).max() < 2e-5, (name, np.abs(a - c).max())


def test_fused_matches_scan_multispeaker():
    cfg = b.deepvoice3_multispeaker(
        n_vocab=149, embed_dim=64, mel_dim=16, linear_dim=65, r=2,
        downsample_step=1, kernel_size=3, encoder_channels=32,
        decoder_channels=32, converter_channels=32, n_speakers=4,
        speaker_embed_dim=8, use_memory_mask=True, key_projection=True,
        value_projection=True, max_positions=64,
        force_monotonic_attention=True)
    params = b.model_init(jax.random.PRNGKey(3), cfg)
    x, pos, lengths = _inputs()
    spk = jnp.asarray([0, 2, 3], jnp.int32)
    T = 9
    ref = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           speaker_ids=spk, max_decoder_steps=T,
                           early_exit=False)
    got = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           speaker_ids=spk, max_decoder_steps=T,
                           early_exit=False, fused=True)
    names = ["mel", "linear", "align", "done", "lengths"]
    for name, a, c in zip(names, ref, got):
        a, c = np.asarray(a, np.float64), np.asarray(c, np.float64)
        assert a.shape == c.shape, (name, a.shape, c.shape)
        assert np.abs(a - c).max() < 2e-5, (name, np.abs(a - c).max())


@pytest.mark.parametrize("chunk", [4, 5, 32])
def test_fused_chunked_matches_single_launch(chunk, monkeypatch):
    """Chunked early-exit fused decode ≡ single-launch fused decode on the
    frames both compute — the carry (prev frame, last_attended, ring
    buffers) must hand off exactly across kernel launches. chunk=5 makes
    max_steps a non-multiple; chunk=32 collapses to one launch."""
    from deepvoice3_pytorch_tpu.ops import fused_decode as fd

    monkeypatch.setattr(fd, "DEFAULT_CHUNK", chunk)
    cfg, params = _tiny()
    x, pos, lengths = _inputs()
    T = 11

    ref = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=T, early_exit=False, fused=True)
    got = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=T, early_exit=True, fused=True)

    # random-weight done flags may latch mid-decode: compare the frames the
    # chunked path actually computed (whole chunks), plus lengths agreement
    names = ["mel", "linear", "align", "done", "lengths"]
    n_dec = int(np.asarray(got[4]).max())      # latest per-sample length
    r = cfg.r
    time_up = getattr(cfg.converter, "time_upsampling", 1)
    lims = [n_dec * r, n_dec * r * time_up, n_dec, n_dec, None]
    for name, a, c, lim in zip(names, ref, got, lims):
        a, c = np.asarray(a, np.float64), np.asarray(c, np.float64)
        assert a.shape == c.shape, (name, a.shape, c.shape)
        if lim is not None and a.ndim > 1:
            a, c = a[:, :lim], c[:, :lim]
        assert np.abs(a - c).max() < 2e-5, (name, np.abs(a - c).max())


def test_fused_chunked_matches_single_launch_multispeaker(monkeypatch):
    """Chunked carry handoff with the multispeaker extras (per-sample
    w_query position rates + speaker softsign biases) — the configuration
    the VCTK bench row uses."""
    from deepvoice3_pytorch_tpu.ops import fused_decode as fd

    monkeypatch.setattr(fd, "DEFAULT_CHUNK", 4)
    cfg = b.deepvoice3_multispeaker(
        n_vocab=149, embed_dim=64, mel_dim=16, linear_dim=65, r=2,
        downsample_step=1, kernel_size=3, encoder_channels=32,
        decoder_channels=32, converter_channels=32, n_speakers=4,
        speaker_embed_dim=8, use_memory_mask=True, key_projection=True,
        value_projection=True, max_positions=64,
        force_monotonic_attention=True)
    params = b.model_init(jax.random.PRNGKey(3), cfg)
    x, pos, lengths = _inputs()
    spk = jnp.asarray([0, 2, 3], jnp.int32)
    T = 9
    ref = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           speaker_ids=spk, max_decoder_steps=T,
                           early_exit=False, fused=True)
    got = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           speaker_ids=spk, max_decoder_steps=T,
                           early_exit=True, fused=True)
    n_dec = int(np.asarray(got[4]).max())
    time_up = getattr(cfg.converter, "time_upsampling", 1)
    lims = [n_dec * cfg.r, n_dec * cfg.r * time_up, n_dec, n_dec, None]
    for name, a, c, lim in zip(["mel", "linear", "align", "done", "len"],
                               ref, got, lims):
        a, c = np.asarray(a, np.float64), np.asarray(c, np.float64)
        assert a.shape == c.shape, (name, a.shape, c.shape)
        if lim is not None and a.ndim > 1:
            a, c = a[:, :lim], c[:, :lim]
        assert np.abs(a - c).max() < 2e-5, (name, np.abs(a - c).max())


def test_fused_chunked_early_exit_stops(monkeypatch):
    """When every done flag fires early, the chunked loop must stop before
    max_steps (num_steps < max_steps) and zero the tail frames."""
    import jax

    from deepvoice3_pytorch_tpu import builder as b
    from deepvoice3_pytorch_tpu.ops import fused_decode as fd
    from deepvoice3_pytorch_tpu.models import deepvoice3 as dv3

    monkeypatch.setattr(fd, "DEFAULT_CHUNK", 4)
    cfg, params = _tiny(force_monotonic_attention=True)
    # drive the done-FC bias strongly positive so done>0.5 from frame 1
    params["decoder"]["fc"]["b"] = (
        params["decoder"]["fc"]["b"] + 100.0)
    x, pos, lengths = _inputs()
    enc = cfg.family.encoder_apply(params["encoder"], cfg.encoder, x)
    # min_decoder_steps default is >0; use the cfg value
    out = dv3.decoder_decode(params["decoder"], cfg.decoder, enc, pos,
                             lengths=lengths, max_decoder_steps=40,
                             early_exit=True, fused=True)
    n = int(out.num_steps)
    assert n < 40, n
    assert int(np.asarray(out.lengths).max()) <= n
    # frames past the stop chunk stayed zero
    assert np.abs(np.asarray(out.outputs)[:, n:]).max() == 0.0


def test_vmem_estimate_and_fallback():
    from deepvoice3_pytorch_tpu.ops import fused_decode as fd

    cfg, params = _tiny()
    est = fd.vmem_bytes_estimate(params["decoder"], cfg.decoder, 3, 12)
    assert 0 < est < fd.VMEM_BUDGET_BYTES

    # a batch far beyond VMEM must transparently take the scan path and
    # still produce valid output (no Mosaic failure)
    big_B = 4096
    est_big = fd.vmem_bytes_estimate(params["decoder"], cfg.decoder,
                                     big_B, 512)
    assert est_big > fd.VMEM_BUDGET_BYTES

    x, pos, lengths = _inputs()
    out = model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                           max_decoder_steps=4, early_exit=False, fused=True)
    assert np.isfinite(np.asarray(out[0])).all()


def test_fused_under_jit():
    cfg, params = _tiny()
    x, pos, lengths = _inputs()

    @jax.jit
    def run(params, x, pos, lengths):
        return model_synthesize(params, cfg, x, pos, input_lengths=lengths,
                                max_decoder_steps=5, early_exit=False,
                                fused=True)

    out = run(params, x, pos, lengths)
    assert np.isfinite(np.asarray(out[0])).all()
