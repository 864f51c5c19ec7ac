# coding: utf-8
"""Streaming synthesis: exactness of the windowed converter and decode
stream, the IIR carry, and the quality of windowed+crossfaded Griffin-Lim
vs the whole-utterance vocoder."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from deepvoice3_pytorch_tpu import streaming
from deepvoice3_pytorch_tpu.dsp import stft as dsp
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.frontend import en
from deepvoice3_pytorch_tpu.hparams import default_hparams
from deepvoice3_pytorch_tpu.model_builder import build_model

DATA = os.path.join(os.path.dirname(__file__), "data")

TEXTS = ["this is the first streaming test sentence.",
         "a second one, a little longer than the first one was.",
         "short third."]


def _tiny_setup(preset_overrides=""):
    hp = default_hparams()
    hp.parse("text_embed_dim=64,encoder_channels=32,decoder_channels=32,"
             "converter_channels=32,outputs_per_step=4,downsample_step=1,"
             "max_decoder_steps=48" +
             ("," + preset_overrides if preset_overrides else ""))
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    return hp, cfg, params, ap


def test_inv_preemphasis_carry_exact():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 1000).astype(np.float32))
    full = np.asarray(dsp.inv_preemphasis(x, 0.97))
    y0 = jnp.zeros((2,), jnp.float32)
    outs = []
    for lo, hi in ((0, 300), (300, 301), (301, 1000)):
        y, y0 = dsp.inv_preemphasis_carry(x[:, lo:hi], 0.97, y0)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full,
                               rtol=1e-5, atol=1e-5)


def test_converter_context_windows_exact():
    """Every emitted frame of a windowed converter application equals the
    full-sequence output — the exactness contract converter_context
    promises (left/right receptive field + margin)."""
    from deepvoice3_pytorch_tpu.builder import model_postnet

    hp, cfg, params, ap = _tiny_setup()
    ctx_l, ctx_r = streaming.converter_context(cfg.converter)
    up = getattr(cfg.converter, "time_upsampling", 1)
    rs = np.random.RandomState(1)
    B, M = 2, 64
    X = jnp.asarray(rs.rand(B, M, cfg.converter.in_dim).astype(np.float32))
    full = np.asarray(model_postnet(params, cfg, X))

    # emit [s, e) from window [ws, we): s >= ws+ctx_l unless ws is the true
    # start; e <= we-ctx_r unless we is the true end (M=64)
    for ws, we, s, e in ((0, 40, 0, 40 - ctx_r), (8, 48, 8 + ctx_l, 48 - ctx_r),
                         (24, 64, 24 + ctx_l, 64)):
        win = np.asarray(model_postnet(params, cfg, X[:, ws:we]))
        np.testing.assert_allclose(
            win[:, (s - ws) * up:(e - ws) * up],
            full[:, s * up:e * up], rtol=2e-4, atol=2e-5,
            err_msg="window [%d,%d) emit [%d,%d)" % (ws, we, s, e))


def test_stream_matches_batch_pipeline():
    """Streamed emissions must reproduce the batch pipeline exactly up to
    the vocoder: decoder chunk-carry handoff + windowed converter give
    linear frames equal to one full decode + one full converter pass; the
    audio length and per-sample decoded lengths must agree too."""
    from deepvoice3_pytorch_tpu.builder import model_decode, model_postnet

    hp, cfg, params, ap = _tiny_setup()
    gen = streaming.tts_stream(params, cfg, ap, en, TEXTS,
                               max_decoder_steps=24, first_chunk=8,
                               chunk=8, gl_context=8, emit_linear=True)
    chunks = list(gen)
    assert chunks[-1]["final"]
    dec_len = chunks[-1]["decoded_steps"]
    assert dec_len is not None and dec_len.shape == (len(TEXTS),)

    lin_stream = np.concatenate([c["linear"] for c in chunks], axis=1)
    audio = np.concatenate([c["audio"] for c in chunks], axis=1)

    # reference pipeline at the same decoded extent
    from deepvoice3_pytorch_tpu.synthesis import _prepare_batch
    x, pos, lengths = _prepare_batch(en, TEXTS, 0.0, 8)
    n_dec = lin_stream.shape[1] // (cfg.r * getattr(
        cfg.converter, "time_upsampling", 1))
    mel, pin, align, done, lens = model_decode(
        params, cfg, jnp.asarray(x), jnp.asarray(pos),
        input_lengths=jnp.asarray(lengths), max_decoder_steps=n_dec,
        early_exit=False, fused=True)
    lin_full = np.asarray(model_postnet(params, cfg, pin))

    assert lin_stream.shape == lin_full.shape
    np.testing.assert_allclose(lin_stream, lin_full, rtol=2e-4, atol=2e-4)
    # decoded lengths follow the decode_while rule over the same frames
    np.testing.assert_array_equal(
        dec_len, np.asarray(lens).astype(np.int32))
    # contiguous audio covering every emitted linear frame
    assert audio.shape == (len(TEXTS), lin_stream.shape[1] * ap.hop_size)
    starts = [c["sample_start"] for c in chunks]
    sizes = [c["audio"].shape[1] for c in chunks]
    assert starts == list(np.cumsum([0] + sizes[:-1]))
    assert np.isfinite(audio).all()


def test_stream_nyanko():
    """Second model family through the stream: nyanko's highway stacks,
    non-raw position table (fpe_raw=False), and its converter's receptive
    field all flow through the chunked launches; streamed linear frames
    equal one full decode + converter pass."""
    from deepvoice3_pytorch_tpu.builder import model_decode, model_postnet
    from deepvoice3_pytorch_tpu.synthesis import _prepare_batch

    hp = default_hparams()
    hp.parse("builder=nyanko,text_embed_dim=64,encoder_channels=32,"
             "decoder_channels=32,converter_channels=32,outputs_per_step=1,"
             "downsample_step=4,max_decoder_steps=48")
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)

    gen = streaming.tts_stream(params, cfg, ap, en, TEXTS[:2],
                               max_decoder_steps=32, first_chunk=16,
                               chunk=16, gl_context=8, emit_linear=True)
    chunks = list(gen)
    assert chunks[-1]["final"]
    lin_stream = np.concatenate([c["linear"] for c in chunks], axis=1)
    audio = np.concatenate([c["audio"] for c in chunks], axis=1)

    x, pos, lengths = _prepare_batch(en, TEXTS[:2], 0.0, 8)
    up = getattr(cfg.converter, "time_upsampling", 1)
    n_dec = lin_stream.shape[1] // (cfg.r * up)
    mel, pin, align, done, lens = model_decode(
        params, cfg, jnp.asarray(x), jnp.asarray(pos),
        input_lengths=jnp.asarray(lengths), max_decoder_steps=n_dec,
        early_exit=False, fused=True)
    lin_full = np.asarray(model_postnet(params, cfg, pin))
    assert lin_stream.shape == lin_full.shape
    np.testing.assert_allclose(lin_stream, lin_full, rtol=2e-4, atol=2e-4)
    assert audio.shape == (2, lin_stream.shape[1] * ap.hop_size)
    assert np.isfinite(audio).all()


def test_stream_multispeaker():
    """Speaker-conditioned streaming: per-sample position rates and GLU
    speaker biases flow through the chunked launches."""
    hp, cfg, params, ap = _tiny_setup(
        "n_speakers=4,speaker_embed_dim=16")
    gen = streaming.tts_stream(params, cfg, ap, en, TEXTS[:2],
                               speaker_ids=[1, 3], max_decoder_steps=16,
                               first_chunk=8, chunk=8, gl_context=8)
    chunks = list(gen)
    assert chunks[-1]["final"]
    audio = np.concatenate([c["audio"] for c in chunks], axis=1)
    assert audio.shape[0] == 2 and np.isfinite(audio).all()


def test_synthesis_cli_stream(tmp_path):
    """synthesis.py --stream writes per-utterance wavs from the streaming
    pipeline and prints the first-chunk latency."""
    import subprocess
    import sys
    from os.path import join, dirname

    from deepvoice3_pytorch_tpu.training import checkpoint as ckpt

    REPO = dirname(dirname(os.path.abspath(__file__)))
    hp_str = ("text_embed_dim=32,encoder_channels=32,decoder_channels=32,"
              "converter_channels=32,fft_size=256,hop_size=64,"
              "max_decoder_steps=24,griffin_lim_iters=2,max_positions=128")
    hp = default_hparams()
    hp.parse(hp_str)
    cfg, params = build_model(hp, en.n_vocab)
    ck = tmp_path / "checkpoint_step000000010.npz"
    ckpt.save_checkpoint_file(str(ck), params, None, 10, 1)
    text_list = tmp_path / "sentences.txt"
    text_list.write_text("hello world.\nanother test.\n")
    dst = tmp_path / "out"

    r = subprocess.run(
        [sys.executable, join(REPO, "synthesis.py"), str(ck),
         str(text_list), str(dst), "--hparams=" + hp_str,
         "--max-decoder-steps=24", "--batch-size=2", "--stream"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr
    assert "first audio after" in r.stdout
    wavs = sorted(p for p in os.listdir(dst) if p.endswith(".wav"))
    assert len(wavs) == 2
    pngs = [p for p in os.listdir(dst) if p.endswith("_alignment.png")]
    assert len(pngs) == 2       # alignments arrive with the final chunk


def test_serve_http_streaming():
    """serve.py: chunked-WAV streaming endpoint over the tiny model —
    header + PCM arrive incrementally, /healthz responds, bad requests
    get JSON errors."""
    import struct
    import threading
    import urllib.request
    import urllib.error
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    hp, cfg, params, ap = _tiny_setup()
    engine = serve_mod.TTSEngine(params, cfg, ap, en, max_decoder_steps=24)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve_mod.make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                "http://127.0.0.1:%d/healthz" % port, timeout=300) as r:
            assert r.read() == b"ok"

        url = ("http://127.0.0.1:%d/tts?text=hello%%20streaming%%20world."
               % port)
        with urllib.request.urlopen(url, timeout=600) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            body = r.read()          # urllib de-chunks transparently
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        sr = struct.unpack("<I", body[24:28])[0]
        assert sr == ap.sample_rate
        pcm = np.frombuffer(body[44:], "<i2")
        assert len(pcm) > ap.hop_size        # real audio came through
        assert np.abs(pcm).max() <= 32767

        try:
            urllib.request.urlopen("http://127.0.0.1:%d/tts" % port,
                                   timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_streaming_vocoder_xfade_zero():
    """xfade=0 (crossfade disabled) must emit every sample exactly once —
    the negative-slice idiom previously withheld the whole window."""
    hp, cfg, params, ap = _tiny_setup()
    rs = np.random.RandomState(0)
    spec = jnp.asarray(rs.rand(2, 24, hp.fft_size // 2 + 1)
                       .astype(np.float32))
    voc = streaming.StreamingVocoder(ap, gl_context=8, gl_lookahead=0,
                                     xfade=0)
    parts = [voc.push(spec[:, :10]), voc.push(spec[:, 10:])]
    tail = voc.flush()
    if tail is not None:
        parts.append(tail)
    audio = np.concatenate(parts, axis=1)
    assert audio.shape == (2, 24 * ap.hop_size)
    assert np.isfinite(audio).all()


def test_streaming_vocoder_quality_vs_whole():
    """Windowed phase-coherent GL on the golden fixture: the streamed
    waveform's spectral convergence must stay within 5% of the
    whole-utterance vocoder's on the same magnitudes AND under the
    absolute bar that gates the production vocoder (the streaming windows
    run 32 iterations, so in practice the stream comes out *better* than
    the batch default — measured 0.1372 vs 0.1442)."""
    from deepvoice3_pytorch_tpu.dsp import reference_model as ref

    lin = np.load(os.path.join(DATA, "dsp_golden_linear.npy"))

    class HP:
        sample_rate = 22050
        fft_size = 1024
        hop_size = 256
        num_mels = 80
        fmin = 125
        fmax = 7600
        preemphasis = 0.97
        min_level_db = -100
        ref_level_db = 20
        power = 1.4
        griffin_lim_iters = 16
        griffin_lim_phase_init = "spsi"
        rescaling = False
        allow_clipping_in_normalization = True

    hp = HP()
    ap = AudioProcessor(hp)

    def sc(wav):
        e = ref._preemphasis(np.asarray(wav, np.float64), hp.preemphasis)
        db = np.clip(lin, 0, 1) * -hp.min_level_db + hp.min_level_db
        S = np.power(10.0, (db + hp.ref_level_db) * 0.05) ** hp.power
        return ref.spectral_convergence(e, S.T, hp.fft_size, hp.hop_size)

    lin_nf = lin.T                       # fixture is reference (F, n) layout
    whole = np.asarray(ap.inv_spectrogram_batch(lin_nf[None]))[0]
    sc_whole = sc(whole)

    voc = streaming.StreamingVocoder(ap, gl_context=16)
    spec = jnp.asarray(lin_nf[None].astype(np.float32))
    n = lin_nf.shape[0]
    cuts = [0, n // 3, 2 * n // 3, n]
    parts = [voc.push(spec[:, cuts[i]:cuts[i + 1]]) for i in range(3)]
    parts.append(voc.flush())
    streamed = np.concatenate(parts, axis=1)[0]

    assert streamed.shape == whole.shape
    sc_streamed = sc(streamed)
    assert sc_streamed < 0.15, sc_streamed            # absolute bar
    assert sc_streamed <= sc_whole * 1.05, (sc_streamed, sc_whole)


def test_stream_vmem_subbatch_fallback(monkeypatch):
    """Graceful degradation: when the fused decode's working set exceeds
    the VMEM budget, tts_stream splits the decode into sub-batches instead
    of refusing to stream — and the audio is identical to the unsplit run
    (decode rows are per-sample independent)."""
    from deepvoice3_pytorch_tpu.ops import fused_decode as fd

    hp, cfg, params, ap = _tiny_setup()
    kw = dict(max_decoder_steps=24, first_chunk=8, chunk=8, gl_context=8,
              emit_linear=True)

    whole = list(streaming.tts_stream(params, cfg, ap, en, TEXTS, **kw))

    # budget between the 1-sample and full-batch working sets: forces
    # sub-batches of one sample each
    from deepvoice3_pytorch_tpu.synthesis import _prepare_batch
    x, _, _ = _prepare_batch(en, TEXTS, 0.0, 8)
    est1 = fd.vmem_bytes_estimate(params["decoder"], cfg.decoder, 1,
                                  x.shape[1])
    est_full = fd.vmem_bytes_estimate(params["decoder"], cfg.decoder,
                                      len(TEXTS), x.shape[1])
    assert est1 < est_full
    monkeypatch.setattr(fd, "VMEM_BUDGET_BYTES", (est1 + est_full) // 2)
    split = list(streaming.tts_stream(params, cfg, ap, en, TEXTS, **kw))

    assert len(split) == len(whole)
    np.testing.assert_array_equal(split[-1]["decoded_steps"],
                                  whole[-1]["decoded_steps"])
    # pre-vocoder: sub-batched decode + converter must match tightly
    l_whole = np.concatenate([c["linear"] for c in whole], axis=1)
    l_split = np.concatenate([c["linear"] for c in split], axis=1)
    np.testing.assert_allclose(l_split, l_whole, rtol=2e-4, atol=2e-5)
    # audio: Griffin-Lim amplifies batch-1-vs-batch-N matmul ulp
    # differences over its iterations — close, not bitwise (same bar as
    # the continuous-batching equivalence tests)
    a_whole = np.concatenate([c["audio"] for c in whole], axis=1)
    a_split = np.concatenate([c["audio"] for c in split], axis=1)
    assert a_split.shape == a_whole.shape
    scale = max(np.abs(a_whole).max(), 1e-6)
    assert np.abs(a_split - a_whole).max() <= 0.05 * scale


def test_gl_pallas_vmem_fallback(monkeypatch):
    """When the Pallas GL window can't fit the device VMEM budget, the
    vocoder silently takes the XLA-scan path — producing audio — instead
    of failing with a Mosaic budget error."""
    from deepvoice3_pytorch_tpu.dsp import gl_pallas

    hp, _, _, _ = _tiny_setup()
    rs = np.random.RandomState(0)
    spec = rs.rand(2, 24, hp.fft_size // 2 + 1).astype(np.float32)

    ref_ap = AudioProcessor(hp)
    ref = np.asarray(ref_ap.inv_spectrogram_batch(spec))

    # force the pallas branch on (interpret mode off-TPU) but make the
    # budget tiny: fits_vmem must reject and fall back to the XLA scan
    monkeypatch.setenv("DV3_PALLAS_GL", "1")
    monkeypatch.setattr(gl_pallas, "_device_vmem_budget", lambda: 1024)
    ap = AudioProcessor(hp)
    out = np.asarray(ap.inv_spectrogram_batch(spec))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
