# coding: utf-8
"""Continuous batching: a slot admitted into a RUNNING batch must produce
the same stream as a fresh single-utterance tts_stream (per-slot position
rows + per-slot carry resets make mid-stream admission exact)."""

import numpy as np

from deepvoice3_pytorch_tpu import serving, streaming
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.frontend import en
from deepvoice3_pytorch_tpu.hparams import default_hparams
from deepvoice3_pytorch_tpu.model_builder import build_model

TEXT_A = "the first serving test sentence."
TEXT_B = "a different second one."
TEXT_C = "and one more."


def _setup():
    hp = default_hparams()
    hp.parse("text_embed_dim=64,encoder_channels=32,decoder_channels=32,"
             "converter_channels=32,outputs_per_step=4,downsample_step=1,"
             "max_decoder_steps=48")
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    return cfg, params, ap


def _drain(q):
    audio, n_dec = [], None
    while True:
        kind, payload = q.get_nowait()
        if kind == "end":
            n_dec = payload
            break
        audio.append(payload)
    return np.concatenate(audio), n_dec


def _fresh_stream(params, cfg, ap, text, *, chunk, max_steps, pad_to,
                  gl_context):
    chunks = list(streaming.tts_stream(
        params, cfg, ap, en, [text], max_decoder_steps=max_steps,
        first_chunk=chunk, chunk=chunk, gl_context=gl_context,
        pad_to=pad_to))
    audio = np.concatenate([c["audio"] for c in chunks], axis=1)[0]
    n_dec = int(chunks[-1]["decoded_steps"][0])
    # the batcher trims its final emission to the decoded length
    up = getattr(cfg.converter, "time_upsampling", 1)
    return audio[:n_dec * cfg.r * up * ap.hop_size], n_dec


def test_mid_stream_admission_matches_fresh_streams():
    cfg, params, ap = _setup()
    CHUNK, MAX, PAD, CTX = 8, 24, 40, 8
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=3, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)

    qa = batcher.submit(TEXT_A)
    assert batcher.step() == 1          # A alone, chunk 1
    qb = batcher.submit(TEXT_B)         # admitted mid-stream (A at chunk 1)
    n = 0
    while batcher.step():
        n += 1
        assert n < 50
    audio_a, dec_a = _drain(qa)
    audio_b, dec_b = _drain(qb)

    ref_a, ref_dec_a = _fresh_stream(params, cfg, ap, TEXT_A, chunk=CHUNK,
                                     max_steps=MAX, pad_to=PAD,
                                     gl_context=CTX)
    ref_b, ref_dec_b = _fresh_stream(params, cfg, ap, TEXT_B, chunk=CHUNK,
                                     max_steps=MAX, pad_to=PAD,
                                     gl_context=CTX)

    assert dec_a == ref_dec_a and dec_b == ref_dec_b
    # the batcher applies the decoded-length trim to every emission after
    # the latch is detected, so streams end EXACTLY at the decoded length
    assert len(audio_a) == len(ref_a) and len(audio_b) == len(ref_b)
    for got, ref in ((audio_a, ref_a), (audio_b, ref_b)):
        # batched rows vs batch-1 matmuls differ in the last ulp;
        # Griffin-Lim amplifies that over its iterations — close, not
        # bitwise
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(got - ref).max() <= 0.05 * scale, \
            np.abs(got - ref).max() / scale


def test_slot_reuse_after_retirement():
    """A retired slot must be reusable with no state leaking from its
    previous occupant."""
    cfg, params, ap = _setup()
    CHUNK, MAX, PAD, CTX = 8, 16, 40, 8
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=1, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)

    qa = batcher.submit(TEXT_A)
    qc = batcher.submit(TEXT_C)         # waits for the single slot
    n = 0
    while batcher.step():
        n += 1
        assert n < 50
    audio_a, dec_a = _drain(qa)
    audio_c, dec_c = _drain(qc)
    ref_c, ref_dec_c = _fresh_stream(params, cfg, ap, TEXT_C, chunk=CHUNK,
                                     max_steps=MAX, pad_to=PAD,
                                     gl_context=CTX)
    assert dec_c == ref_dec_c
    assert len(audio_c) == len(ref_c)
    scale = max(np.abs(ref_c).max(), 1e-6)
    assert np.abs(audio_c - ref_c).max() <= 0.05 * scale
    assert audio_a.shape[0] > 0


def test_multispeaker_admission_matches_fresh_stream():
    """Speaker-conditioned continuous batching: per-slot speaker biases,
    position rates, and speaker embeddings scatter correctly — a slot
    admitted mid-stream with speaker 3 matches a fresh speaker-3 stream."""
    hp = default_hparams()
    hp.parse("text_embed_dim=64,encoder_channels=32,decoder_channels=32,"
             "converter_channels=32,outputs_per_step=4,downsample_step=1,"
             "max_decoder_steps=48,n_speakers=4,speaker_embed_dim=16")
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    CHUNK, MAX, PAD, CTX = 8, 16, 40, 8
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=2, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)

    qa = batcher.submit(TEXT_A, speaker_id=1)
    assert batcher.step() == 1
    qb = batcher.submit(TEXT_B, speaker_id=3)   # mid-stream, other speaker
    n = 0
    while batcher.step():
        n += 1
        assert n < 50
    audio_b, dec_b = _drain(qb)
    _drain(qa)

    chunks = list(streaming.tts_stream(
        params, cfg, ap, en, [TEXT_B], speaker_ids=[3],
        max_decoder_steps=MAX, first_chunk=CHUNK, chunk=CHUNK,
        gl_context=CTX, pad_to=PAD))
    ref = np.concatenate([c["audio"] for c in chunks], axis=1)[0]
    ref_dec = int(chunks[-1]["decoded_steps"][0])
    ref = ref[:streaming.decoded_samples(cfg, ap, ref_dec)]

    assert dec_b == ref_dec
    assert len(audio_b) == len(ref)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(audio_b - ref).max() <= 0.05 * scale


def test_serve_http_slots_concurrent():
    """serve.py --slots: two SIMULTANEOUS requests stream from the same
    slot batch, each getting a complete WAV."""
    import struct
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    cfg, params, ap = _setup()
    engine = serve_mod.TTSEngine(params, cfg, ap, en, max_decoder_steps=24,
                                 slots=2, text_pad=40)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve_mod.make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        results = {}

        def fetch(name, text):
            url = ("http://127.0.0.1:%d/tts?text=%s"
                   % (port, text.replace(" ", "%20")))
            with urllib.request.urlopen(url, timeout=600) as r:
                results[name] = r.read()

        threads = [threading.Thread(target=fetch, args=("a", TEXT_A)),
                   threading.Thread(target=fetch, args=("b", TEXT_B))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {"a", "b"}
        for body in results.values():
            assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
            assert struct.unpack("<I", body[24:28])[0] == ap.sample_rate
            pcm = np.frombuffer(body[44:], "<i2")
            assert len(pcm) > ap.hop_size
    finally:
        engine.shutdown()
        server.shutdown()


def test_serve_http_stats_endpoint():
    """/stats reports request counts, TTFA distribution, audio seconds,
    failures (a policy-rejected speaker_id), and slot backlog fields."""
    import json as json_mod
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    cfg, params, ap = _setup()
    engine = serve_mod.TTSEngine(params, cfg, ap, en, max_decoder_steps=24,
                                 slots=2, text_pad=40)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve_mod.make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = "http://127.0.0.1:%d" % port
        with urllib.request.urlopen(
                base + "/tts?text=stats%20test%20sentence.",
                timeout=600) as r:
            body = r.read()
        assert body[:4] == b"RIFF"
        # speaker_id on a single-speaker model: submit-time policy error
        try:
            urllib.request.urlopen(base + "/tts?text=x&speaker_id=3",
                                   timeout=600).read()
            assert False, "expected HTTP 500"
        except urllib.error.HTTPError as e:
            assert e.code == 500

        with urllib.request.urlopen(base + "/stats", timeout=600) as r:
            s = json_mod.loads(r.read())
        assert s["requests_total"] == 2          # warmup not counted
        assert s["requests_failed"] == 1
        assert s["active_streams"] == 0
        assert s["audio_seconds_total"] > 0
        assert s["ttfa_ms"]["count"] == 1 and s["ttfa_ms"]["p50"] > 0
        assert s["slots"] == 2 and s["backlog"] == 0
        assert s["uptime_s"] >= 0
    finally:
        engine.shutdown()
        server.shutdown()


def test_speaker_policy_enforced_at_submit():
    """Slot arrays are allocated once with or without speaker-bias rows,
    so speaker-ness must be uniform: a multi-speaker model rejects
    speaker_id=None and a single-speaker model rejects speaker_id."""
    import pytest

    cfg, params, ap = _setup()
    b = serving.ContinuousBatcher(params, cfg, ap, en, n_slots=1,
                                  text_pad=40, chunk=8,
                                  max_decoder_steps=16)
    with pytest.raises(ValueError):
        b.submit(TEXT_C, speaker_id=0)       # single-speaker model

    hp = default_hparams()
    hp.parse("text_embed_dim=64,encoder_channels=32,decoder_channels=32,"
             "converter_channels=32,outputs_per_step=4,downsample_step=1,"
             "max_decoder_steps=48,n_speakers=4,speaker_embed_dim=16")
    cfg2, params2 = build_model(hp, en.n_vocab)
    b2 = serving.ContinuousBatcher(params2, cfg2, AudioProcessor(hp), en,
                                   n_slots=1, text_pad=40, chunk=8,
                                   max_decoder_steps=16)
    with pytest.raises(ValueError):
        b2.submit(TEXT_C)                    # multi-speaker model


def test_backlog_admission_control():
    """submit sheds requests once the waiting queue hits max_backlog (no
    worker draining here, so the queue only grows)."""
    import pytest

    cfg, params, ap = _setup()
    b = serving.ContinuousBatcher(params, cfg, ap, en, n_slots=1,
                                  text_pad=40, chunk=8,
                                  max_decoder_steps=16, max_backlog=2)
    b.submit(TEXT_A)
    b.submit(TEXT_B)
    with pytest.raises(serving.BacklogFull):
        b.submit(TEXT_C)


def test_serve_http_backlog_returns_503():
    """A BacklogFull at submit surfaces as HTTP 503 + Retry-After and is
    counted as rejected (not failed) in /stats."""
    import json as json_mod
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    import serve as serve_mod

    cfg, params, ap = _setup()
    engine = serve_mod.TTSEngine(params, cfg, ap, en, max_decoder_steps=24,
                                 slots=2, text_pad=40)

    def full_submit(*a, **kw):
        raise serving.BacklogFull("waiting queue at max_backlog=0")

    engine.batcher.submit = full_submit
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve_mod.make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = "http://127.0.0.1:%d" % port
        try:
            urllib.request.urlopen(base + "/tts?text=x", timeout=600).read()
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"] == "1"
        with urllib.request.urlopen(base + "/stats", timeout=600) as r:
            s = json_mod.loads(r.read())
        assert s["requests_rejected"] == 1
        assert s["requests_failed"] == 0
    finally:
        engine.shutdown()
        server.shutdown()


def test_text_beyond_max_positions_rejected():
    """Bucketed admission accepts any length the model can attend to;
    the model's position table is the only hard cap (reference
    hparams.py:62 max_positions)."""
    cfg, params, ap = _setup()
    batcher = serving.ContinuousBatcher(params, cfg, ap, en, n_slots=1,
                                        text_pad=8, chunk=8,
                                        max_decoder_steps=16)
    try:
        batcher.submit("word " * (cfg.decoder.max_positions + 8))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_nyanko_admission_matches_fresh_stream():
    """The nyanko family (finished-encoding position mode, fpe_raw=False)
    through continuous batching: a slot admitted mid-stream must match a
    fresh nyanko stream — the per-slot position gather reads the encoding
    table rows directly."""
    hp = default_hparams()
    hp.parse("builder=nyanko,text_embed_dim=64,encoder_channels=32,"
             "decoder_channels=32,converter_channels=32,outputs_per_step=1,"
             "downsample_step=4,max_decoder_steps=48")
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    CHUNK, MAX, PAD, CTX = 16, 48, 40, 8
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=2, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)
    # nyanko's deep highway receptive field can bump the chunk; the fresh
    # stream must use the SAME chunk for identical boundaries
    CHUNK = batcher.chunk

    qa = batcher.submit(TEXT_A)
    assert batcher.step() == 1          # A alone, chunk 1
    qb = batcher.submit(TEXT_B)         # admitted mid-stream
    n = 0
    while batcher.step():
        n += 1
        assert n < 50
    audio_b, dec_b = _drain(qb)
    _drain(qa)

    ref_b, ref_dec_b = _fresh_stream(params, cfg, ap, TEXT_B, chunk=CHUNK,
                                     max_steps=MAX, pad_to=PAD,
                                     gl_context=CTX)
    assert dec_b == ref_dec_b
    assert len(audio_b) == len(ref_b)
    scale = max(np.abs(ref_b).max(), 1e-6)
    assert np.abs(audio_b - ref_b).max() <= 0.05 * scale


def test_long_text_grows_bucket_and_matches():
    """Texts longer than text_pad are admitted via bucket growth (one
    recompile), not rejected — and an ACTIVE slot's stream is unaffected
    by a concurrent growth (the grown K/V region is masked out). Only a
    text beyond the model's max_positions is rejected."""
    import pytest

    cfg, params, ap = _setup()
    CHUNK, MAX, PAD, CTX = 8, 24, 16, 8
    long_text = ("this sentence is quite clearly longer than sixteen "
                 "tokens when encoded by the english frontend, "
                 "forcing a slot array growth.")
    assert len(en.text_to_sequence(long_text)) > PAD
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=2, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)

    qa = batcher.submit(TEXT_A)          # short: starting bucket
    assert batcher.step() == 1
    qb = batcher.submit(long_text)       # grows the text bucket mid-serve
    n = 0
    while batcher.step():
        n += 1
        assert n < 50
    audio_a, dec_a = _drain(qa)
    audio_b, dec_b = _drain(qb)

    ref_a, ref_dec_a = _fresh_stream(params, cfg, ap, TEXT_A, chunk=CHUNK,
                                     max_steps=MAX, pad_to=PAD,
                                     gl_context=CTX)
    ref_b, ref_dec_b = _fresh_stream(params, cfg, ap, long_text,
                                     chunk=CHUNK, max_steps=MAX,
                                     pad_to=PAD, gl_context=CTX)
    assert dec_a == ref_dec_a and dec_b == ref_dec_b
    assert len(audio_a) == len(ref_a) and len(audio_b) == len(ref_b)
    for got, ref in ((audio_a, ref_a), (audio_b, ref_b)):
        scale = max(np.abs(ref).max(), 1e-6)
        assert np.abs(got - ref).max() <= 0.05 * scale, \
            np.abs(got - ref).max() / scale

    # the hard cap that remains: the model's position table
    with pytest.raises(ValueError):
        batcher.submit("word " * (cfg.decoder.max_positions + 8))


def test_steady_state_grouped_program_launches():
    """The round-5 engine contract: a steady-state step() is exactly TWO
    device programs — the fused decode (chunk + history roll + local
    positions) and ONE fused converter+vocoder launch shared by every
    slot at the same emission phase — post-decode device programs must
    NOT scale with the number of active slots, and the converter must
    not be a separate launch (the step is dispatch-bound through the
    dev tunnel; round 3 ran 2 + 2*n_slots launches, round 4 ran 4-5)."""
    cfg, params, ap = _setup()
    CHUNK, MAX, PAD, CTX = 8, 24, 40, 8
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=4, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)

    counts = {"emit": 0}
    orig_gl = batcher.emit.dispatch_gl

    def gl_counting(*a, **kw):
        counts["emit"] += 1
        # in-step dispatches carry the fused converter signature — the
        # engine must never fall back to a separate converter program
        assert kw.get("conv") is not None or kw.get("row") or a[3:]
        return orig_gl(*a, **kw)

    batcher.emit.dispatch_gl = gl_counting
    # the separate converter program is gone from the engine entirely
    assert not hasattr(batcher.emit, "_conv_prog")

    # four slots admitted together: identical emission phase throughout
    queues = [batcher.submit(t) for t in
              (TEXT_A, TEXT_B, TEXT_C, "a fourth one to fill the batch.")]
    steps = 0
    while batcher.active_slots() == 4 or steps == 0:
        before = dict(counts)
        n = batcher.step()
        steps += 1
        assert steps < 50
        if n == 4 and batcher.active_slots() == 4:
            # pure steady-state step (no retirement flushes): exactly one
            # fused converter+vocoder dispatch for the whole slot batch
            assert counts["emit"] - before["emit"] == 1, counts
    while batcher.step():
        steps += 1
        assert steps < 80
    assert steps >= 2            # the loop actually exercised steady state
    for q in queues:             # and every stream completed cleanly
        audio, n_dec = _drain(q)
        assert audio.shape[0] > 0 and n_dec > 0

def test_step_accumulator_single_fetch_under_staggered_phases():
    """Round-4 fetch contract: slots admitted at different chunk
    boundaries occupy different vocoder phases, so one step() can
    dispatch SEVERAL GL phase groups — but every in-step emission must
    merge into the persistent (S, m_max) step accumulator ("buf"), so
    the host performs ONE raw fetch per step, not one per group
    (per-group fetches at full slot width were measured as the dominant
    staggered-vs-synchronized gap; see DESIGN.md)."""
    cfg, params, ap = _setup()
    CHUNK, MAX, PAD, CTX = 8, 24, 40, 8
    batcher = serving.ContinuousBatcher(
        params, cfg, ap, en, n_slots=3, text_pad=PAD, chunk=CHUNK,
        max_decoder_steps=MAX, gl_context=CTX)

    stats = {"max_groups": 0, "dev_fetch_groups": 0}
    orig_cj = batcher._complete_jobs

    def counting_cj(jobs, raw_host):
        emitting = [r for _, _, r, _, _, _ in jobs if r is not None]
        stats["max_groups"] = max(stats["max_groups"], len(emitting))
        stats["dev_fetch_groups"] += sum(
            1 for r in emitting if not isinstance(r, str))
        return orig_cj(jobs, raw_host)

    batcher._complete_jobs = counting_cj

    # staggered admission: each slot starts one chunk after the previous,
    # so their emission phases (n_ctx ramp, pend fill) differ per step
    queues = [batcher.submit(TEXT_A)]
    batcher.step()
    queues.append(batcher.submit(TEXT_B))
    batcher.step()
    queues.append(batcher.submit(TEXT_C))
    steps = 2
    while batcher.step():
        steps += 1
        assert steps < 80

    # the stagger actually produced multi-group steps, and none of the
    # in-step groups returned raw device samples (all buffered => the
    # completion pass fetched the accumulator exactly once per step)
    assert stats["max_groups"] >= 2, stats
    assert stats["dev_fetch_groups"] == 0, stats
    for q in queues:
        audio, n_dec = _drain(q)
        assert audio.shape[0] > 0 and n_dec > 0
