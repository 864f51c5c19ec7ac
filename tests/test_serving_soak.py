# coding: utf-8
"""Sustained-serving soak (round-4 verdict #8): N-hundred requests through
serve.py --slots must leave the engine exactly where it started — no slot
leak, no unbounded program-cache growth, bounded RSS, and a /stats
snapshot that accounts for every request. Beyond-reference subsystem
(the reference has no serving path), held to the same "actually works"
bar as the rest."""

import json
import queue
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from deepvoice3_pytorch_tpu.frontend import en
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.hparams import default_hparams
from deepvoice3_pytorch_tpu.model_builder import build_model
from deepvoice3_pytorch_tpu.utils.profiling import rss_mb

TEXTS = [
    "the first soak sentence.",
    "a slightly longer second sentence for the soak run.",
    "short one.",
    "and the fourth sentence, with a clause, to vary the bucket.",
]


def _rss_mb():
    v = rss_mb()
    if v != v:  # NaN — the soak's growth assertion needs a real number
        raise RuntimeError("no VmRSS")
    return v


@pytest.mark.slow
def test_serve_soak_bounded_state():
    import serve as serve_mod
    from http.server import ThreadingHTTPServer

    hp = default_hparams()
    hp.parse("text_embed_dim=64,encoder_channels=32,decoder_channels=32,"
             "converter_channels=32,outputs_per_step=4,downsample_step=1,"
             "max_decoder_steps=48,n_speakers=4,speaker_embed_dim=16")
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    engine = serve_mod.TTSEngine(params, cfg, ap, en, max_decoder_steps=24,
                                 slots=3, text_pad=40)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 serve_mod.make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    N, WORKERS = 96, 6            # concurrency > slots: backlog forms
    jobs = queue.Queue()
    for i in range(N):
        jobs.put(i)
    ok, disconnected, errors = [], [], []

    def fetch(i):
        text = TEXTS[i % len(TEXTS)].replace(" ", "%20")
        url = ("http://127.0.0.1:%d/tts?text=%s&speaker_id=%d"
               % (port, text, i % 4))
        r = urllib.request.urlopen(url, timeout=600)
        if i % 10 == 3:
            # a client hanging up mid-stream must not leak the slot
            r.read(4096)
            r.close()
            disconnected.append(i)
            return
        body = r.read()
        assert body[:4] == b"RIFF"
        assert len(np.frombuffer(body[44:], "<i2")) > ap.hop_size
        ok.append(i)

    def worker():
        while True:
            try:
                i = jobs.get_nowait()
            except queue.Empty:
                return
            try:
                fetch(i)
            except Exception as e:           # pragma: no cover
                errors.append((i, e))

    mid_state = {}

    def run(n_workers):
        th = [threading.Thread(target=worker) for _ in range(n_workers)]
        for t in th:
            t.start()
        for t in th:
            t.join(timeout=600)

    try:
        # first half: fills every program/mask cache this workload can hit
        half = threading.Thread(target=run, args=(WORKERS,))
        half.start()
        while len(ok) + len(disconnected) + len(errors) < N // 2:
            time.sleep(0.05)
        mid_state["progs"] = len(engine.batcher.emit._progs)
        mid_state["masks"] = len(engine.batcher.emit._mask_cache)
        mid_state["rss_mb"] = _rss_mb()
        half.join(timeout=600)
        assert not half.is_alive()

        assert not errors, errors[:3]
        assert len(ok) + len(disconnected) == N

        # wait for any disconnect-abandoned slot to retire
        deadline = time.time() + 60
        while time.time() < deadline and (engine.batcher.active_slots()
                                          or engine.batcher.waiting()):
            time.sleep(0.1)

        # no slot leak, empty backlog
        assert engine.batcher.active_slots() == 0
        assert engine.batcher.waiting() == 0

        # compiled-program and mask caches stopped growing after the
        # workload's signature set was seen (first half)
        assert len(engine.batcher.emit._progs) == mid_state["progs"]
        assert len(engine.batcher.emit._mask_cache) <= 2 ** 3  # sorted keys

        # RSS bounded: the second half must not accumulate per-request
        # state (generous CI slack; a leak of one device buffer per
        # request would add far more)
        growth = _rss_mb() - mid_state["rss_mb"]
        assert growth < 200.0, "RSS grew %.1f MB over second half" % growth

        # /stats accounts for every request
        with urllib.request.urlopen(
                "http://127.0.0.1:%d/stats" % port, timeout=60) as r:
            s = json.loads(r.read())
        assert s["requests_total"] == N
        assert s["requests_failed"] == 0
        assert s["requests_disconnected"] == len(disconnected)
        assert s["active_streams"] == 0
        assert s["ttfa_ms"]["count"] == N
        assert s["ttfa_ms"]["p95"] >= s["ttfa_ms"]["p50"] > 0
        assert s["audio_seconds_total"] > 0
        assert s["backlog"] == 0 and s["active_slots"] == 0
    finally:
        engine.shutdown()
        server.shutdown()
