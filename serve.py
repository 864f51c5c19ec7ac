#!/usr/bin/env python
# coding: utf-8
"""Streaming TTS HTTP server.

usage: serve.py [options] <checkpoint>

options:
    --hparams=<params>       Hyper parameters [default: ].
    --preset=<json>          Path of preset parameters (json).
    --host=<h>               Bind address [default: 127.0.0.1].
    --port=<p>               Port [default: 8585].
    --max-decoder-steps=<N>  Max decoder steps [default: 500].
    --slots=<N>              Continuous batching with N slots [default: 0].
    -h, --help               Show help message.

Endpoints:
    GET /tts?text=...[&speaker_id=N]
        Chunked-transfer WAV: the header + audio chunks are written as the
        streaming pipeline (deepvoice3_pytorch_tpu/streaming.py) produces
        them, so a client hears the first samples after one decode chunk
        (~80 ms on a v5e for the LJSpeech preset) while the rest of the
        utterance is still being synthesized. The WAV header declares an
        unknown (0xFFFFFFFF) data length, the standard convention for
        live streams; players treat it as "read until EOF".
    GET /healthz
        200 "ok" once the model is loaded and warmed.
    GET /stats
        JSON serving metrics: request counts, in-flight streams,
        time-to-first-audio distribution (last 512 requests: mean/p50/p95),
        total audio seconds produced, slot configuration and queue backlog
        (continuous-batching mode), uptime.

By default the server synthesizes one request at a time (a lock
serializes model access). With --slots=N it runs CONTINUOUS BATCHING
(deepvoice3_pytorch_tpu/serving.py): up to N utterances decode
concurrently in one slot batch on the chip, new requests joining at
decode-chunk boundaries — the same aggregate-throughput idea as
continuous batching in LLM serving, for TTS streams. Admission control:
once --max-backlog requests wait for a slot (default 8 per slot), new
requests are shed with HTTP 503 + Retry-After instead of queuing
unboundedly.

The reference has no serving path at all; this is the capability its
synthesis.py CLI cannot offer (reference synthesis.py:42-73 writes files
after full synthesis).
"""
import argparse
import collections
import json
import queue
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np


def wav_stream_header(sample_rate, bits=16, channels=1):
    """RIFF/WAVE header with unknown (streaming) lengths."""
    byte_rate = sample_rate * channels * bits // 8
    block_align = channels * bits // 8
    return b"".join([
        b"RIFF", struct.pack("<I", 0xFFFFFFFF), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                             byte_rate, block_align, bits),
        b"data", struct.pack("<I", 0xFFFFFFFF),
    ])


def pcm16(x):
    x = np.clip(np.asarray(x, np.float32), -1.0, 1.0)
    return (x * 32767.0).astype("<i2").tobytes()


class TTSEngine:
    """Model + streaming pipeline.

    slots=0 (default): one utterance at a time behind a lock.
    slots=N: continuous batching (deepvoice3_pytorch_tpu/serving.py) — up
    to N utterances decode concurrently in one slot batch, new requests
    joining at chunk boundaries; a worker thread drives the batch."""

    def __init__(self, params, cfg, ap, frontend_mod, max_decoder_steps,
                 slots=0, text_pad=64, max_backlog=None):
        self.params = params
        self.cfg = cfg
        self.ap = ap
        self.frontend = frontend_mod
        self.max_decoder_steps = max_decoder_steps
        self.lock = threading.Lock()
        self.batcher = None
        self._stop = threading.Event()
        self._t_start = time.time()
        self._stats_lock = threading.Lock()
        self._counts = {"requests_total": 0, "requests_failed": 0,
                        "requests_rejected": 0, "requests_disconnected": 0,
                        "active_streams": 0, "audio_seconds_total": 0.0}
        self._ttfa_ms = collections.deque(maxlen=512)
        if slots:
            from deepvoice3_pytorch_tpu.serving import ContinuousBatcher

            self.batcher = ContinuousBatcher(
                params, cfg, ap, frontend_mod, n_slots=slots,
                text_pad=text_pad, max_decoder_steps=max_decoder_steps,
                max_backlog=max_backlog)
            self._worker = threading.Thread(
                target=self.batcher.run_loop, args=(self._stop,),
                daemon=True)
            self._worker.start()

    def shutdown(self):
        self._stop.set()

    def warmup(self):
        # _stream_inner directly: the compile-heavy warmup request must not
        # pollute the serving TTFA distribution
        for _ in self._stream_inner("warm up."):
            pass

    def stats(self):
        """Serving metrics snapshot (the /stats endpoint)."""
        with self._stats_lock:
            s = dict(self._counts)
            ttfa = sorted(self._ttfa_ms)
        s["audio_seconds_total"] = round(s["audio_seconds_total"], 3)
        if ttfa:
            n = len(ttfa)
            s["ttfa_ms"] = {
                "count": n,
                "mean": round(sum(ttfa) / n, 1),
                "p50": round(ttfa[n // 2], 1),
                "p95": round(ttfa[min(n - 1, int(0.95 * n))], 1),
            }
        s["slots"] = self.batcher.n_slots if self.batcher else 0
        if self.batcher is not None:
            # backlog = waiting-queue depth only (the number the
            # max_backlog admission threshold compares against);
            # active_slots = occupied slots, reported separately
            s["backlog"] = self.batcher.waiting()
            s["active_slots"] = self.batcher.active_slots()
            # cumulative per-phase wall inside step() — attributes engine
            # time to dispatch vs the two device syncs vs host DSP
            s["step_phase_ms"] = self.batcher.timing()
        s["uptime_s"] = round(time.time() - self._t_start, 1)
        return s

    def stream(self, text, speaker_id=None):
        """_stream_inner plus serving metrics: request/failure counters,
        in-flight gauge, time-to-first-audio, audio seconds produced."""
        t0 = time.perf_counter()
        with self._stats_lock:
            self._counts["requests_total"] += 1
            self._counts["active_streams"] += 1
        n_samples, first = 0, True
        try:
            for audio in self._stream_inner(text, speaker_id=speaker_id):
                if first:
                    first = False
                    with self._stats_lock:
                        self._ttfa_ms.append(
                            (time.perf_counter() - t0) * 1000.0)
                n_samples += len(audio)
                yield audio
        except GeneratorExit:
            # a client hanging up mid-stream closes the abandoned
            # generator; that's a normal disconnect, not a synth failure
            with self._stats_lock:
                self._counts["requests_disconnected"] += 1
            raise
        except BaseException as e:
            from deepvoice3_pytorch_tpu.serving import BacklogFull

            key = ("requests_rejected" if isinstance(e, BacklogFull)
                   else "requests_failed")
            with self._stats_lock:
                self._counts[key] += 1
            raise
        finally:
            with self._stats_lock:
                self._counts["active_streams"] -= 1
                self._counts["audio_seconds_total"] += \
                    n_samples / float(self.ap.sample_rate)

    def _stream_inner(self, text, speaker_id=None):
        """Yields float32 sample chunks for one utterance, trimmed to the
        decoded length."""
        if self.batcher is not None:
            q = self.batcher.submit(
                text, None if speaker_id is None else int(speaker_id))
            while True:
                try:
                    kind, payload = q.get(timeout=600)
                except queue.Empty:
                    # overloaded backlog: end the (possibly partial)
                    # stream cleanly rather than leaking the handler
                    return
                if kind == "end":
                    return
                if kind == "error":
                    raise payload
                yield payload
            return

        # Lock-mode synthesis runs in a PRODUCER thread that holds the
        # model lock only while synthesizing; this generator (suspended
        # across the caller's client-socket writes) never holds it — a
        # slow-reading client must not block other requests behind a
        # network-bound transfer.
        from deepvoice3_pytorch_tpu import streaming

        spk = None if speaker_id is None else [int(speaker_id)]
        q = queue.Queue()

        def produce():
            try:
                with self.lock:
                    emitted = 0
                    for chunk in streaming.tts_stream(
                            self.params, self.cfg, self.ap, self.frontend,
                            [text], speaker_ids=spk,
                            max_decoder_steps=self.max_decoder_steps):
                        audio = chunk["audio"][0]
                        if chunk["final"]:
                            # trim the post-done tail of the final emission
                            n_total = streaming.decoded_samples(
                                self.cfg, self.ap,
                                chunk["decoded_steps"][0])
                            audio = audio[:max(0, n_total - emitted)]
                        emitted += len(audio)
                        if len(audio):
                            q.put(("audio", audio))
                q.put(("end", None))
            except BaseException as e:           # surface in the handler
                q.put(("error", e))

        threading.Thread(target=produce, daemon=True).start()
        while True:
            try:
                kind, payload = q.get(timeout=600)
            except queue.Empty:
                return        # stalled producer: end the stream cleanly
            if kind == "end":
                return
            if kind == "error":
                raise payload
            yield payload


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/healthz":
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", "2")
                self.end_headers()
                self.wfile.write(b"ok")
                return
            if url.path == "/stats":
                self._json(200, engine.stats())
                return
            if url.path != "/tts":
                self._json(404, {"error": "unknown path %s" % url.path})
                return
            q = parse_qs(url.query)
            text = (q.get("text") or [""])[0].strip()
            if not text:
                self._json(400, {"error": "missing ?text="})
                return
            speaker = (q.get("speaker_id") or [None])[0]
            try:
                gen = engine.stream(text, speaker_id=speaker)
                first = next(gen, None)
            except Exception as e:  # surface synth errors as HTTP 500
                from deepvoice3_pytorch_tpu.serving import BacklogFull

                if isinstance(e, BacklogFull):  # admission control: shed
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_response(503)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Retry-After", "1")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self._json(500, {"error": str(e)})
                return
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(data):
                self.wfile.write(b"%x\r\n" % len(data))
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            chunk(wav_stream_header(engine.ap.sample_rate))
            if first is not None and len(first):
                chunk(pcm16(first))
            for audio in gen:
                chunk(pcm16(audio))
            self.wfile.write(b"0\r\n\r\n")

    return Handler


def build_engine(checkpoint, preset=None, hparams_str="",
                 max_decoder_steps=500, slots=0, max_backlog=None):
    from deepvoice3_pytorch_tpu import frontend as frontend_pkg
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.hparams import hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.training import checkpoint as ckpt

    if preset is not None:
        with open(preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(hparams_str)
    fe = frontend_pkg.get_frontend(hparams.frontend)
    cfg, params = build_model(hparams, fe.n_vocab)
    params, _, _, _ = ckpt.load_checkpoint(checkpoint, params,
                                           reset_optimizer=True)
    ap = AudioProcessor(hparams)
    return TTSEngine(params, cfg, ap, fe, max_decoder_steps, slots=slots,
                     max_backlog=max_backlog)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8585)
    parser.add_argument("--max-decoder-steps", type=int, default=500)
    parser.add_argument("--slots", type=int, default=0,
                        help="continuous batching: decode up to N "
                             "utterances concurrently in one slot batch "
                             "(both model families; texts up to the "
                             "model's max_positions); 0 = one at a time")
    parser.add_argument("--max-backlog", type=int, default=None,
                        help="admission control (slots mode): reject with "
                             "HTTP 503 once this many requests wait for a "
                             "slot [default: 8*slots]")
    args = parser.parse_args()

    engine = build_engine(args.checkpoint, args.preset, args.hparams,
                          args.max_decoder_steps, slots=args.slots,
                          max_backlog=args.max_backlog)
    print("warming up (compiles the streaming programs)...")
    engine.warmup()
    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(engine))
    print("serving on http://%s:%d  (GET /tts?text=...)"
          % (args.host, args.port))
    server.serve_forever()


if __name__ == "__main__":
    main()
