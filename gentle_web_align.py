#!/usr/bin/env python
# coding: utf-8
"""Forced alignment via a web-served Gentle instance -> HTK .lab files.

Capability equivalent of the reference's gentle_web_align.py
(reference gentle_web_align.py:44-152): for each (wav, transcript) pair,
POST to the Gentle server's /transcriptions endpoint, convert the word/phone
JSON alignment into HTK-style labels (100 ns units) bracketed by silB/silE,
filter out utterances whose unaligned-word ratio exceeds a threshold, and
write `<wav_stem>.lab` next to the wav. These .lab files drive the silence
trimming in the jsut/vctk/json_meta preprocessors
(deepvoice3_pytorch_tpu/datasets/common.py:load_and_trim).

Implementation is stdlib-only (urllib multipart) so it runs in minimal
environments; the Gentle server itself is external (e.g. the
lowerquality/gentle Docker image).

usage: gentle_web_align.py [options]

options:
    -w PAT --wav_pattern=PAT     Glob of wav files to align.
    -t PAT --txt_pattern=PAT     Glob of matching .txt transcripts.
    --nested-directories=DIR     Align every wav/txt pair in DIR's subdirs.
    --server_addr=ADDR           Gentle server host [default: localhost].
    --port=N                     Gentle server port [default: 8567].
    --max_unalign=R              Max tolerated unaligned-word ratio
                                 [default: 0.3].
    --skip-already-done          Skip wavs that already have a .lab file.
    -h --help                    Show this help.
"""

import argparse
import io
import json
import os
import sys
import urllib.request
import uuid
from glob import glob
from os.path import basename, exists, isdir, join, splitext


def to_htk_label_lines(labels):
    """[(start_s, end_s, phone)] -> HTK lines with 100 ns integer times."""
    lines = []
    for s, e, ph in labels:
        lines.append("%d %d %s" % (round(float(s) * 1e7),
                                   round(float(e) * 1e7), ph))
    return "\n".join(lines) + "\n"


def alignment_to_labels(data):
    """Gentle JSON -> (unaligned_ratio, [(start, end, phone)]).

    Phones carry Gentle's positional suffix (`_B`/`_I`/`_E`), which is
    stripped; leading silence becomes `silB`, a trailing `silE` closes the
    sequence (the preprocessors trim on silB/silE — datasets/common.py:88).
    Words Gentle failed on are skipped and counted.
    """
    words = data.get("words", [])
    labels = []
    failures = 0
    cursor = 0.0
    last_end = None
    for w in words:
        if w.get("case") != "success":
            failures += 1
            continue
        start, end = float(w["start"]), float(w["end"])
        if not labels:
            labels.append((0.0, start, "silB"))
        t = start
        for ph in w.get("phones", []):
            dur = float(ph["duration"])
            name = str(ph["phone"])
            if "_" in name:
                name = name.split("_")[0]
            labels.append((t, t + dur, name))
            t += dur
        last_end = t
        cursor = max(cursor, end)
    if last_end is not None:
        labels.append((last_end, max(last_end, cursor), "silE"))
    ratio = failures / max(len(words), 1)
    return ratio, labels


def _multipart(fields, files):
    """Build a multipart/form-data body with stdlib only."""
    boundary = uuid.uuid4().hex
    body = io.BytesIO()
    for name, value in fields:
        body.write(("--%s\r\nContent-Disposition: form-data; name=\"%s\""
                    "\r\n\r\n%s\r\n" % (boundary, name, value)).encode())
    for name, (filename, payload) in files:
        body.write(("--%s\r\nContent-Disposition: form-data; name=\"%s\"; "
                    "filename=\"%s\"\r\nContent-Type: application/"
                    "octet-stream\r\n\r\n" % (boundary, name,
                                              filename)).encode())
        body.write(payload)
        body.write(b"\r\n")
    body.write(("--%s--\r\n" % boundary).encode())
    return body.getvalue(), "multipart/form-data; boundary=%s" % boundary


def gentle_align(wav_path, txt_path, server_addr, port, timeout=600):
    """POST one utterance to Gentle; returns the parsed JSON alignment."""
    if splitext(basename(wav_path))[0] != splitext(basename(txt_path))[0]:
        raise ValueError("wav/transcript basename mismatch: %s vs %s"
                         % (wav_path, txt_path))
    with open(wav_path, "rb") as f:
        wav_bytes = f.read()
    with open(txt_path, "rb") as f:
        txt_bytes = f.read()
    body, ctype = _multipart(
        [], [("audio", (basename(wav_path), wav_bytes)),
             ("transcript", (basename(txt_path), txt_bytes))])
    url = "http://%s:%d/transcriptions?async=false" % (server_addr, int(port))
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status != 200:
            raise RuntimeError("Gentle returned HTTP %d" % resp.status)
        return json.loads(resp.read().decode("utf-8"))


def collect_pairs(args):
    if args.nested_directories:
        top = args.nested_directories
        wavs, txts = [], []
        for sub in sorted(os.listdir(top)):
            d = join(top, sub)
            if not isdir(d):
                continue
            wavs.extend(sorted(glob(join(d, "*.wav"))))
            txts.extend(sorted(glob(join(d, "*.txt"))))
        return wavs, txts
    return (sorted(glob(args.wav_pattern or "")),
            sorted(glob(args.txt_pattern or "")))


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Align wav/transcript pairs via a Gentle server and "
                    "write HTK .lab files")
    p.add_argument("-w", "--wav_pattern")
    p.add_argument("-t", "--txt_pattern")
    p.add_argument("--nested-directories", dest="nested_directories")
    p.add_argument("--server_addr", default="localhost")
    p.add_argument("--port", type=int, default=8567)
    p.add_argument("--max_unalign", type=float, default=0.3)
    p.add_argument("--skip-already-done", action="store_true")
    args = p.parse_args(argv)

    if not args.nested_directories and not (args.wav_pattern
                                            and args.txt_pattern):
        p.error("give either --wav_pattern + --txt_pattern or "
                "--nested-directories")

    wavs, txts = collect_pairs(args)
    if len(wavs) != len(txts):
        print("warning: %d wavs vs %d transcripts" % (len(wavs), len(txts)),
              file=sys.stderr)
    n_ok = n_skip = n_fail = 0
    for wav_path, txt_path in zip(wavs, txts):
        lab_path = splitext(wav_path)[0] + ".lab"
        if args.skip_already_done and exists(lab_path):
            n_skip += 1
            continue
        try:
            data = gentle_align(wav_path, txt_path, args.server_addr,
                                args.port)
            ratio, labels = alignment_to_labels(data)
            if ratio > args.max_unalign:
                print("skip %s: unaligned ratio %.2f > %.2f"
                      % (basename(wav_path), ratio, args.max_unalign))
                n_skip += 1
                continue
            with open(lab_path, "w", encoding="utf-8") as f:
                f.write(to_htk_label_lines(labels))
            n_ok += 1
            print("wrote %s (unaligned %.2f)" % (lab_path, ratio))
        except Exception as e:  # keep aligning the rest (long batch jobs)
            n_fail += 1
            print("error on %s: %s" % (wav_path, e), file=sys.stderr)
    print("done: %d aligned, %d skipped, %d failed" % (n_ok, n_skip, n_fail))
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
