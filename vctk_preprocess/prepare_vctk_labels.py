#!/usr/bin/env python
# coding: utf-8
"""Prepare HTK/HTS phoneme alignments (.lab) for the VCTK corpus.

Capability equivalent of the reference's vctk_preprocess/
prepare_vctk_labels.py + prepare_htk_alignments_vctk.py (reference
vctk_preprocess/prepare_vctk_labels.py:31-54): walks every VCTK speaker's
wav48/pNNN + txt/pNNN pair, runs forced alignment, and writes
`<out_dir>/pNNN/<utt>.lab` files that deepvoice3_pytorch_tpu's vctk
preprocessor consumes for silence trimming
(deepvoice3_pytorch_tpu/datasets/vctk.py; lab 'pau' trim semantics in
datasets/common.py:lab_trim_bounds_pau).

Alignment backend: a web-served Gentle instance (same engine the reference's
prepare_htk_alignments_vctk.py drives), reached through
gentle_web_align.gentle_align — python3, stdlib HTTP, no merlin/festival/HTK
binaries needed. Start one with e.g.
    docker run -p 8567:8765 lowerquality/gentle

usage: prepare_vctk_labels.py [options] <data_root> <out_dir>

options:
    --server_addr=ADDR       Gentle server host [default: localhost].
    --port=N                 Gentle server port [default: 8567].
    --max_unalign=R          Max unaligned-word ratio [default: 0.3].
    --speakers=LIST          Comma-separated speaker ids (e.g. 225,226);
                             default: every pNNN under wav48/.
    -h, --help               Show help message.
"""

import argparse
import os
import sys
from glob import glob
from os.path import basename, exists, join, splitext

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from gentle_web_align import (alignment_to_labels, gentle_align,  # noqa: E402
                              to_htk_label_lines)


def align_speaker(wav_root, txt_root, out_speaker_dir, server_addr, port,
                  max_unalign):
    os.makedirs(out_speaker_dir, exist_ok=True)
    n_ok = n_fail = 0
    for wav_path in sorted(glob(join(wav_root, "*.wav"))):
        stem = splitext(basename(wav_path))[0]
        txt_path = join(txt_root, stem + ".txt")
        lab_path = join(out_speaker_dir, stem + ".lab")
        if not exists(txt_path):
            continue
        if exists(lab_path):
            n_ok += 1
            continue
        try:
            data = gentle_align(wav_path, txt_path, server_addr, port)
            ratio, labels = alignment_to_labels(data)
            if ratio > max_unalign:
                n_fail += 1
                continue
            # VCTK preprocessor trims on 'pau' segments
            # (datasets/common.py:48-58): rename the silence brackets.
            labels = [(s, e, "pau" if ph in ("silB", "silE") else ph)
                      for s, e, ph in labels]
            with open(lab_path, "w", encoding="utf-8") as f:
                f.write(to_htk_label_lines(labels))
            n_ok += 1
        except Exception as e:
            n_fail += 1
            print("error on %s: %s" % (wav_path, e), file=sys.stderr)
    return n_ok, n_fail


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("data_root")
    p.add_argument("out_dir")
    p.add_argument("--server_addr", default="localhost")
    p.add_argument("--port", type=int, default=8567)
    p.add_argument("--max_unalign", type=float, default=0.3)
    p.add_argument("--speakers", default=None)
    args = p.parse_args(argv)

    wav48 = join(args.data_root, "wav48")
    if args.speakers:
        speakers = ["p" + s.strip().lstrip("p")
                    for s in args.speakers.split(",")]
    else:
        speakers = sorted(basename(d) for d in glob(join(wav48, "p*"))
                          if os.path.isdir(d))
    if not speakers:
        print("no speakers found under %s" % wav48, file=sys.stderr)
        return 1

    total_ok = total_fail = 0
    for spk in speakers:
        wav_root = join(wav48, spk)
        txt_root = join(args.data_root, "txt", spk)
        if not (exists(wav_root) and exists(txt_root)):
            print("skipping %s (missing wav/txt dir)" % spk, file=sys.stderr)
            continue
        ok, fail = align_speaker(wav_root, txt_root, join(args.out_dir, spk),
                                 args.server_addr, args.port,
                                 args.max_unalign)
        total_ok += ok
        total_fail += fail
        print("%s: %d labeled, %d failed" % (spk, ok, fail))
    print("done: %d labeled, %d failed" % (total_ok, total_fail))
    return 0


if __name__ == "__main__":
    sys.exit(main())
