#!/usr/bin/env python
# coding: utf-8
"""Pluggable forced-alignment driver producing HTK `.lab` phoneme labels.

This is the designed equivalent of the reference's merlin/festival/HTK
pipeline (reference vctk_preprocess/extract_feats.py:89-196 and
prepare_htk_alignments_vctk.py): the only artifact the data layer consumes
from THAT 1462-line toolchain is `.lab` files next to each wav
(datasets/common.py:load_hts_labels, used by the vctk/jsut/json_meta
silence trimming). This driver produces the same artifact through two
backends:

  --backend=gentle   the supported in-tree aligner (delegates to
                     gentle_web_align.py's Gentle HTTP flow — same as
                     prepare_vctk_labels.py)
  --backend=cmd      a shim for ANY external aligner the user already
                     runs, merlin/HTK included: --cmd is a template run
                     once per utterance with {wav} {txt} {lab}
                     substituted; the command must write {lab}

Every produced file is validated against the `.lab` contract before being
accepted (see validate_lab) so a misbehaving external aligner fails
loudly here, not silently inside preprocessing.

.lab format contract (HTK/HTS mono labels, what load_hts_labels parses
and the reference's merlin output provides):
  - one segment per line: "<start> <end> <phone>"
  - start/end are integer times in 100 ns units
  - first segment starts at 0; segments are contiguous and monotonic
  - silence phones: "pau" (VCTK style) or "silB"/"silE" (jsut style)

Usage:
  python vctk_preprocess/align.py <wav_dir> <txt_dir> <out_dir>
      [--backend=gentle|cmd] [--cmd=TEMPLATE]
      [--server-addr=HOST --port=PORT]
"""

import argparse
import os
import shlex
import subprocess
import sys
from glob import glob
from os.path import basename, exists, join, splitext

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def validate_lab(path):
    """Assert `path` honors the .lab contract; return the parsed segments.

    Raises ValueError with a precise reason otherwise — the acceptance
    gate for external aligners plugged in via --backend=cmd."""
    segs = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.strip()
            if not line:
                continue
            parts = line.split()
            if len(parts) != 3:
                raise ValueError("%s:%d: expected 'start end phone', got %r"
                                 % (path, ln, line))
            try:
                s, e = int(parts[0]), int(parts[1])
            except ValueError:
                raise ValueError("%s:%d: non-integer 100ns times %r"
                                 % (path, ln, line))
            segs.append((s, e, parts[2]))
    if not segs:
        raise ValueError("%s: empty label file" % path)
    if segs[0][0] != 0:
        raise ValueError("%s: first segment starts at %d, not 0"
                         % (path, segs[0][0]))
    for (s, e, _), (s2, _, _) in zip(segs, segs[1:]):
        if e < s or s2 != e:
            raise ValueError("%s: segments not contiguous/monotonic at "
                             "t=%d" % (path, e))
    if segs[-1][1] <= segs[-1][0]:
        raise ValueError("%s: final segment is empty" % path)
    return segs


def _utterances(wav_dir, txt_dir):
    for wav_path in sorted(glob(join(wav_dir, "*.wav"))):
        stem = splitext(basename(wav_path))[0]
        txt_path = join(txt_dir, stem + ".txt")
        if exists(txt_path):
            yield stem, wav_path, txt_path


def run_cmd_backend(template, wav_dir, txt_dir, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    n_ok = 0
    for stem, wav_path, txt_path in _utterances(wav_dir, txt_dir):
        lab_path = join(out_dir, stem + ".lab")
        cmd = [a.format(wav=wav_path, txt=txt_path, lab=lab_path)
               for a in shlex.split(template)]
        subprocess.run(cmd, check=True)
        if not exists(lab_path):
            raise RuntimeError("aligner command produced no %s" % lab_path)
        validate_lab(lab_path)
        n_ok += 1
    print("aligned %d utterances -> %s" % (n_ok, out_dir))


def run_gentle_backend(server_addr, port, wav_dir, txt_dir, out_dir):
    import gentle_web_align as gwa

    os.makedirs(out_dir, exist_ok=True)
    n_ok = 0
    for stem, wav_path, txt_path in _utterances(wav_dir, txt_dir):
        lab_path = join(out_dir, stem + ".lab")
        data = gwa.gentle_align(wav_path, txt_path, server_addr, port)
        ratio, labels = gwa.alignment_to_labels(data)
        with open(lab_path, "w", encoding="utf-8") as f:
            f.write(gwa.to_htk_label_lines(labels))
        validate_lab(lab_path)
        n_ok += 1
    print("aligned %d utterances -> %s" % (n_ok, out_dir))


def main():
    pa = argparse.ArgumentParser(description=__doc__)
    pa.add_argument("wav_dir")
    pa.add_argument("txt_dir")
    pa.add_argument("out_dir")
    pa.add_argument("--backend", choices=("gentle", "cmd"),
                    default="gentle")
    pa.add_argument("--cmd", default=None,
                    help="command template with {wav} {txt} {lab} "
                         "(backend=cmd)")
    pa.add_argument("--server-addr", default="localhost")
    pa.add_argument("--port", type=int, default=8567)
    args = pa.parse_args()
    if args.backend == "cmd":
        if not args.cmd:
            pa.error("--backend=cmd requires --cmd")
        run_cmd_backend(args.cmd, args.wav_dir, args.txt_dir, args.out_dir)
    else:
        run_gentle_backend(args.server_addr, args.port, args.wav_dir,
                           args.txt_dir, args.out_dir)


if __name__ == "__main__":
    main()
