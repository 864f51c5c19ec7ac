# coding: utf-8
"""Prepare NIKL metadata files (reference nikl_preprocess/prepare_metafile.py:1-71).

Scans a NIKL corpus tree for wav files, joins each against the transcription
table by utterance id (the ``t##_s##`` pattern in the filename), and writes:

  * ``<corpus>/metadata.txt``   lines of ``<wav path>|<transcription>``
  * ``<corpus>/speaker.mid``    every speaker directory name (multi-speaker)
  * ``<corpus>/speaker.sid``    the first speaker (single-speaker default)

These are the inputs the nikl_m / nikl_s dataset preprocessors consume
(deepvoice3_pytorch_tpu/datasets/nikl_m.py, nikl_s.py). Pure Python — the
reference shells out to find/grep/echo per line, which is slow and quoting-
fragile; this walks the tree directly with identical filtering semantics
(paths containing Bad/Non/Invalid are excluded).

Usage:
  python nikl_preprocess/prepare_metafile.py \\
      --corpus-dir ~/corpora/NIKL --trans-file ~/corpora/NIKL/trans.txt
"""

import argparse
import os
import re

EXCLUDE = ("Bad", "Non", "Invalid")
UTT_ID = re.compile(r"(t[0-9][0-9]_s[0-9][0-9])")


def load_transcriptions(trans_file):
    """trans.txt lines: '<utt id> <text...>' -> {utt_id: text}."""
    trans = {}
    with open(trans_file, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip("\n").split(" ")
            if parts and parts[0]:
                trans[parts[0]] = " ".join(parts[1:])
    return trans


def find_wavs(corpus_dir):
    """All .wav files under corpus_dir, excluding paths whose corpus-relative
    components contain Bad/Non/Invalid, sorted for determinism. The filter is
    applied only below corpus_dir — a corpus rooted at e.g.
    /data/NonCommercial/NIKL must not exclude everything."""
    out = []
    for root, dirs, files in os.walk(corpus_dir):
        dirs[:] = sorted(d for d in dirs
                         if not any(x in d for x in EXCLUDE))
        for name in sorted(files):
            if name.endswith(".wav") and not any(x in name for x in EXCLUDE):
                out.append(os.path.join(root, name))
    return out


def speaker_dirs(corpus_dir):
    return sorted(d for d in os.listdir(corpus_dir)
                  if os.path.isdir(os.path.join(corpus_dir, d))
                  and not any(x in d for x in EXCLUDE))


def prepare(corpus_dir, trans_file):
    trans = load_transcriptions(trans_file)
    wavs = find_wavs(corpus_dir)

    n_written = 0
    meta_path = os.path.join(corpus_dir, "metadata.txt")
    with open(meta_path, "w", encoding="utf-8") as f:
        for w in wavs:
            m = UTT_ID.search(os.path.basename(w))
            if m is None:
                continue
            text = trans.get(m.group(1))
            if text is None:
                continue
            f.write("%s|%s\n" % (w, text))
            n_written += 1

    speakers = speaker_dirs(corpus_dir)
    with open(os.path.join(corpus_dir, "speaker.mid"), "w",
              encoding="utf-8") as f:
        f.write("".join(s + "\n" for s in speakers))
    with open(os.path.join(corpus_dir, "speaker.sid"), "w",
              encoding="utf-8") as f:
        if speakers:
            f.write(speakers[0] + "\n")
    return meta_path, n_written, speakers


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Produce a metadata file aligning each NIKL wav path "
                    "with its transcription")
    parser.add_argument("--corpus-dir", "--corpus_dir", "-c", required=True,
                        help="root directory of the NIKL corpus")
    parser.add_argument("--trans-file", "--trans_file", "-t", required=True,
                        help="transcription table (utt-id text per line)")
    args = parser.parse_args(argv)

    meta_path, n, speakers = prepare(args.corpus_dir, args.trans_file)
    print("Wrote %d entries to %s (%d speakers)"
          % (n, meta_path, len(speakers)))


if __name__ == "__main__":
    main()
