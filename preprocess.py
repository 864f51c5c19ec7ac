#!/usr/bin/env python
# coding: utf-8
"""Preprocess dataset (reference preprocess.py CLI surface).

usage: preprocess.py [options] <name> <in_dir> <out_dir>

options:
    --num_workers=<n>        Num workers.
    --hparams=<params>       Hyper parameters [default: ].
    --preset=<json>          Path of preset parameters (json).
    -h, --help               Show help message.
"""
import argparse
import os

from deepvoice3_pytorch_tpu.hparams import hparams, hparams_debug_string
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.datasets import get_preprocessor, SUPPORTED


def write_metadata(metadata, out_dir, hp):
    if not metadata:
        raise SystemExit(
            "No utterances survived preprocessing — check the corpus layout "
            "and filters (e.g. min_text=%d drops short transcripts)."
            % hp.min_text)
    with open(os.path.join(out_dir, 'train.txt'), 'w',
              encoding='utf-8') as f:
        for m in metadata:
            f.write('|'.join([str(x) for x in m]) + '\n')
    frames = sum(m[2] for m in metadata)
    frame_shift_ms = hp.hop_size / hp.sample_rate * 1000
    hours = frames * frame_shift_ms / (3600 * 1000)
    print('Wrote %d utterances, %d frames (%.2f hours)'
          % (len(metadata), frames, hours))
    print('Max input length:  %d' % max(len(m[3]) for m in metadata))
    print('Max output length: %d' % max(m[2] for m in metadata))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("name", choices=SUPPORTED)
    parser.add_argument("in_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--num_workers", type=int,
                        default=os.cpu_count())
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    args = parser.parse_args()

    if args.preset is not None:
        with open(args.preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(args.hparams)
    assert hparams.name == "deepvoice3"
    print(hparams_debug_string())

    try:
        from tqdm import tqdm
    except ImportError:
        tqdm = lambda x: x  # noqa: E731

    ap = AudioProcessor(hparams)
    mod = get_preprocessor(args.name)
    os.makedirs(args.out_dir, exist_ok=True)
    metadata = mod.build_from_path(args.in_dir, args.out_dir, ap, hparams,
                                   num_workers=args.num_workers, tqdm=tqdm)
    write_metadata(metadata, args.out_dir, hparams)
    # stamp the DSP conventions so train.py can refuse a corpus whose
    # framing/normalization no longer matches the active hparams
    from deepvoice3_pytorch_tpu.training.dataset import write_dsp_stamp
    write_dsp_stamp(args.out_dir, hparams)


if __name__ == "__main__":
    main()
