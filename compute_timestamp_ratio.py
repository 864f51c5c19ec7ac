#!/usr/bin/env python
# coding: utf-8
"""Compute the decoder-frames / text-tokens ratio used as key_position_rate
(reference compute_timestamp_ratio.py).

usage: compute_timestamp_ratio.py [options] <data_root>

options:
    --hparams=<params>       Hyper parameters [default: ].
    --preset=<json>          Path of preset parameters (json).
    -h, --help               Show help message.
"""
import argparse

import numpy as np

from deepvoice3_pytorch_tpu.hparams import hparams
from deepvoice3_pytorch_tpu import frontend as frontend_pkg
from deepvoice3_pytorch_tpu.training.dataset import Metadata


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_root")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    args = parser.parse_args()

    if args.preset is not None:
        with open(args.preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(args.hparams)
    assert hparams.name == "deepvoice3"

    _frontend = frontend_pkg.get_frontend(hparams.frontend)
    meta = Metadata(args.data_root)

    in_sizes, out_sizes = [], []
    for text, n_frames in zip(meta.texts, meta.frame_lengths):
        seq = _frontend.text_to_sequence(text)
        in_sizes.append(len(seq))
        out_sizes.append(
            n_frames // hparams.outputs_per_step // hparams.downsample_step)

    input_timestamps = np.sum(in_sizes)
    output_timestamps = np.sum(out_sizes)
    print(input_timestamps, output_timestamps,
          output_timestamps / input_timestamps)
    sr = hparams.sample_rate
    hop_length = hparams.hop_size
    ratio = output_timestamps / input_timestamps
    print("Ratio (i.e., key_position_rate): {}".format(ratio))


if __name__ == "__main__":
    main()
