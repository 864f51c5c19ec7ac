#!/usr/bin/env python
# coding: utf-8
"""Dump current (default + overridden) hparams to a JSON preset file
(reference dump_hparams_to_json.py).

usage: dump_hparams_to_json.py [options] <output_json_path>

options:
    --hparams=<params>       Hyper parameters [default: ].
    --preset=<json>          Base preset to overlay first.
    -h, --help               Show help message.
"""
import argparse
import json

from deepvoice3_pytorch_tpu.hparams import hparams


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output_json_path")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    args = parser.parse_args()

    if args.preset is not None:
        with open(args.preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(args.hparams)

    with open(args.output_json_path, "w") as f:
        json.dump(hparams.values(), f, indent=2, sort_keys=True)
    print("Wrote %s" % args.output_json_path)


if __name__ == "__main__":
    main()
