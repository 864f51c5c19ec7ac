#!/usr/bin/env python
# coding: utf-8
"""Convert an r9y9/deepvoice3_pytorch checkpoint (.pth) to this framework's
checkpoint format, so models trained with the PyTorch reference synthesize
here unchanged.

usage: convert_checkpoint.py [options] <reference_checkpoint.pth> <output>

options:
    --hparams=<params>      Hyper parameters [default: ].
    --preset=<json>         Preset the reference model was trained with —
                            must match, the state_dict is structure-checked.
    -h, --help              Show help message.

The reference stores torch state_dicts with weight-norm split into
weight_g/weight_v (reference modules.py:85,100,109; checkpoint layout
reference train.py:803-808). utils/torch_import.py maps every tensor onto
our pytree layouts; the result is saved with the step/epoch carried over,
loadable by synthesis.py / train.py --checkpoint (optimizer state is not
convertible and is left for --reset-optimizer semantics).
"""

import argparse

import numpy as np

from deepvoice3_pytorch_tpu.hparams import hparams, hparams_debug_string
from deepvoice3_pytorch_tpu import frontend as frontend_pkg
from deepvoice3_pytorch_tpu.model_builder import build_model
from deepvoice3_pytorch_tpu.utils.torch_import import import_state_dict
from deepvoice3_pytorch_tpu.training import checkpoint as ckpt


def convert(pth_path, out_path, cfg):
    import torch

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = blob["state_dict"] if isinstance(blob, dict) and "state_dict" in blob \
        else blob
    sd_np = {}
    for k, v in sd.items():
        if k.startswith("module."):      # DataParallel prefix
            k = k[len("module."):]
        sd_np[k] = v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)
    params = import_state_dict(sd_np, cfg)
    step = int(blob.get("global_step", 0)) if isinstance(blob, dict) else 0
    epoch = int(blob.get("global_epoch", 0)) if isinstance(blob, dict) else 0
    ckpt.save_checkpoint_file(out_path, params, None, step, epoch)
    return params, step


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("reference_checkpoint")
    parser.add_argument("output")
    parser.add_argument("--hparams", type=str, default="")
    parser.add_argument("--preset", type=str, default=None)
    args = parser.parse_args()

    if args.preset is not None:
        with open(args.preset) as f:
            hparams.parse_json(f.read())
    hparams.parse(args.hparams)
    print(hparams_debug_string())

    _frontend = frontend_pkg.get_frontend(hparams.frontend)
    cfg, _ = build_model(hparams, _frontend.n_vocab)
    _, step = convert(args.reference_checkpoint, args.output, cfg)
    print("Converted %s (step %d) -> %s"
          % (args.reference_checkpoint, step, args.output))


if __name__ == "__main__":
    main()
