# coding: utf-8
"""Strict-parity probe: whole-model forward error vs torch CPU, on the
REAL TPU chip, with and without ops.core.strict_numerics().

Quantifies the DESIGN.md §8 error budget's TPU terms:
  * default precision: XLA lowers f32 matmuls/convs to bf16-multipass on
    the MXU — the dominant parity error term on TPU;
  * strict_numerics(): Precision.HIGHEST + tapsum conv lowering — the
    configuration tests/test_model_parity.py pins at <=1e-5 (the tests
    themselves run on the CPU mesh; this probe is the hardware evidence).

Run on a host with the axon TPU attached:  python tools/strict_parity_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np
import torch

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu import builder as jx_builder
from deepvoice3_pytorch_tpu.ops import core
from deepvoice3_pytorch_tpu.utils.torch_import import import_state_dict

from reference_util import import_reference

import_reference()
from deepvoice3_pytorch import builder as ref_builder  # noqa: E402

from test_model_parity import (  # noqa: E402
    _common_kwargs, _make_inputs, _state_dict_np)


def main():
    print("jax backend:", jax.devices()[0].platform, file=sys.stderr)
    torch.manual_seed(0)
    kwargs = _common_kwargs(1)
    ref = ref_builder.deepvoice3(**kwargs).eval()
    cfg = jx_builder.deepvoice3(**kwargs)
    params = jax.tree.map(jnp.asarray,
                          import_state_dict(_state_dict_np(ref), cfg))
    x, mel, tp, fp, lengths, _ = _make_inputs()

    with torch.no_grad():
        mel_t, align_t, done_t, ds = ref.seq2seq(
            torch.from_numpy(x), torch.from_numpy(mel), None,
            torch.from_numpy(tp), torch.from_numpy(fp),
            torch.from_numpy(lengths))
        B = x.shape[0]
        mel_t = mel_t.reshape(B, -1, 80)
        pin = ds.reshape(B, mel_t.shape[1], -1) \
            if cfg.use_decoder_state_for_postnet_input else mel_t
        lin_t = ref.postnet(pin, None)

    def fwd():
        return jx_builder.model_forward(
            params, cfg, jnp.asarray(x), jnp.asarray(mel),
            text_positions=jnp.asarray(tp), frame_positions=jnp.asarray(fp),
            input_lengths=jnp.asarray(lengths))

    rows = []
    for label, ctx in [("default", None), ("strict", core.strict_numerics)]:
        if ctx is None:
            mel_j, lin_j, align_j, done_j = fwd()
        else:
            with ctx():
                mel_j, lin_j, align_j, done_j = fwd()
        rows.append((label,
                     float(np.abs(np.asarray(mel_j) - mel_t.numpy()).max()),
                     float(np.abs(np.asarray(lin_j) - lin_t.numpy()).max()),
                     float(np.abs(np.asarray(align_j)
                                  - align_t.numpy()).max())))

    print("%-8s %12s %12s %12s" % ("mode", "mel", "linear", "align"))
    for label, m, l, a in rows:
        print("%-8s %12.3e %12.3e %12.3e" % (label, m, l, a))


if __name__ == "__main__":
    main()
