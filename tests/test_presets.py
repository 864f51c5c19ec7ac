# coding: utf-8
"""Every shipped preset JSON must parse through the HParams grammar and
build its model family (catches preset/hparams drift — the reference
requires the same preset across all three CLI stages, README.md:106-125)."""

import glob
import json
import os

import jax
import pytest

from deepvoice3_pytorch_tpu.hparams import default_hparams
from deepvoice3_pytorch_tpu.model_builder import build_model

PRESETS = sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "presets", "*.json")))


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p)
                                               for p in PRESETS])
def test_preset_parses_and_builds(path):
    hp = default_hparams()
    with open(path) as f:
        text = f.read()
    hp.parse_json(text)
    blob = json.loads(text)
    for k, v in blob.items():
        if isinstance(v, (int, float, str, bool)):
            assert getattr(hp, k) == v, k

    # shrink only capacity knobs so model construction stays fast; the
    # architecture-defining ones (builder, r, downsample, attention windows)
    # come from the preset
    hp.parse("text_embed_dim=32,encoder_channels=32,decoder_channels=32,"
             "converter_channels=32")
    if hp.builder == "nyanko":
        hp.parse("encoder_channels=32,decoder_channels=32")
    cfg, params = build_model(hp, n_vocab=149)
    assert cfg.builder == hp.builder
    n_leaves = len(jax.tree.leaves(params))
    assert n_leaves > 20


def test_presets_cover_reference_set():
    names = {os.path.basename(p) for p in PRESETS}
    assert {"deepvoice3_ljspeech.json", "nyanko_ljspeech.json",
            "deepvoice3_vctk.json", "deepvoice3_niklm.json",
            "deepvoice3_nikls.json"} <= names
