# coding: utf-8
"""docs/build_gallery.py: static audio-sample site generation (the
reference's docs/ Hugo gallery equivalent)."""
import importlib.util
import os
import sys

import numpy as np
from scipy.io import wavfile


def _load_mod():
    spec = importlib.util.spec_from_file_location(
        "build_gallery",
        os.path.join(os.path.dirname(__file__), "..", "docs",
                     "build_gallery.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gallery_build(tmp_path):
    gal = _load_mod()
    samples = tmp_path / "samples"
    os.makedirs(samples)
    wav = (np.sin(np.arange(4000) * 0.1) * 20000).astype(np.int16)
    for i in range(2):
        wavfile.write(str(samples / f"0_checkpoint_{i}.wav"), 22050, wav)
        (samples / f"0_checkpoint_{i}.txt").write_text(
            f"sample sentence <{i}>")
    # one alignment image for sample 0 only
    (samples / "0_checkpoint_0_alignment.png").write_bytes(b"\x89PNG fake")

    site = tmp_path / "site"
    index = gal.build(str(site), [("Model A", str(samples))])
    html_text = open(index, encoding="utf-8").read()
    assert "Model A" in html_text
    assert html_text.count("<audio") == 2
    assert html_text.count('<img class="align"') == 1
    assert "sample sentence &lt;1&gt;" in html_text   # captions escaped
    # assets copied -> relocatable site
    assert os.path.exists(site / "audio" / "s0_0_checkpoint_1.wav")
    assert os.path.exists(site / "audio" / "s0_0_checkpoint_0_alignment.png")


def test_gallery_cli(tmp_path):
    gal = _load_mod()
    samples = tmp_path / "s"
    os.makedirs(samples)
    wavfile.write(str(samples / "a.wav"), 22050,
                  np.zeros(100, np.int16))
    gal.main([str(tmp_path / "site2"), "--section", "X", str(samples)])
    assert os.path.exists(tmp_path / "site2" / "index.html")
