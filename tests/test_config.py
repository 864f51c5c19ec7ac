# coding: utf-8
"""HParams config system tests (reference tfcompat/hparam.py surface)."""
import json
import pytest

from deepvoice3_pytorch_tpu.config import HParams
from deepvoice3_pytorch_tpu.hparams import default_hparams


def test_basic_attributes():
    hp = HParams(a=1, b=2.5, c="x", d=True, e=[1, 2, 3])
    assert hp.a == 1 and hp.b == 2.5 and hp.c == "x" and hp.d is True
    assert hp.e == [1, 2, 3]


def test_parse_string():
    hp = HParams(a=1, b=2.5, c="x", d=True, e=[1, 2])
    hp.parse("a=7,b=0.125,c=hello,d=false,e=[5,6,7]")
    assert hp.a == 7 and hp.b == 0.125 and hp.c == "hello"
    assert hp.d is False and hp.e == [5, 6, 7]


def test_parse_type_errors():
    hp = HParams(a=1)
    with pytest.raises(ValueError):
        hp.parse("a=not_a_number")
    with pytest.raises(ValueError):
        hp.parse("unknown_key=1")


def test_parse_json_and_values():
    hp = HParams(a=1, b="x")
    hp.parse_json(json.dumps({"a": 3, "b": "y"}))
    assert hp.values() == {"a": 3, "b": "y"}
    assert hp.get("a") == 3 and hp.get("zz", 9) == 9
    assert "a" in hp and "zz" not in hp


def test_default_hparams_keys_cover_reference():
    hp = default_hparams()
    # spot-check the reference's key set (hparams.py:7-140)
    for key in ["name", "frontend", "builder", "n_speakers", "num_mels",
                "fft_size", "hop_size", "sample_rate", "preemphasis",
                "downsample_step", "outputs_per_step", "max_positions",
                "dropout", "kernel_size", "text_embed_dim",
                "encoder_channels", "decoder_channels", "converter_channels",
                "key_position_rate", "use_memory_mask",
                "masked_loss_weight", "priority_freq",
                "binary_divergence_weight", "use_guided_attention",
                "guided_attention_sigma", "batch_size", "adam_beta1",
                "initial_learning_rate", "lr_schedule", "nepochs",
                "clip_thresh", "checkpoint_interval", "eval_interval",
                "force_monotonic_attention", "window_ahead",
                "window_backward", "power"]:
        assert key in hp, key


def test_reference_presets_load():
    import glob
    for path in sorted(glob.glob("presets/*.json")):
        hp = default_hparams()
        with open(path) as f:
            hp.parse_json(f.read())
        assert hp.builder in ("deepvoice3", "deepvoice3_multispeaker",
                              "nyanko")
        assert hp.name == "deepvoice3"
