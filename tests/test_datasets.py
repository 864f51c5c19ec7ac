# coding: utf-8
"""Dataset preprocessor adapters: corpus layout -> features + train.txt
(reference ljspeech.py/vctk.py/jsut.py/json_meta.py contracts).

Uses the native C++ DSP backend (no accelerator), exercising the full
collect -> trim -> feature -> metadata path on tiny synthetic corpora.
"""

import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

from deepvoice3_pytorch_tpu import native
from deepvoice3_pytorch_tpu.datasets import get_preprocessor
from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
from deepvoice3_pytorch_tpu.hparams import default_hparams

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no C++ toolchain")


@pytest.fixture(autouse=True)
def native_backend(monkeypatch):
    monkeypatch.setenv("DV3_PREPROCESS_BACKEND", "native")


def _hp(**kw):
    hp = default_hparams()
    for k, v in kw.items():
        setattr(hp, k, v)
    return hp


def _wav(path, n=9000, f=300.0, sr=22050):
    t = np.arange(n) / sr
    w = (0.4 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    os.makedirs(os.path.dirname(str(path)), exist_ok=True)
    wavfile.write(str(path), sr, (w * 32767).astype(np.int16))


TEXT = "This is a synthetic sentence long enough to pass the filter."


def _check_outputs(metadata, out_dir, n, cols):
    assert len(metadata) == n
    for m in metadata:
        assert len(m) == cols
        spec = np.load(os.path.join(out_dir, m[0]))
        mel = np.load(os.path.join(out_dir, m[1]))
        assert spec.shape == (m[2], 513)
        assert mel.shape == (m[2], 80)
        assert spec.dtype == np.float32


def test_ljspeech(tmp_path):
    root = tmp_path / "corpus"
    lines = []
    for i in range(3):
        _wav(root / "wavs" / f"LJ-{i}.wav")
        lines.append(f"LJ-{i}|x|{TEXT}")
    os.makedirs(root, exist_ok=True)
    (root / "metadata.csv").write_text("\n".join(lines))

    hp = _hp()
    mod = get_preprocessor("ljspeech")
    out = str(tmp_path / "out")
    meta = mod.build_from_path(str(root), out, AudioProcessor(hp), hp)
    _check_outputs(meta, out, 3, 4)


def test_center_mode_falls_back_to_device_backend(tmp_path):
    """dv3_dsp.cc hardcodes the lws conventions; requesting the native
    backend with stft_mode='center' must warn and produce center-convention
    features via AudioProcessor, not silently lws-framed ones."""
    root = tmp_path / "corpus"
    _wav(root / "wavs" / "LJ-0.wav")
    (root / "metadata.csv").write_text(f"LJ-0|x|{TEXT}")

    hp = _hp(stft_mode="center")
    ap = AudioProcessor(hp)
    mod = get_preprocessor("ljspeech")
    out = str(tmp_path / "out")
    with pytest.warns(UserWarning, match="stft_mode"):
        meta = mod.build_from_path(str(root), out, ap, hp)
    assert len(meta) == 1
    spec = np.load(os.path.join(out, meta[0][0]))
    # center framing: n_frames = 1 + floor(T/hop) after trim — strictly more
    # than the lws causal ceil(T/hop) framing for the same audio; verify
    # against AudioProcessor directly instead of the frame-count heuristic
    from deepvoice3_pytorch_tpu.datasets.common import load_and_trim
    from deepvoice3_pytorch_tpu.datasets.ljspeech import collect
    utt = collect(str(root), hp)[0]
    wav = load_and_trim(ap, hp, utt)
    (ref_lin, _), = ap.batch_features([wav])
    np.testing.assert_allclose(spec, ref_lin.astype(np.float32),
                               atol=1e-5, rtol=0)


def test_vctk_with_and_without_labels(tmp_path):
    root = tmp_path / "vctk"
    for spk in ("p225", "p226"):
        for j in range(2):
            _wav(root / "wav48" / spk / f"{spk}_{j:03d}.wav")
            p = root / "txt" / spk / f"{spk}_{j:03d}.txt"
            os.makedirs(p.parent, exist_ok=True)
            p.write_text(TEXT)
    # one HTK label file: trim to the non-pau span
    lab = root / "lab" / "p225" / "p225_000.lab"
    os.makedirs(lab.parent, exist_ok=True)
    lab.write_text("0 1000000 pau\n1000000 3000000 ah\n3000000 4000000 pau\n")

    hp = _hp()
    mod = get_preprocessor("vctk")
    out = str(tmp_path / "out")
    meta = mod.build_from_path(str(root), out, AudioProcessor(hp), hp)
    _check_outputs(meta, out, 4, 5)
    speaker_ids = sorted({m[4] for m in meta})
    assert speaker_ids == [0, 1]
    # the labeled utterance was trimmed to < 0.2s + energy trim
    labeled = meta[0]
    unlabeled = meta[1]
    assert labeled[2] < unlabeled[2]


def test_jsut(tmp_path):
    root = tmp_path / "jsut"
    sub = root / "basic5000"
    lines = []
    for i in range(2):
        _wav(sub / "wav" / f"BASIC_{i}.wav")
        lines.append(f"BASIC_{i}:{TEXT}")
    (sub / "transcript_utf8.txt").write_text("\n".join(lines))

    hp = _hp(frontend="en")
    mod = get_preprocessor("jsut")
    out = str(tmp_path / "out")
    meta = mod.build_from_path(str(root), out, AudioProcessor(hp), hp)
    _check_outputs(meta, out, 2, 4)


def test_json_meta_recognition_levels(tmp_path):
    root = tmp_path / "js"
    os.makedirs(root, exist_ok=True)
    for i in range(3):
        _wav(root / f"u{i}.wav")
    info = {
        str(root / "u0.wav"): TEXT,                      # aligned
        str(root / "u1.wav"): [TEXT + " x", TEXT],       # partially aligned
        str(root / "u2.wav"): [TEXT],                    # recognition only
    }
    jpath = root / "meta.json"
    jpath.write_text(json.dumps(info))

    mod = get_preprocessor("json_meta")
    hp0 = _hp(ignore_recognition_level=0, process_only_htk_aligned=False)
    out0 = str(tmp_path / "out0")
    meta0 = mod.build_from_path(str(jpath), out0, AudioProcessor(hp0), hp0)
    _check_outputs(meta0, out0, 3, 4)

    hp2 = _hp(ignore_recognition_level=2, process_only_htk_aligned=False)
    out2 = str(tmp_path / "out2")
    meta2 = mod.build_from_path(str(jpath), out2, AudioProcessor(hp2), hp2)
    assert len(meta2) == 1          # only the fully aligned utterance


def test_nikl_s(tmp_path):
    from deepvoice3_pytorch_tpu.datasets import nikl_s
    root = tmp_path / "nikl"
    os.makedirs(root, exist_ok=True)
    lines = []
    for spk in ("fv01", "fv02"):
        for j in range(1, 3):
            p = root / f"{spk}_t{j:02d}.wav"
            _wav(p)
            lines.append(f"{p}|{TEXT}")
    (root / "speaker.sid").write_text("fv02\n")
    (root / "metadata.txt").write_text("\n".join(lines))

    hp = _hp()
    out = str(tmp_path / "out")
    meta = nikl_s.build_from_path(str(root), out, AudioProcessor(hp), hp)
    _check_outputs(meta, out, 2, 4)     # only fv02's two utterances
    assert meta[0][0] == "nikl-single-spec-00001.npy"


def test_nikl_prepare_metafile(tmp_path):
    """nikl_preprocess/prepare_metafile.py produces exactly the inputs the
    nikl_m / nikl_s adapters consume (reference
    nikl_preprocess/prepare_metafile.py:1-71 contract)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "prepare_metafile",
        os.path.join(os.path.dirname(__file__), "..", "nikl_preprocess",
                     "prepare_metafile.py"))
    pm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pm)

    # the corpus root itself containing an excluded substring ("Non") must
    # not filter anything — only corpus-relative components count
    root = tmp_path / "NonCommercial" / "nikl"
    for spk in ("fv01", "fv02"):
        os.makedirs(root / spk, exist_ok=True)
        for j in (1, 2):
            _wav(root / spk / f"{spk}_t01_s{j:02d}.wav")
    # excluded material must not appear
    os.makedirs(root / "Bad", exist_ok=True)
    _wav(root / "Bad" / "fv09_t01_s01.wav")
    _wav(root / "fv01" / "fv01_t01_s01.Bad.wav")     # excluded by filename
    (root / "trans.txt").write_text(
        "t01_s01 first sentence\nt01_s02 second sentence\n")

    meta_path, n, speakers = pm.prepare(str(root), str(root / "trans.txt"))
    assert n == 4 and speakers == ["fv01", "fv02"]
    lines = open(meta_path).read().splitlines()
    assert len(lines) == 4
    assert all("|" in ln and "Bad" not in ln for ln in lines)
    assert lines[0].endswith("|first sentence")
    assert (root / "speaker.sid").read_text() == "fv01\n"
    assert (root / "speaker.mid").read_text() == "fv01\nfv02\n"

    # the produced files feed the dataset adapters directly
    from deepvoice3_pytorch_tpu.datasets import nikl_m, nikl_s
    hp = _hp()
    utts_m = nikl_m.collect(str(root), hp)
    assert len(utts_m) == 4 and {u.speaker_id for u in utts_m} == {0, 1}
    utts_s = nikl_s.collect(str(root), hp)
    assert len(utts_s) == 2            # fv01 only


def test_nikl_m(tmp_path):
    from deepvoice3_pytorch_tpu.datasets import nikl_m
    root = tmp_path / "nikl"
    os.makedirs(root, exist_ok=True)
    lines = []
    for spk in ("fv01", "fv02"):
        for j in range(1, 3):
            p = root / f"{spk}_t{j:02d}.wav"
            _wav(p)
            lines.append(f"{p}|{TEXT}")
    (root / "speaker.mid").write_text("fv01\nfv02\n")
    (root / "metadata.txt").write_text("\n".join(lines))

    hp = _hp()
    out = str(tmp_path / "out")
    meta = nikl_m.build_from_path(str(root), out, AudioProcessor(hp), hp)
    _check_outputs(meta, out, 4, 5)
    assert sorted({m[4] for m in meta}) == [0, 1]


def test_dsp_stamp_roundtrip_and_mismatch(tmp_path):
    """preprocess stamps the DSP conventions (dsp_config.json); training
    accepts a matching corpus, refuses a mismatched one with a clear
    SystemExit, and warns (not fails) on pre-stamp corpora."""
    import pytest
    import warnings

    from deepvoice3_pytorch_tpu.training import dataset as ds

    hp = _hp()
    root = str(tmp_path)
    ds.write_dsp_stamp(root, hp)
    ds.check_dsp_stamp(root, hp)          # match: silent

    hp2 = _hp()
    hp2.stft_mode = "center"              # convention change
    with pytest.raises(SystemExit, match="stft_mode"):
        ds.check_dsp_stamp(root, hp2)

    os.remove(os.path.join(root, "dsp_config.json"))
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds.check_dsp_stamp(root, hp)      # pre-stamp corpus: warn only
    assert any("dsp_config" in str(x.message) for x in w)
