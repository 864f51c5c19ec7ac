# coding: utf-8
"""Native C++ runtime components vs the pure-Python/JAX paths.

Covers the two libraries in deepvoice3_pytorch_tpu/native/:
  * dv3_dsp — host STFT/mel features + Griffin-Lim (the lws-equivalent,
    reference audio.py:9,31-55) must match the on-device dsp/stft.py pipeline
  * dv3_loader — threaded npy batch loader must produce byte-identical
    collated batches to the numpy collate (reference train.py:293-360
    semantics)
"""

import numpy as np
import pytest

from deepvoice3_pytorch_tpu import native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="no C++ toolchain")


def _hp():
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    return default_hparams()


@pytest.fixture(scope="module")
def ap():
    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    return AudioProcessor(_hp())


def test_native_features_match_device_pipeline(ap):
    hp = _hp()
    rs = np.random.RandomState(0)
    wav = (rs.rand(22050).astype(np.float32) - 0.5) * 0.2
    lin_n, mel_n = native.features(wav, ap.mel_filters_np,
                                   hp.fft_size, hp.hop_size, hp.preemphasis,
                                   hp.min_level_db, hp.ref_level_db)
    lin_j, mel_j = ap.both_spectrograms(wav)
    assert lin_n.shape == lin_j.shape and mel_n.shape == mel_j.shape
    assert np.abs(lin_n - lin_j).max() < 2e-4
    assert np.abs(mel_n - mel_j).max() < 2e-4


def test_native_features_batch_matches_single(ap):
    hp = _hp()
    rs = np.random.RandomState(1)
    wavs = [(rs.rand(n).astype(np.float32) - 0.5) for n in (8000, 22050, 3000)]
    mel_w = ap.mel_filters_np
    outs = native.features_batch(wavs, mel_w, hp.fft_size, hp.hop_size,
                                 hp.preemphasis, hp.min_level_db,
                                 hp.ref_level_db)
    for w, (lin_b, mel_b) in zip(wavs, outs):
        lin_s, mel_s = native.features(w, mel_w, hp.fft_size, hp.hop_size,
                                       hp.preemphasis, hp.min_level_db,
                                       hp.ref_level_db)
        assert (lin_b == lin_s).all() and (mel_b == mel_s).all()


def test_native_griffin_lim_matches_device(ap):
    hp = _hp()
    t = np.arange(22050) / 22050.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.3 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
    lin = ap.spectrogram(wav)  # (F, n)
    wav_n = native.inv_spectrogram(lin.T, hp.fft_size, hp.hop_size, hp.power,
                                   hp.min_level_db, hp.ref_level_db,
                                   n_iters=hp.griffin_lim_iters,
                                   momentum=hp.griffin_lim_momentum,
                                   phase_init=hp.griffin_lim_phase_init)
    wav_j = ap.inv_spectrogram(lin)
    L = min(len(wav_n), len(wav_j))
    assert np.isfinite(wav_n).all()
    corr = np.corrcoef(wav_n[:L], wav_j[:L])[0, 1]
    # both GLs share raw-OLA semantics AND the SPSI phase init but differ
    # in FFT backends (f32 matmul-DFT vs radix rfft); the fixed-point
    # iterations amplify fp noise
    assert corr > 0.995, corr


def test_npy_shape_and_unsupported(tmp_path):
    p = tmp_path / "a.npy"
    np.save(p, np.zeros((7, 3), np.float32))
    assert native.npy_shape(p) == (7, 3)
    p1 = tmp_path / "b.npy"
    np.save(p1, np.zeros((5,), np.float32))
    assert native.npy_shape(p1) == (5, 1)
    p2 = tmp_path / "c.npy"
    np.save(p2, np.zeros((2, 2), np.float64))  # unsupported dtype
    assert native.npy_shape(p2) is None


def test_load_padded_batch_offset(tmp_path):
    rs = np.random.RandomState(0)
    arrs = [rs.rand(n, 4).astype(np.float32) for n in (3, 6, 1)]
    paths = []
    for i, a in enumerate(arrs):
        p = tmp_path / f"{i}.npy"
        np.save(p, a)
        paths.append(p)
    batch, rows = native.load_padded_batch(paths, 10, 4, row_offset=2)
    assert list(rows) == [3, 6, 1]
    for i, a in enumerate(arrs):
        assert (batch[i, 2:2 + len(a)] == a).all()
        assert np.abs(batch[i, :2]).max() == 0
        assert np.abs(batch[i, 2 + len(a):]).max() == 0


def _fake_corpus(tmp_path, n=10):
    rs = np.random.RandomState(0)
    lines = []
    for i in range(n):
        T = int(rs.randint(40, 120))
        np.save(tmp_path / f"x-mel-{i:05d}.npy",
                rs.rand(T, 80).astype(np.float32))
        np.save(tmp_path / f"x-spec-{i:05d}.npy",
                rs.rand(T, 129).astype(np.float32))
        lines.append("|".join([f"x-spec-{i:05d}.npy", f"x-mel-{i:05d}.npy",
                               str(T), "hello world %d." % i]))
    (tmp_path / "train.txt").write_text("\n".join(lines), encoding="utf-8")
    return tmp_path


@pytest.mark.parametrize("r,ds_step", [(4, 1), (1, 4)])
def test_collate_native_matches_numpy(tmp_path, r, ds_step):
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.training import dataset

    root = _fake_corpus(tmp_path)
    ds = dataset.TTSDataset(str(root), en, replace_pronunciation_prob=0.0)
    idxs = [0, 3, 7, 9]
    items = [ds[i] for i in idxs]
    ref = dataset.collate(items, r, ds_step, length_bucket_step=16,
                          frame_bucket_step=8)
    got = dataset.collate_native(ds, idxs, r, ds_step, length_bucket_step=16,
                                 frame_bucket_step=8)
    assert got is not None
    assert set(ref.keys()) == set(got.keys())
    for k in ref:
        assert ref[k].shape == got[k].shape, k
        assert (ref[k] == got[k]).all(), k
