# coding: utf-8
"""Generate the committed DSP golden fixtures (tests/data/dsp_golden_*.npy).

The goldens are produced by the clean-room float64 numpy model of the
reference's lws-based DSP pipeline (deepvoice3_pytorch_tpu/dsp/
reference_model.py — see its docstring for the documented convention
assumptions) on a deterministic synthetic speech-like signal:
a harmonic stack with vibrato F0, amplitude modulation, and a small fixed
noise floor, at the LJSpeech preset audio config (22050 Hz / fft 1024 /
hop 256 / 80 mels / fmin 125 / fmax 7600 / preemph 0.97 / ref 20 /
min -100). The signal length is chosen so hop does not divide T (frame
count is then identical across the ceil/1+floor conventions).

Run from the repo root:  python tools/make_dsp_goldens.py
Deterministic: re-running must reproduce the committed files bit-for-bit
(guarded by tests/test_dsp_golden.py::test_goldens_reproducible).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from deepvoice3_pytorch_tpu.dsp import reference_model as ref  # noqa: E402


class HP:
    sample_rate = 22050
    fft_size = 1024
    hop_size = 256
    num_mels = 80
    fmin = 125
    fmax = 7600
    preemphasis = 0.97
    min_level_db = -100
    ref_level_db = 20
    power = 1.4


class HP16:
    """Second audio config (round-4 verdict #7): 16 kHz with hop 240 —
    fft_size % hop != 0, exercising the gather framing path
    (dsp/stft.py:_frame generic branch), the scatter overlap-add fallback
    (_overlap_add), and the COLA window normalization at a non-divisible
    fft/hop ratio (lws_hann_window). The reference runs at any hparams
    combination lws accepts (reference audio.py:31-55)."""
    sample_rate = 16000
    fft_size = 1024
    hop_size = 240          # 15 ms at 16 kHz; 1024 % 240 == 64
    num_mels = 80
    fmin = 125
    fmax = 7600
    preemphasis = 0.97
    min_level_db = -100
    ref_level_db = 20
    power = 1.4


def golden_signal(T=22050 + 131, sr=22050):
    rng = np.random.RandomState(1234)
    t = np.arange(T) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 1.5 * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    x = sum(0.5 / h * np.sin(h * phase) for h in range(1, 9))
    x *= 0.2 + 0.8 * np.abs(np.sin(2 * np.pi * 2.1 * t))
    x += 0.01 * rng.randn(T)
    return (0.5 * x / np.abs(x).max()).astype(np.float32)


def _write_set(out_dir, prefix, hp, wav):
    linear = ref.spectrogram(wav, hp).astype(np.float32)   # (513, F)
    mel = ref.melspectrogram(wav, hp).astype(np.float32)   # (80, F)
    mel_fb = ref.mel_filterbank(hp.sample_rate, hp.fft_size, hp.num_mels,
                                hp.fmin, hp.fmax).astype(np.float32)
    win = ref.analysis_window(hp.fft_size, hp.hop_size).astype(np.float32)
    for name, arr in [("wav", wav), ("linear", linear), ("mel", mel),
                      ("melfb", mel_fb), ("window", win)]:
        path = os.path.join(out_dir, "%s_%s.npy" % (prefix, name))
        np.save(path, arr, allow_pickle=False)
        print("wrote %s %s" % (path, arr.shape))


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "data")
    os.makedirs(out_dir, exist_ok=True)
    _write_set(out_dir, "dsp_golden", HP(), golden_signal())
    # 16 kHz / hop 240 set: signal length chosen so hop does not divide T
    # here either (16000 + 131 = 16131; 16131 % 240 = 51)
    _write_set(out_dir, "dsp_golden16k", HP16(),
               golden_signal(T=16000 + 131, sr=16000))


if __name__ == "__main__":
    main()
