# coding: utf-8
"""Native (C++) runtime components, loaded via ctypes.

Two libraries, mirroring where the reference leans on native code:

  * dv3_dsp  — host STFT/mel feature extraction + Griffin-Lim inversion, the
               C++ analogue of the reference's lws extension
               (reference audio.py:9,31-55). Used by dataset preprocessors on
               CPU-only hosts; the TPU path (dsp/stft.py) is unchanged.
  * dv3_loader — threaded .npy batch loader + padded collate, the native
               analogue of the reference's DataLoader worker processes
               (reference train.py:965-968).

The shared library is built on first use with g++ (no pip deps); every entry
point degrades gracefully: `is_available()` is False and callers fall back to
the pure-Python path.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIB_PATH = os.path.join(_HERE, "libdv3native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    srcs = [os.path.join(_SRC, "dv3_dsp.cc"),
            os.path.join(_SRC, "dv3_loader.cc")]
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
           "-o", _LIB_PATH] + srcs
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            src_mtime = max(os.path.getmtime(p) for p in
                            [os.path.join(_SRC, f)
                             for f in os.listdir(_SRC)])
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < src_mtime):
                _build()
            lib = ctypes.CDLL(_LIB_PATH)
        except Exception:
            return None

        lib.dv3_num_frames.restype = ctypes.c_int
        lib.dv3_num_frames.argtypes = [ctypes.c_long, ctypes.c_int,
                                       ctypes.c_int]
        fp = ctypes.POINTER(ctypes.c_float)
        lp = ctypes.POINTER(ctypes.c_long)
        lib.dv3_features.restype = None
        lib.dv3_features.argtypes = [
            fp, ctypes.c_long, ctypes.c_int, ctypes.c_int, fp, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, fp, fp]
        lib.dv3_features_batch.restype = None
        lib.dv3_features_batch.argtypes = [
            fp, lp, ctypes.c_int, ctypes.c_int, ctypes.c_int, fp,
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            fp, fp, ctypes.c_int]
        lib.dv3_inv_spectrogram.restype = None
        lib.dv3_inv_spectrogram.argtypes = [
            fp, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_int, ctypes.c_float,
            ctypes.c_float, ctypes.c_int, fp]
        lib.dv3_npy_shape.restype = ctypes.c_int
        lib.dv3_npy_shape.argtypes = [ctypes.c_char_p, lp]
        lib.dv3_load_padded_batch.restype = ctypes.c_int
        lib.dv3_load_padded_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_long,
            ctypes.c_long, ctypes.c_long, fp, lp, ctypes.c_int]
        _lib = lib
        return _lib


def is_available():
    return _load() is not None


def _as_f32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def features(y, mel_basis, fft_size, hop_size, preemphasis=0.97,
             min_level_db=-100.0, ref_level_db=20.0):
    """wav (T,) -> (linear (n, F), mel (n, M)), both normalized [0,1]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP unavailable (no compiler?)")
    y = _as_f32(y)
    mel_w = _as_f32(mel_basis)
    n_mels = mel_w.shape[0]
    n = lib.dv3_num_frames(len(y), fft_size, hop_size)
    F = fft_size // 2 + 1
    linear = np.empty((n, F), np.float32)
    mel = np.empty((n, n_mels), np.float32)
    lib.dv3_features(_fptr(y), len(y), fft_size, hop_size, _fptr(mel_w),
                     n_mels, preemphasis, min_level_db, ref_level_db,
                     _fptr(linear), _fptr(mel))
    return linear, mel


def features_batch(wavs, mel_basis, fft_size, hop_size, preemphasis=0.97,
                   min_level_db=-100.0, ref_level_db=20.0, n_threads=0):
    """List of ragged wavs -> list of (linear, mel), on a C++ thread pool."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP unavailable (no compiler?)")
    mel_w = _as_f32(mel_basis)
    n_mels = mel_w.shape[0]
    F = fft_size // 2 + 1
    wavs = [_as_f32(w) for w in wavs]
    lengths = np.asarray([len(w) for w in wavs], np.int64)
    packed = (np.concatenate(wavs) if wavs
              else np.zeros((0,), np.float32))
    frames = [lib.dv3_num_frames(int(n), fft_size, hop_size) for n in lengths]
    total = int(np.sum(frames))
    linear = np.empty((total, F), np.float32)
    mel = np.empty((total, n_mels), np.float32)
    lib.dv3_features_batch(
        _fptr(packed), lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        len(wavs), fft_size, hop_size, _fptr(mel_w), n_mels, preemphasis,
        min_level_db, ref_level_db, _fptr(linear), _fptr(mel), n_threads)
    out, off = [], 0
    for nf in frames:
        out.append((linear[off:off + nf].copy(), mel[off:off + nf].copy()))
        off += nf
    return out


def inv_spectrogram(spec_nf, fft_size, hop_size, power=1.4,
                    min_level_db=-100.0, ref_level_db=20.0, n_iters=60,
                    momentum=0.99, preemphasis=0.97, phase_init="zero"):
    """Normalized linear (n, F) -> waveform (n*hop,).

    phase_init: "zero" (classic GL) or "spsi" (per-bin interpolated-
    frequency integration — matches the device default, dsp/stft.py)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native DSP unavailable (no compiler?)")
    spec = _as_f32(spec_nf)
    n_frames = spec.shape[0]
    wav = np.empty((n_frames * hop_size,), np.float32)
    lib.dv3_inv_spectrogram(_fptr(spec), n_frames, fft_size, hop_size, power,
                            min_level_db, ref_level_db, n_iters, momentum,
                            preemphasis, 1 if phase_init == "spsi" else 0,
                            _fptr(wav))
    return wav


def npy_shape(path):
    """(rows, cols) of a float32 C-order npy file, or None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    shape = np.zeros((2,), np.int64)
    rc = lib.dv3_npy_shape(
        str(path).encode(), shape.ctypes.data_as(
            ctypes.POINTER(ctypes.c_long)))
    return (int(shape[0]), int(shape[1])) if rc == 0 else None


def load_padded_batch(paths, max_rows, cols, row_offset=0, n_threads=0):
    """Read float32 npy files into a zero-padded (B, max_rows, cols) batch,
    each item's rows starting at row_offset (collate b_pad semantics).

    Returns (batch, rows) where rows[i] is the true row count (-1 on a file
    the native parser couldn't handle — caller falls back to numpy for it).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no compiler?)")
    n = len(paths)
    batch = np.empty((n, max_rows, cols), np.float32)
    rows = np.empty((n,), np.int64)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.dv3_load_padded_batch(
        arr, n, max_rows, cols, row_offset, _fptr(batch),
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), n_threads)
    return batch, rows
