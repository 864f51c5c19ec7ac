#!/usr/bin/env python
# coding: utf-8
"""One-shot validation of the clean-room lws golden model against the REAL
lws binary — runnable the moment `pip install lws` becomes possible.

The build environment has zero egress, so the DSP parity chain anchors to
dsp/reference_model.py (clean-room float64 model of the lws conventions,
assumptions documented at reference_model.py:23-33 and DESIGN.md §3.1).
This script is the committed plan for discharging that residual risk
(round-2 verdict missing #2 / advisor finding #2): it compares, on the
golden signal used by tools/make_dsp_goldens.py,

  1. lws.lws(...).stft(y)        vs reference_model.stft      (framing,
     frame COUNT — the advisor flags the tail-frame convention as the most
     likely divergence — and window scale)
  2. lws.lws(...).istft(S)       vs reference_model.istft
  3. lws.lws(...).run_lws(|S|)   vs dsp.lws_phase.lws_run         (phase
     retrieval; compared via spectral convergence, not bitwise — iteration
     order differs)

Exit 0 = conventions match (print max deviations); exit 1 with a diff
report = regenerate the goldens with tools/make_dsp_goldens.py and revisit
DESIGN.md §3.1.
"""

import sys

import numpy as np


def main():
    try:
        import lws
    except ImportError:
        print("The real `lws` package is not installed (this environment "
              "has no egress). Install it (`pip install lws`) and re-run; "
              "until then the clean-room golden model "
              "(dsp/reference_model.py) is the parity anchor.")
        return 2

    from deepvoice3_pytorch_tpu.dsp import reference_model as rm
    from tools.make_dsp_goldens import golden_signal  # deterministic input

    fft_size, hop = 1024, 256
    y = golden_signal()
    proc = lws.lws(fft_size, hop, mode="speech")

    S_real = proc.stft(y)
    S_model = rm.stft(y, fft_size, hop)
    ok = True

    if S_real.shape != S_model.shape:
        ok = False
        print("FRAME-COUNT MISMATCH: lws.stft %s vs model %s — the "
              "ceil(T/hop) tail assumption is wrong; fix "
              "reference_model.num_frames and regenerate goldens"
              % (S_real.shape, S_model.shape))
    else:
        n = min(len(S_real), len(S_model))
        scale = (np.abs(S_real[:n]).sum() + 1e-12) \
            / (np.abs(S_model[:n]).sum() + 1e-12)
        dev = np.abs(np.abs(S_real[:n]) - np.abs(S_model[:n])).max()
        print("stft: max |mag| deviation %.3e, global scale ratio %.6f "
              "(1.0 = window-scale assumption holds)" % (dev, scale))
        if abs(scale - 1.0) > 1e-3 or dev > 1e-3 * np.abs(S_real).max():
            ok = False

    y_rt = proc.istft(S_real)
    y_model = rm.istft(S_model, fft_size, hop)
    n = min(len(y_rt), len(y_model), len(y))
    dev = np.abs(y_rt[:n] - y_model[:n]).max()
    print("istft: max waveform deviation %.3e" % dev)
    if dev > 1e-6:
        ok = False

    mag = np.abs(S_real)
    wav_real = proc.istft(proc.run_lws(mag))
    from deepvoice3_pytorch_tpu.dsp import lws_phase

    win = rm.analysis_window(fft_size, hop)
    wav_ours = np.asarray(lws_phase.lws_run(mag, fft_size, hop, win))

    print("run_lws: spectral convergence real=%.4f ours=%.4f "
          "(comparable magnitudes = equivalent phase retrieval)"
          % (rm.spectral_convergence(wav_real, mag, fft_size, hop),
             rm.spectral_convergence(wav_ours, mag, fft_size, hop)))

    if not ok:
        print("\nCONVENTION MISMATCH — regenerate goldens "
              "(tools/make_dsp_goldens.py) and update DESIGN.md §3.1.")
        return 1
    print("\nOK: clean-room model matches the real lws binary.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
