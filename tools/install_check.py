#!/usr/bin/env python
# coding: utf-8
"""Installed-package smoke test (run from OUTSIDE the repo, with the
package pip-installed from the sdist — `make install-check` drives it).

Asserts the artifact a user downloads actually works: the package imports
from site-packages (not a repo checkout), the console scripts resolve,
and a tiny model synthesizes audio end-to-end on CPU (text -> frontend ->
fused decode -> converter -> Griffin-Lim). Reference packaging surface:
setup.py:70-106, release.sh.
"""

import os
import sys


def main():
    assert "repo" not in os.getcwd(), (
        "run from outside the repo so the installed package is imported")

    import jax

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    import deepvoice3_pytorch_tpu as pkg

    pkg_dir = os.path.dirname(pkg.__file__)
    assert "site-packages" in pkg_dir, (
        "imported %s — not the installed package" % pkg_dir)

    import numpy as np

    from deepvoice3_pytorch_tpu.dsp.audio import AudioProcessor
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.synthesis import tts_batch

    hp = default_hparams()
    hp.parse("text_embed_dim=32,encoder_channels=16,decoder_channels=16,"
             "converter_channels=16,outputs_per_step=4,downsample_step=1")
    cfg, params = build_model(hp, en.n_vocab)
    ap = AudioProcessor(hp)
    out = tts_batch(params, cfg, ap, en,
                    ["installed package smoke test."],
                    max_decoder_steps=12)
    wav = np.asarray(out[0]["waveform"])
    assert wav.ndim == 1 and wav.size > ap.hop_size, wav.shape
    assert np.isfinite(wav).all()
    print("install-check OK: %s synthesized %d samples from %s"
          % (pkg.__name__, wav.size, pkg_dir))
    return 0


if __name__ == "__main__":
    sys.exit(main())
