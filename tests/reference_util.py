# coding: utf-8
"""Helpers to load the PyTorch reference (read-only at /root/reference) for
numerical parity tests, and to convert its weights into our pytree layouts.

The reference package is imported as-is (never copied); its generated
version.py is absent, so a stub module is registered first.
"""
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def import_reference():
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "deepvoice3_pytorch.version" not in sys.modules:
        vm = types.ModuleType("deepvoice3_pytorch.version")
        vm.__version__ = "0.0-reference"
        sys.modules["deepvoice3_pytorch.version"] = vm
    _stub_optional_deps()
    import deepvoice3_pytorch  # noqa: F401
    return sys.modules["deepvoice3_pytorch"]


def _stub_optional_deps():
    """The reference's text pipeline imports unidecode/inflect, absent here.
    Register thin stubs backed by our own implementations so the reference
    frontend can be imported for comparison tests."""
    if "unidecode" not in sys.modules:
        try:
            import unidecode  # noqa: F401
        except ImportError:
            from deepvoice3_pytorch_tpu.frontend.text.cleaners import \
                _unidecode
            m = types.ModuleType("unidecode")
            m.unidecode = _unidecode
            sys.modules["unidecode"] = m
    if "inflect" not in sys.modules:
        try:
            import inflect  # noqa: F401
        except ImportError:
            from deepvoice3_pytorch_tpu.frontend.text import numbers as nums

            class _Engine:
                def number_to_words(self, n, andword="and", zero="zero",
                                    group=0, **kw):
                    if isinstance(n, str) and n[-2:] in ("st", "nd", "rd",
                                                         "th"):
                        return nums.ordinal_to_words(int(n[:-2]))
                    if group == 2:
                        # reference does .replace(', ', ' ') right after, so
                        # returning the space-joined form is equivalent
                        return nums.number_to_words_grouped2(n, zero=zero)
                    return nums.number_to_words(n)

            m = types.ModuleType("inflect")
            m.engine = lambda: _Engine()
            sys.modules["inflect"] = m
    # reference frontend/en calls nltk.corpus.cmudict.dict() at import time;
    # without the corpus data downloaded that raises LookupError — stub it
    try:
        import nltk.corpus
        try:
            nltk.corpus.cmudict.ensure_loaded()
        except Exception:
            nltk.corpus.cmudict = types.SimpleNamespace(dict=lambda: {})
    except ImportError:
        pass


def import_reference_train():
    """Import /root/reference/train.py in place (as module ``ref_train``) so
    training-dynamics parity tests can drive the reference's actual loss
    assembly (spec_loss, MaskedL1Loss, guided_attentions, sequence_mask —
    reference train.py:261-601) through torch autograd.

    The module's heavy/unavailable deps (docopt, numba, nnmnkwii, librosa,
    lws) are stubbed: none of them participate in the loss math — numba's
    @jit is a pure speedup on guided_attention, which runs fine as plain
    Python at test shapes."""
    import importlib.util

    if "ref_train" in sys.modules:
        return sys.modules["ref_train"]
    import_reference()

    def _stub(name, **attrs):
        if name in sys.modules:
            return sys.modules[name]
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    _stub("docopt", docopt=lambda *a, **k: {})
    # numba.jit(nopython=True) -> identity decorator (guided_attention then
    # executes as plain Python; test shapes are tiny)
    _stub("numba", jit=lambda *a, **k: (lambda f: f))
    nn_mod = _stub("nnmnkwii")
    ds_mod = _stub("nnmnkwii.datasets",
                   FileSourceDataset=type("FileSourceDataset", (), {}),
                   FileDataSource=type("FileDataSource", (), {}))
    nn_mod.datasets = ds_mod
    lr_mod = _stub("librosa")
    lr_mod.__path__ = []  # mark as package so `import librosa.X` resolves
    for sub in ("display", "filters", "core", "effects"):
        setattr(lr_mod, sub, _stub("librosa." + sub))
    _stub("lws")

    spec = importlib.util.spec_from_file_location(
        "ref_train", REFERENCE_ROOT + "/train.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_train"] = mod
    spec.loader.exec_module(mod)
    return mod


def torch_linear_params(m):
    """torch weight-normed Linear -> our {'v','g','b'} layout (in, out)."""
    v = m.weight_v.detach().numpy()          # (out, in)
    g = m.weight_g.detach().numpy().reshape(-1)   # (out,)
    b = m.bias.detach().numpy()
    return {"v": np.ascontiguousarray(v.T), "g": g, "b": b}


def torch_conv1d_params(m):
    """torch weight-normed Conv1d -> our layout (kw, in, out)."""
    v = m.weight_v.detach().numpy()          # (out, in, kw)
    g = m.weight_g.detach().numpy().reshape(-1)
    b = m.bias.detach().numpy()
    return {"v": np.ascontiguousarray(v.transpose(2, 1, 0)), "g": g, "b": b}


def torch_conv_transpose1d_params(m):
    """torch weight-normed ConvTranspose1d (in, out, kw) -> (kw, in, out)."""
    v = m.weight_v.detach().numpy()          # (in, out, kw)
    g = m.weight_g.detach().numpy().reshape(-1)   # (in,)
    b = m.bias.detach().numpy()
    return {"v": np.ascontiguousarray(v.transpose(2, 0, 1)), "g": g, "b": b}


def torch_embedding_params(m):
    return {"w": m.weight.detach().numpy()}
