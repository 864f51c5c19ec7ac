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
