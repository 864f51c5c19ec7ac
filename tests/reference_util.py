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
    import deepvoice3_pytorch  # noqa: F401
    return sys.modules["deepvoice3_pytorch"]


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
