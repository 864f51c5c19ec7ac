# coding: utf-8
"""Numerical parity of core weight-normalized ops vs the PyTorch reference."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu.ops import core
from deepvoice3_pytorch_tpu.ops import positional

from reference_util import (
    import_reference, torch_linear_params, torch_conv1d_params,
    torch_conv_transpose1d_params)

ref = import_reference()
from deepvoice3_pytorch import modules as ref_modules  # noqa: E402

ATOL = 1e-5


def test_linear_parity():
    torch.manual_seed(0)
    m = ref_modules.Linear(24, 40, dropout=0.1).eval()
    p = torch_linear_params(m)
    x = np.random.RandomState(1).randn(3, 7, 24).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = np.asarray(core.linear_apply(jax.tree.map(jnp.asarray, p), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("kw,dilation,causal", [
    (1, 1, False), (3, 1, False), (5, 3, False), (3, 9, True), (5, 27, True),
])
def test_conv1d_parity(kw, dilation, causal):
    torch.manual_seed(0)
    padding = (kw - 1) * dilation if causal else (kw - 1) // 2 * dilation
    m = ref_modules.Conv1d(16, 32, kernel_size=kw, padding=padding,
                           dilation=dilation, std_mul=4.0, dropout=0.1).eval()
    p = torch_conv1d_params(m)
    T = 40
    x = np.random.RandomState(2).randn(2, 16, T).astype(np.float32)  # torch BCT
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    if causal:
        want = want[:, :, :T]  # reference trims future steps in the block
    got = core.conv1d_apply(jax.tree.map(jnp.asarray, p),
                            jnp.asarray(x.transpose(0, 2, 1)),
                            dilation=dilation, causal=causal)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=ATOL)


@pytest.mark.parametrize("kw,dilation,causal", [
    (3, 1, False), (5, 3, False), (3, 9, True), (5, 27, True),
])
def test_conv1d_lowering_modes_equivalent(kw, dilation, causal):
    """The three kw>1 conv lowerings (ops/core.py CONV1D_MODE) are the
    same convolution: tapsum (the measured-fastest TPU default — see
    DESIGN.md §4.1) and im2col must match XLA's conv HLO to f32
    tap-summation reassociation (~1e-6)."""
    from deepvoice3_pytorch_tpu.ops import core as core_mod

    rs = np.random.RandomState(4)
    p = {"g": jnp.asarray(rs.randn(32).astype(np.float32)),
         "v": jnp.asarray(rs.randn(kw, 16, 32).astype(np.float32)),
         "b": jnp.asarray(rs.randn(32).astype(np.float32) * 0.1)}
    x = jnp.asarray(rs.randn(2, 40, 16).astype(np.float32))

    outs = {}
    for mode in ("xla", "tapsum", "im2col"):
        with core_mod.conv_lowering(mode):
            outs[mode] = np.asarray(core_mod.conv1d_apply(
                p, x, dilation=dilation, causal=causal))
    np.testing.assert_allclose(outs["tapsum"], outs["xla"], atol=2e-5)
    np.testing.assert_allclose(outs["im2col"], outs["xla"], atol=2e-5)


def test_conv_lowering_is_context_dependent():
    """The conv lowering is selected per trace context (ops/core.py):
    the default (inference) trace emits XLA convolution HLO, while a
    trace under conv_lowering('tapsum') — what the train step does —
    emits only GEMMs. Both winners were measured on v5e (DESIGN.md
    §4.1): tapsum wins the train step by ~1.2 ms, xla wins the
    forward-only synthesis converter by ~2.8 ms."""
    import jax

    from deepvoice3_pytorch_tpu.ops import core as core_mod

    rs = np.random.RandomState(5)
    p = {"g": jnp.asarray(rs.randn(32).astype(np.float32)),
         "v": jnp.asarray(rs.randn(3, 16, 32).astype(np.float32)),
         "b": jnp.zeros((32,), jnp.float32)}
    x = jnp.asarray(rs.randn(2, 40, 16).astype(np.float32))

    def f_default(p, x):
        return core_mod.conv1d_apply(p, x)

    def f_train(p, x):
        with core_mod.conv_lowering("tapsum"):
            return core_mod.conv1d_apply(p, x)

    assert core_mod.current_conv_mode() == "xla"  # inference default
    assert core_mod.CONV1D_MODE_TRAIN == "tapsum"  # train default
    hlo_default = jax.jit(f_default).lower(p, x).as_text()
    hlo_train = jax.jit(f_train).lower(p, x).as_text()
    assert "convolution" in hlo_default
    assert "convolution" not in hlo_train
    assert core_mod.current_conv_mode() == "xla"  # context restored
    np.testing.assert_allclose(np.asarray(f_train(p, x)),
                               np.asarray(f_default(p, x)), atol=2e-5)


def test_conv_transpose1d_parity():
    torch.manual_seed(0)
    m = ref_modules.ConvTranspose1d(16, 16, kernel_size=2, stride=2, padding=0,
                                    std_mul=1.0).eval()
    p = torch_conv_transpose1d_params(m)
    x = np.random.RandomState(3).randn(2, 16, 11).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = core.conv_transpose1d_apply(jax.tree.map(jnp.asarray, p),
                                      jnp.asarray(x.transpose(0, 2, 1)),
                                      stride=2)
    assert got.shape == (2, 22, 16)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=ATOL)


def test_init_matches_weight_norm_decomposition():
    # at init, weight-normed effective weight == raw sampled v
    p = core.conv1d_init(jax.random.PRNGKey(0), 8, 16, 3, std_mul=4.0)
    w = core.conv1d_weight(p)
    np.testing.assert_allclose(np.asarray(w), np.asarray(p["v"]), atol=1e-6)


@pytest.mark.parametrize("w", [0.5, 1.0, 2.0, 10.0, 20.0])
def test_sinusoidal_encoding_scalar_rate(w):
    # reference: SinusoidalEncoding table transform + embedding lookup
    torch.manual_seed(0)
    enc = ref_modules.SinusoidalEncoding(32, 16).eval()
    pos = torch.arange(0, 30).remainder(32).reshape(2, 15)
    with torch.no_grad():
        want = enc(pos, w).numpy()
    table = positional.position_encoding_init(32, 16, position_rate=1.0,
                                              sinusoidal=False)
    got = positional.sinusoidal_encoding(jnp.asarray(pos.numpy()),
                                         jnp.asarray(table), w)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_sinusoidal_encoding_per_batch_rate():
    torch.manual_seed(0)
    enc = ref_modules.SinusoidalEncoding(64, 24).eval()
    pos = torch.arange(1, 21).unsqueeze(0).expand(3, 20).clone()
    w = torch.tensor([0.7, 1.3, 4.2])
    with torch.no_grad():
        want = enc(pos, w).numpy()
    table = positional.position_encoding_init(64, 24, position_rate=1.0,
                                              sinusoidal=False)
    got = positional.sinusoidal_encoding(jnp.asarray(pos.numpy()),
                                         jnp.asarray(table),
                                         jnp.asarray(w.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_position_encoding_init_parity():
    want = ref_modules.position_encoding_init(48, 20, position_rate=2.37,
                                              sinusoidal=True).numpy()
    got = positional.position_encoding_init(48, 20, position_rate=2.37,
                                            sinusoidal=True)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_glu_and_softsign():
    x = np.random.RandomState(0).randn(4, 6, 10).astype(np.float32)
    want = torch.nn.functional.glu(torch.from_numpy(x), dim=-1).numpy()
    got = np.asarray(core.glu(jnp.asarray(x), axis=-1))
    np.testing.assert_allclose(got, want, atol=1e-6)
    want2 = torch.nn.functional.softsign(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(np.asarray(core.softsign(jnp.asarray(x))),
                               want2, atol=1e-6)
