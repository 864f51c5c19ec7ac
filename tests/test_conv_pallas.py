# coding: utf-8
"""Pallas tap-accumulating conv kernel (ops/conv_pallas.py) equivalence.

The kernel is the round-5 structural fix for XLA tapsum's per-tap HBM
round-trips (DESIGN.md §4.1, attainable-MFU bound). These tests pin, on
the CPU interpreter (same code path as TPU modulo the Mosaic backend):

  * forward equivalence with the tapsum lowering (same tap order; the
    kernel accumulates in f32, so the tolerance is the f32 dot class);
  * custom_vjp gradients (dx, dv, dg, db) against autodiff through the
    tapsum lowering, for causal and dilated layouts;
  * the graceful fallback: call sites outside the kernel contract
    (length-changing padding) silently lower to tapsum.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvoice3_pytorch_tpu.ops import conv_pallas, core


def _params(rs, kw, cin, cout, dtype=np.float32):
    return {"g": jnp.asarray(rs.randn(cout).astype(dtype)),
            "v": jnp.asarray(rs.randn(kw, cin, cout).astype(dtype)),
            "b": jnp.asarray((rs.randn(cout) * 0.1).astype(dtype))}


@pytest.mark.parametrize("kw,dilation,causal,B", [
    (3, 1, False, 2), (5, 3, False, 4), (3, 9, True, 2), (3, 1, True, 1),
])
def test_forward_matches_tapsum(kw, dilation, causal, B):
    rs = np.random.RandomState(0)
    p = _params(rs, kw, 16, 32)
    x = jnp.asarray(rs.randn(B, 40, 16).astype(np.float32))
    with core.conv_lowering("tapsum"):
        want = core.conv1d_apply(p, x, dilation=dilation, causal=causal)
    with core.conv_lowering("pallas"):
        got = core.conv1d_apply(p, x, dilation=dilation, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("kw,dilation,causal", [
    (3, 1, False), (3, 3, True),
])
def test_gradients_match_tapsum_autodiff(kw, dilation, causal):
    rs = np.random.RandomState(1)
    p = _params(rs, kw, 8, 16)
    x = jnp.asarray(rs.randn(2, 24, 8).astype(np.float32))

    def loss(mode):
        def f(p, x):
            with core.conv_lowering(mode):
                y = core.conv1d_apply(p, x, dilation=dilation, causal=causal)
            return jnp.sum(jnp.sin(y))   # nonlinear: exercises dy != const
        return jax.grad(f, argnums=(0, 1))(p, x)

    want = loss("tapsum")
    got = loss("pallas")
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)


def test_bf16_forward_is_at_least_as_tight_as_tapsum():
    # The kernel accumulates taps in f32 and rounds once; bf16 tapsum
    # rounds per tap. Both must sit within the bf16 class of the f32
    # ground truth.
    rs = np.random.RandomState(2)
    p32 = _params(rs, 3, 32, 32)
    x32 = jnp.asarray(rs.randn(2, 32, 32).astype(np.float32))
    with core.conv_lowering("tapsum"):
        truth = core.conv1d_apply(p32, x32)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
    x16 = x32.astype(jnp.bfloat16)
    with core.conv_lowering("pallas"):
        got = core.conv1d_apply(p16, x16)
    assert got.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - truth)))
    assert err < 0.1, err   # bf16 class at these magnitudes


def test_fallback_outside_contract():
    # length-changing padding (pl+pr != (kw-1)*dil) is outside the kernel
    # contract: conv1d_pallas must decline (None), never mis-launch.
    rs = np.random.RandomState(3)
    w = jnp.asarray(rs.randn(2, 8, 8).astype(np.float32))
    b = jnp.zeros((8,), jnp.float32)
    x = jnp.asarray(rs.randn(1, 16, 8).astype(np.float32))
    assert conv_pallas.conv1d_pallas(x, w, b, (0, 0), 1) is None


def test_vmem_infeasible_falls_back(monkeypatch):
    monkeypatch.setattr(conv_pallas, "_VMEM_BUDGET", 1024)  # nothing fits
    rs = np.random.RandomState(4)
    p = _params(rs, 3, 8, 8)
    x = jnp.asarray(rs.randn(2, 16, 8).astype(np.float32))
    with core.conv_lowering("tapsum"):
        want = core.conv1d_apply(p, x)
    with core.conv_lowering("pallas"):
        got = core.conv1d_apply(p, x)     # silently tapsum
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_batch_block_divisor_picking():
    # bb must divide B and respect the row target; B prime -> bb == 1.
    assert conv_pallas._pick_bb(64, 128, 256, 512, 3, 2, 2) == 16
    assert conv_pallas._pick_bb(64, 512, 256, 512, 3, 2, 2) == 4
    assert conv_pallas._pick_bb(7, 512, 256, 512, 3, 2, 2) == 7
    assert conv_pallas._pick_bb(7, 4096, 256, 512, 3, 2, 2) is None


def test_declines_when_only_backward_is_infeasible():
    # The custom_vjp's dgrad launch swaps C and N, so its working set is
    # larger than the forward's when C_in > C_out. conv1d_pallas must
    # precheck BOTH layouts and decline up front — committing on the
    # forward check alone would raise mid-train-step in _pconv_bwd
    # (review finding, round 5: B=1, T=1500, C=1024, N=128, kw=3 f32 is
    # forward-feasible but dgrad-infeasible at the default budget).
    B, T, C, N, kw = 1, 1500, 1024, 128, 3
    assert conv_pallas._pick_bb(B, T, C, N, kw, 4, 4) is not None
    assert conv_pallas._pick_bb(B, T, N, C, kw, 4, 4) is None
    rs = np.random.RandomState(5)
    w = jnp.asarray(rs.randn(kw, C, N).astype(np.float32))
    b = jnp.zeros((N,), jnp.float32)
    x = jnp.asarray(rs.randn(B, T, C).astype(np.float32))
    assert conv_pallas.conv1d_pallas(x, w, b, (kw - 1, 0), 1) is None
