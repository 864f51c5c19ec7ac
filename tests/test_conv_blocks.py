# coding: utf-8
"""Conv1dGLU / HighwayConv1d / attention parity vs the PyTorch reference,
plus the incremental ≡ batch equivalence contract (reference tests/test_conv.py)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from deepvoice3_pytorch_tpu.ops import conv_blocks as cb
from deepvoice3_pytorch_tpu.ops import attention as attn_ops

from reference_util import (
    import_reference, torch_linear_params, torch_conv1d_params)

import_reference()
from deepvoice3_pytorch import modules as ref_modules  # noqa: E402
from deepvoice3_pytorch.deepvoice3 import AttentionLayer  # noqa: E402

ATOL = 1e-5


def _glu_params_from_torch(m):
    p = {"conv": torch_conv1d_params(m.conv)}
    if m.speaker_proj is not None:
        p["speaker_proj"] = torch_linear_params(m.speaker_proj)
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("causal,dilation,residual", [
    (False, 1, True), (False, 3, True), (True, 1, False), (True, 27, True),
])
def test_conv1d_glu_parity(causal, dilation, residual):
    torch.manual_seed(0)
    m = ref_modules.Conv1dGLU(1, 16, 24, 24, kernel_size=5, dropout=0.1,
                              dilation=dilation, causal=causal,
                              residual=residual).eval()
    spec = cb.glu_spec(24, 24, 5, dilation, causal, residual, 4.0, 0.1)
    p = _glu_params_from_torch(m)
    x = np.random.RandomState(0).randn(2, 24, 30).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = cb.spec_apply(p, spec, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=ATOL)


def test_conv1d_glu_multispeaker_parity():
    torch.manual_seed(0)
    m = ref_modules.Conv1dGLU(4, 16, 24, 24, kernel_size=3, dropout=0.1,
                              dilation=1, causal=False, residual=True).eval()
    spec = cb.glu_spec(24, 24, 3, 1, False, True, 4.0, 0.1, multispeaker=True)
    p = _glu_params_from_torch(m)
    x = np.random.RandomState(0).randn(2, 24, 30).astype(np.float32)
    se = np.random.RandomState(1).randn(2, 30, 16).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(se)).numpy()
    got = cb.spec_apply(p, spec, jnp.asarray(x.transpose(0, 2, 1)),
                        speaker_embed_btc=jnp.asarray(se))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=ATOL)


@pytest.mark.parametrize("glu,causal,dilation", [
    (False, False, 3), (False, True, 9), (True, True, 1),
])
def test_highway_conv_parity(glu, causal, dilation):
    torch.manual_seed(0)
    m = ref_modules.HighwayConv1d(20, 20, kernel_size=3, dilation=dilation,
                                  causal=causal, dropout=0.1, glu=glu).eval()
    spec = cb.highway_spec(20, 20, 3, dilation, causal, 0.1, glu=glu)
    p = jax.tree.map(jnp.asarray, {"conv": torch_conv1d_params(m.conv)})
    x = np.random.RandomState(0).randn(2, 20, 25).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x)).numpy()
    got = cb.spec_apply(p, spec, jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=ATOL)


@pytest.mark.parametrize("kw,dilation", [(1, 1), (2, 1), (3, 1), (5, 1),
                                         (3, 3), (3, 9), (5, 27), (2, 4)])
def test_incremental_equals_batch_conv(kw, dilation):
    """Our step path ≡ full-sequence causal conv (reference tests/test_conv.py:10-63)."""
    rng = jax.random.PRNGKey(42)
    B, T, C = 3, 64, 8
    spec = cb.glu_spec(C, C, kw, dilation, True, True, 4.0, 0.0)
    p = cb.spec_init(rng, spec)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, C))

    batch_out = cb.spec_apply(p, spec, x)

    state = cb.spec_init_state(spec, B)
    outs = []
    for t in range(T):
        state, y = cb.spec_step(p, spec, state, x[:, t, :])
        outs.append(y)
    step_out = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(step_out), np.asarray(batch_out),
                               atol=1e-5)


def test_incremental_equals_batch_highway():
    rng = jax.random.PRNGKey(7)
    B, T, C = 2, 40, 12
    spec = cb.highway_spec(C, C, 3, 9, True, 0.0)
    p = cb.spec_init(rng, spec)
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, C))
    batch_out = cb.spec_apply(p, spec, x)
    state = cb.spec_init_state(spec, B)
    outs = []
    for t in range(T):
        state, y = cb.spec_step(p, spec, state, x[:, t, :])
        outs.append(y)
    np.testing.assert_allclose(np.asarray(jnp.stack(outs, axis=1)),
                               np.asarray(batch_out), atol=1e-5)


def _attn_params_from_torch(m):
    p = {"query_proj": torch_linear_params(m.query_projection),
         "out_proj": torch_linear_params(m.out_projection)}
    if m.key_projection is not None:
        p["key_proj"] = torch_linear_params(m.key_projection)
    if m.value_projection is not None:
        p["value_proj"] = torch_linear_params(m.value_projection)
    return jax.tree.map(jnp.asarray, p)


@pytest.mark.parametrize("kproj,vproj", [(False, False), (True, True)])
def test_attention_parity(kproj, vproj):
    torch.manual_seed(0)
    m = AttentionLayer(32, 32, dropout=0.1, key_projection=kproj,
                       value_projection=vproj).eval()
    spec = attn_ops.AttentionSpec(32, 32, 0.1, key_projection=kproj,
                                  value_projection=vproj)
    p = _attn_params_from_torch(m)
    rs = np.random.RandomState(0)
    q = rs.randn(2, 9, 32).astype(np.float32)
    keys = rs.randn(2, 15, 32).astype(np.float32)
    values = rs.randn(2, 15, 32).astype(np.float32)
    # reference takes keys as (B, E, T_k) pre-transposed
    with torch.no_grad():
        want, want_attn = m(torch.from_numpy(q),
                            (torch.from_numpy(keys.transpose(0, 2, 1)),
                             torch.from_numpy(values)))
    got, got_attn = attn_ops.attention_apply(
        p, spec, jnp.asarray(q), jnp.asarray(keys), jnp.asarray(values))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(),
                               atol=ATOL)


def test_attention_window_parity():
    """Monotonic window masking vs reference (deepvoice3.py:150-156), B=1."""
    torch.manual_seed(3)
    m = AttentionLayer(16, 16, dropout=0.1, window_ahead=3,
                       window_backward=1).eval()
    spec = attn_ops.AttentionSpec(16, 16, 0.1, window_ahead=3,
                                  window_backward=1, key_projection=True,
                                  value_projection=True)
    p = _attn_params_from_torch(m)
    rs = np.random.RandomState(1)
    q = rs.randn(1, 1, 16).astype(np.float32)
    keys = rs.randn(1, 12, 16).astype(np.float32)
    values = rs.randn(1, 12, 16).astype(np.float32)
    for la in [0, 2, 5, 10, 11]:
        with torch.no_grad():
            want, want_attn = m(torch.from_numpy(q),
                                (torch.from_numpy(keys.transpose(0, 2, 1)),
                                 torch.from_numpy(values)),
                                last_attended=la)
        got, got_attn = attn_ops.attention_apply(
            p, spec, jnp.asarray(q), jnp.asarray(keys), jnp.asarray(values),
            last_attended=jnp.asarray([la]))
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=ATOL,
                                   err_msg=f"last_attended={la}")
        np.testing.assert_allclose(np.asarray(got_attn), want_attn.numpy(),
                                   atol=ATOL)


def test_attention_memory_mask():
    spec = attn_ops.AttentionSpec(16, 16, 0.0, key_projection=False,
                                  value_projection=False)
    p = attn_ops.attention_init(jax.random.PRNGKey(0), spec)
    q = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 16))
    v = jax.random.normal(jax.random.PRNGKey(3), (2, 10, 16))
    mask = jnp.arange(10)[None, :] >= jnp.asarray([6, 10])[:, None]
    _, attn = attn_ops.attention_apply(p, spec, q, k, v, mask=mask)
    assert float(jnp.abs(attn[0, :, 6:]).max()) == 0.0
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-6)
