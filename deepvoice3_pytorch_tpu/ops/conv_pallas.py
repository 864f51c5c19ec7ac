# coding: utf-8
"""Pallas tap-accumulating 1-D convolution: the HBM-traffic fix for tapsum.

Why this kernel exists (round-5 structural probe, DESIGN.md §4.1): the
train step's fastest XLA lowering expresses every kw>1 conv as kw shifted
(B·T, C)×(C, N) GEMMs that are then summed (ops/core.py CONV1D_MODE
"tapsum"). XLA cannot fuse one dot's output into another dot's
accumulator, so on TPU each tap's GEMM output round-trips through HBM
(kw writes + (kw-1) re-reads of the (B·T, N) intermediate) and each tap
re-reads the shifted input. The attainable-MFU bound (tools/mfu_bound.py)
prices exactly this: the HBM-bound tail of the step is the 256-channel
conv class whose arithmetic intensity the tap round-trips cap.

This kernel performs the whole tap sum inside one Pallas program with a
single f32 scratch accumulator in VMEM:

    read x block once -> kw shifted dots accumulate in VMEM -> write y once

HBM traffic per conv drops from ~kw·(|x| + 2|y|) to |x| + |y| — the
roofline optimum — while the MXU work is unchanged.

Padding is handled INSIDE the kernel as static per-tap slice bounds
(zero-padded rows contribute nothing, so tap j simply writes the
sub-range of output rows its input rows exist for; the tap whose shift
equals the left pad covers every row and doubles as the accumulator
init). This matters: a first version materialized `jnp.pad(x)` before
the call and measured SLOWER than tapsum (21.9 vs 19.3 ms/step b64
bf16) — XLA folds its own slice-of-pad into the GEMM operand loads, so
an explicit pad copy per conv per pass (~90/step over fwd+dgrad+wgrad)
erased the kernel's saving.

The backward pass gets the same treatment via jax.custom_vjp:

  * dx is itself a tap-accumulated conv of dy with flipped, transposed
    taps and mirrored padding (derivation in _pconv_bwd), so it reuses
    the forward kernel;
  * dw accumulates the kw per-tap (C, N) gradients across the batch grid
    inside one kernel (constant output index map — the TPU grid is
    sequential, so the block stays VMEM-resident and is written once).

The reference implements these convs as torch nn.Conv1d dispatched to
cuDNN (reference deepvoice3_pytorch/modules.py:94-100, conv.py:17-46);
this file is the TPU equivalent of "the library conv kernel", built on
the MXU's native GEMM shape instead of a translated im2col.

Numerics: inputs/weights in the caller's dtype (bf16 under the
mixed-precision step), accumulation in f32, one rounding at the output —
strictly tighter than XLA tapsum's per-tap rounding chain. Equivalence
is pinned in tests/test_conv_pallas.py.

Used when `ops.core.conv_lowering("pallas")` is in effect. `conv1d_pallas`
returns None when a call site falls outside the kernel's contract
(output length != input length, or no batch block fits VMEM) and the
caller falls back to tapsum — same graceful-fallback policy as
dsp/gl_pallas.py.

MEASURED RESULT (v5e, tools/conv_pallas_probe.py, 2026-08-20): the
in-kernel tap sum is a structural NEGATIVE on the production step —
full b64 bf16 train step 23.73 ms vs tapsum's 19.34 (-22.7%), and
forward-only 8.10 vs 6.51 ms, so the loss is proportional across
fwd/dgrad/wgrad rather than concentrated in one kernel. Reading: XLA
never actually pays the priced per-tap round-trips — its fusion folds
the shifted input loads into GEMM operand reads and keeps the running
tap sum in registers/VMEM across consecutive dots — while Mosaic's
per-tap `jnp.dot` sequence inside one kernel pipelines HBM prefetch
worse than XLA's independently scheduled GEMMs. The kernel therefore
stays OPT-IN (conv_mode="pallas"), kept as the recorded negative with
its exactness tests; tapsum remains the measured train-step default.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-program VMEM budget for block picking, counting Mosaic's input /
# output double buffering (2x the x and y blocks — measured: the
# compiler's scoped accounting for a 15.5 MB single-buffered estimate
# was 17.8 MB). The pallas_call itself raises the scoped-vmem limit to
# the device budget (below), so this constant only shapes block sizes
# for pipelining, it is not a hard ceiling.
_VMEM_BUDGET = 20 * 2 ** 20

# Target GEMM row count per grid step: big enough to amortize the MXU
# pipeline ramp (>= 8 sublane tiles at 8x128), small enough to fit the
# budget at production channel widths.
_ROW_TARGET = 4096


def _interp():
    return jax.default_backend() != "tpu"


def _device_vmem_budget():
    """Scoped-vmem limit for the kernel (same policy as
    dsp/gl_pallas.py): ~78% of reported core VMEM, 100 MB fallback."""
    try:
        d = jax.devices()[0]
        cap = int(d.memory_stats().get("vmem_size_bytes", 0))
        if cap > 0:
            return int(cap * 0.78)
    except Exception:
        pass
    return 100 * 1024 * 1024


def _compiler_params():
    if _interp():
        return None
    return pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                                vmem_limit_bytes=_device_vmem_budget())


def _pick_bb(B, T, C, N, kw, in_isz, out_isz):
    """Largest batch-block divisor of B whose working set fits VMEM.

    Working set per grid step: double-buffered x block (bb,T,C) and
    output block (bb,T,N), weights (kw,C,N), the f32 scratch accumulator
    (bb,T,N,4), and the f32 dw block (kw,C,N,4) (only wgrad holds the
    last, but one formula serves both — it only errs conservative).
    None = nothing fits, caller falls back to the XLA tapsum lowering.
    """
    cap = min(B, max(1, _ROW_TARGET // max(T, 1)))
    for bb in range(cap, 0, -1):
        if B % bb:
            continue
        need = (2 * bb * T * C * in_isz + kw * C * N * in_isz
                + bb * T * N * (2 * out_isz + 4) + kw * C * N * 4)
        if need <= _VMEM_BUDGET:
            return bb
    return None


def _tap_bounds(T, pl_, j, dil):
    """Output-row range [t0, t1) that tap j contributes to, and the
    x-row offset of its first contribution. y[t] += x[t + j*dil - pl] W_j
    wherever the x row exists; zero-padded rows contribute nothing."""
    t0 = max(0, pl_ - j * dil)
    t1 = min(T, T + pl_ - j * dil)
    return t0, t1, t0 + j * dil - pl_


def _tap_order(kw, T, pl_, dil):
    """Taps ordered so a fully-covering tap (if any) comes first and can
    initialize the accumulator without a zero pass."""
    order = sorted(range(kw),
                   key=lambda j: _tap_bounds(T, pl_, j, dil)[0]
                   - _tap_bounds(T, pl_, j, dil)[1])
    j0 = order[0]
    t0, t1, _ = _tap_bounds(T, pl_, j0, dil)
    full = (t0 == 0 and t1 == T)
    return order, full


def _fwd_kernel(*refs, kw, dil, T, pl_, with_bias):
    if with_bias:
        x_ref, w_ref, b_ref, o_ref, acc_ref = refs
    else:
        x_ref, w_ref, o_ref, acc_ref = refs
    x = x_ref[...]                                   # (bb, T, C)
    order, full = _tap_order(kw, T, pl_, dil)
    if not full:
        acc_ref[...] = jnp.zeros_like(acc_ref)
    for n, j in enumerate(order):
        t0, t1, x0 = _tap_bounds(T, pl_, j, dil)
        if t0 >= t1:
            continue                                 # tap entirely in pad
        tap = jax.lax.slice_in_dim(x, x0, x0 + (t1 - t0), axis=1)
        d = jax.lax.dot_general(tap, w_ref[j],
                                (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if n == 0 and full:
            acc_ref[...] = d                         # covers all rows
        else:
            acc_ref[:, t0:t1, :] += d
    acc = acc_ref[...]
    if with_bias:
        acc = acc + b_ref[...].astype(jnp.float32)   # (1, N) broadcasts
    o_ref[...] = acc.astype(o_ref.dtype)


def _launch_fwd(x, w, b, pad, dil):
    """y[b,t] = sum_j x_zeropad[b, t + j*dil - pad[0]] @ w[j] (+ bias).
    Returns None if no batch block fits VMEM."""
    B, T, C = x.shape
    kw, _, N = w.shape
    bb = _pick_bb(B, T, C, N, kw, x.dtype.itemsize, x.dtype.itemsize)
    if bb is None:
        return None
    kernel = functools.partial(_fwd_kernel, kw=kw, dil=dil, T=T,
                               pl_=pad[0], with_bias=b is not None)
    in_specs = [pl.BlockSpec((bb, T, C), lambda i: (i, 0, 0)),
                pl.BlockSpec((kw, C, N), lambda i: (0, 0, 0))]
    args = [x, w]
    if b is not None:
        in_specs.append(pl.BlockSpec((1, N), lambda i: (0, 0)))
        args.append(b.reshape(1, N))
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bb, T, N), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, T, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bb, T, N), jnp.float32)],
        interpret=_interp(),
        compiler_params=_compiler_params(),
    )(*args)


def _wgrad_kernel(x_ref, dy_ref, o_ref, *, kw, dil, T, pl_):
    # One (kw, C, N) f32 block, constant index map: the TPU grid is
    # sequential, so the block stays resident and accumulates across
    # batch-block steps; Pallas writes it back once at the end.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[...]                                   # (bb, T, C)
    bb, _, N = dy_ref.shape
    C = x.shape[-1]
    g = dy_ref[...]
    for j in range(kw):
        t0, t1, x0 = _tap_bounds(T, pl_, j, dil)
        if t0 >= t1:
            continue
        m = t1 - t0
        tap = jax.lax.slice_in_dim(x, x0, x0 + m, axis=1)
        gj = jax.lax.slice_in_dim(g, t0, t1, axis=1)
        # Mosaic's tpu.matmul wants exactly one contracting dim: flatten
        # (batch-block, time) into the K dimension.
        contrib = jax.lax.dot_general(tap.reshape(bb * m, C),
                                      gj.reshape(bb * m, N),
                                      (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        o_ref[j, :, :] += contrib


def _launch_wgrad(x, dy, pad, dil, kw):
    B, T, C = x.shape
    N = dy.shape[-1]
    bb = _pick_bb(B, T, C, N, kw, x.dtype.itemsize, dy.dtype.itemsize)
    if bb is None:
        return None
    kernel = functools.partial(_wgrad_kernel, kw=kw, dil=dil, T=T,
                               pl_=pad[0])
    return pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[pl.BlockSpec((bb, T, C), lambda i: (i, 0, 0)),
                  pl.BlockSpec((bb, T, N), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((kw, C, N), lambda i: (0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((kw, C, N), jnp.float32),
        interpret=_interp(),
        compiler_params=_compiler_params(),
    )(x, dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pconv(x, w, b, pad, dil):
    return _launch_fwd(x, w, b, pad, dil)


def _pconv_fwd(x, w, b, pad, dil):
    return _launch_fwd(x, w, b, pad, dil), (x, w)


def _pconv_bwd(pad, dil, res, dy):
    # Derivation. Forward: y[t] = sum_j xp[t + j*d] W_j with
    # xp = zeropad(x, (pl, pr)) and pl + pr = (kw-1)*d. Then
    #   dx[u] = sum_j [0 <= u + pl - j*d < T] dy[u + pl - j*d] W_j^T.
    # Substituting j' = kw-1-j and dyp = zeropad(dy, (pr, pl)):
    #   dx[u] = sum_j' dyp[u + j'*d] (W_{kw-1-j'})^T
    # — the forward kernel again, with taps flipped+transposed and the
    # padding swapped. (Causal check: fwd pad ((kw-1)d, 0) gives dgrad
    # pad (0, (kw-1)d) — anti-causal, as it must be.)
    x, w = res
    kw = w.shape[0]
    wflip = jnp.flip(w, axis=0).transpose(0, 2, 1)       # (kw, N, C)
    dx = _launch_fwd(dy, wflip, None, (pad[1], pad[0]), dil)
    dw = _launch_wgrad(x, dy, pad, dil, kw)
    if dx is None or dw is None:  # conv1d_pallas prechecks both layouts
        raise RuntimeError("pallas conv bwd lost VMEM feasibility")
    db = jnp.sum(dy.astype(jnp.float32), axis=(0, 1))
    return dx, dw.astype(w.dtype), db.astype(dy.dtype)


_pconv.defvjp(_pconv_fwd, _pconv_bwd)


def conv1d_pallas(x, w, b, pad, dil):
    """Tap-accumulated conv1d, differentiable. Returns None when the call
    falls outside the kernel contract (caller falls back to tapsum):
    output length must equal input length (pl+pr == (kw-1)*dil) and a
    batch block must fit the VMEM budget.

    x: (B, T, C)   w: (kw, C, N)   b: (N,)   pad: (pl, pr) static.
    """
    kw = w.shape[0]
    pl_, pr_ = pad
    if pl_ + pr_ != (kw - 1) * dil:
        return None
    B, T, C = x.shape
    N = w.shape[2]
    isz = x.dtype.itemsize
    # Feasibility must hold for every launch the custom_vjp can make:
    # forward (C -> N), dgrad (N -> C — the working sets differ when
    # C != N), and wgrad (same block shapes as forward). Committing to
    # the Pallas path on the forward check alone would raise mid-step
    # in _pconv_bwd for C_in >> C_out shapes near the budget boundary.
    if (_pick_bb(B, T, C, N, kw, isz, isz) is None
            or _pick_bb(B, T, N, C, kw, isz, isz) is None):
        return None
    return _pconv(x, w, b, (pl_, pr_), dil)
