# coding: utf-8
"""Fully-fused autoregressive decoder: the entire decode loop as ONE Pallas
TPU kernel.

This is the speed-of-light redesign of the reference's per-frame Python loop
(reference deepvoice3.py:397-473, conv.py:17-46). The scan-based path
(models/decode.py) already compiles the loop, but each step still issues a
dozen separate XLA ops whose operands (weights, projected keys/values) are
re-read from HBM every frame. At decode shapes (B~32, C~256) the arithmetic
per step is tiny, so HBM traffic and per-op overhead dominate.

Here the grid is (max_steps,) — sequential on TPU — and everything hot lives
in VMEM for the whole decode:

  * all decoder weights (weight-norm folded, a few MB)
  * projected attention keys/values (B, Tk, E)
  * conv ring buffers, the fed-back output frame, per-batch `last_attended`
    monotonic-attention state — VMEM scratch persisting across grid steps

Per step the kernel does the prenet/conv matmuls on the MXU, the windowed
single-head attention as VPU broadcast-reductions (Tk is small — the
reference caps text length at max_positions=512), and writes one frame of
output per grid index. HBM traffic per step = outputs only.

Semantics are identical to models/decode.decode_scan with
models/deepvoice3.make_decoder_step / nyanko.make_decoder_step (verified by
tests/test_fused_decode.py); inference-only (no dropout). Multi-speaker is
supported: per-sample query position rates are applied in-kernel on raw
angle rows, and the per-layer speaker softsign biases (constant per decode)
are precomputed outside and added before the GLU gate.
"""

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import core

SQRT_HALF = math.sqrt(0.5)
MASK = -1.0e9


# ---------------------------------------------------------------------------
# static layer plan + weight folding
# ---------------------------------------------------------------------------


def _fold_conv(p):
    """Weight-norm fold: (kw, in, out) effective per-tap weights + bias.

    Kept 3-D: the kernel does one matmul per tap and accumulates, rather
    than concatenating taps along the lane dim (a concat of sublane-sliced
    rows is an unimplemented Mosaic layout case)."""
    return core.conv1d_weight(p), p["b"]


def _fold_linear(p):
    return core.linear_weight(p), p["b"]


def build_plan(params, cfg):
    """(static_plan, flat_weight_list) for a decoder config + its params.

    Plan ops (all static metadata):
      ("linear", act, widx)            x @ w + b, optional activation
      ("linear2", act, widx)           [attn_out, Q] @ W + b without the lane
                                       concat: x @ W_top + Q @ W_bot + b
      ("glu", kw, dil, residual, buf, widx)      causal GLU conv vs ring buf
      ("highway", kw, dil, buf, glu, widx)       causal highway conv
      ("attn", layer_idx, monotonic, back, ahead, widx)   x <- attention(x)
      ("save_residual",) / ("residual",)   outer residual * sqrt(.5)
      ("save_q",)                      stash x as Q (nyanko)
    Weight arrays are appended to `flat` in plan order; each consuming op
    records its start index.

    Dispatches on config family: DeepVoice3 DecoderConfig (prenet/convs/
    attention lists) vs NyankoDecoderConfig (audio_encoder/attention/
    audio_decoder).
    """
    plan = []
    flat = []
    buffers = []  # (length, channels) per ring buffer

    def push(*arrs):
        start = len(flat)
        flat.extend(arrs)
        return start

    n_sp = [0]   # speaker-bias slots (multi-speaker GLU softsign biases)

    def ring(s):
        if s.kernel_size > 1:
            # (kw-1)*dil rows hold exactly the past taps the dilated causal
            # conv needs (the incoming frame is tap kw-1 and bypasses the
            # buffer); row j*dil is tap j. No dead row 0.
            buffers.append(((s.kernel_size - 1) * s.dilation,
                            s.in_channels))
            return len(buffers) - 1
        return -1

    def sp_slot(s):
        if s.speaker_proj:
            n_sp[0] += 1
            return n_sp[0] - 1
        return -1

    def emit_stack(stack_params, specs, skip=0):
        for p, s in list(zip(stack_params, specs))[skip:]:
            if s.kind == "conv1x1":
                w, b = _fold_conv(p["conv"])    # kw==1 -> (1, cin, cout)
                plan.append(("linear", s.activation, push(w, b)))
            elif s.kind == "glu":
                w, b = _fold_conv(p["conv"])
                plan.append(("glu", s.kernel_size, s.dilation, s.residual,
                             ring(s), sp_slot(s), push(w, b)))
            elif s.kind == "highway":
                w, b = _fold_conv(p["conv"])
                plan.append(("highway", s.kernel_size, s.dilation, ring(s),
                             s.highway_glu, push(w, b)))
            else:
                raise NotImplementedError(
                    "fused decode: unsupported spec kind %s" % s.kind)

    if hasattr(cfg, "audio_encoder"):
        # ----- nyanko (DCTTS) decoder -----
        emit_stack(params["audio_encoder"], cfg.audio_encoder)
        plan.append(("save_q",))
        a_spec = cfg.attention_spec
        wq, bq = _fold_linear(params["attention"]["query_proj"])
        wo, bo = _fold_linear(params["attention"]["out_proj"])
        plan.append(("attn", 0, bool(cfg.force_monotonic_attention),
                     a_spec.window_backward, a_spec.window_ahead,
                     push(wq, bq, wo, bo)))
        # first audio_decoder layer consumes concat([R, Q]): split its
        # (2D -> D) weight into the R/Q halves instead of a lane concat
        first = params["audio_decoder"][0]
        s0 = cfg.audio_decoder[0]
        assert s0.kind == "conv1x1"
        w, b = _fold_conv(first["conv"])        # (1, 2D, D)
        D = w.shape[1] // 2
        plan.append(("linear2", s0.activation,
                     push(w[:, :D, :], w[:, D:, :], b)))
        emit_stack(params["audio_decoder"], cfg.audio_decoder, skip=1)
        n_att = 1
    else:
        # ----- deepvoice3 decoder -----
        emit_stack(params["prenet"], cfg.prenet_specs)
        n_att = 0
        for idx, (p, s, p_attn, a_spec) in enumerate(zip(
                params["convs"], cfg.conv_specs, params["attention"],
                cfg.attention_specs)):
            plan.append(("save_residual",))
            w, b = _fold_conv(p["conv"])
            plan.append(("glu", s.kernel_size, s.dilation, False, ring(s),
                         sp_slot(s), push(w, b)))
            if a_spec is not None:
                wq, bq = _fold_linear(p_attn["query_proj"])
                wo, bo = _fold_linear(p_attn["out_proj"])
                plan.append(("attn", n_att,
                             bool(cfg.force_monotonic_attention[idx]),
                             a_spec.window_backward, a_spec.window_ahead,
                             push(wq, bq, wo, bo)))
                n_att += 1
            plan.append(("residual",))

    w, b = _fold_conv(params["last_conv"])
    last = push(w, b)
    wf, bf = _fold_linear(params["fc"])
    fc = push(wf, bf)
    return ((tuple(plan), tuple(buffers), last, fc, n_att, n_sp[0]), flat)


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------


def _softmax_lastdim(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _first_argmax(x):
    """First index of the row max — jnp.argmax semantics via min-reduce
    (robust Mosaic lowering)."""
    tk = x.shape[-1]
    m = jnp.max(x, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.min(jnp.where(x >= m, col, tk), axis=-1).astype(jnp.int32)


def _make_kernel(plan_pack, n_att, out_dim, state_dim, tk, fpe_raw,
                 fpe_per_sample=False, per_sample_scale=False):
    plan, buffers, last_idx, fc_idx, _, n_sp = plan_pack
    n_buf = len(buffers)

    def kernel(*refs):
        # refs layout:
        #   fpe_ref (T, C) — query position table (raw angles or encodings)
        #       — or (B, T, C) per-sample rows when fpe_per_sample
        #       (continuous batching: each slot decodes at its own local
        #       position; requires fpe_raw)
        #   wq_ref (B, 1) — per-sample query position rate (fpe_raw mode)
        #   scale_ref (B, 1) — per-sample attention context scale, when
        #       per_sample_scale: the reference scales the context by
        #       sqrt(memory length) (deepvoice3.py:169-171), which depends
        #       on the PADDED text length — a serving batch whose text
        #       dimension grows mid-stream must keep each slot's scale
        #       frozen at its admission bucket
        #   mask_ref (B, Tk) additive mask (0 valid / MASK padded)
        #   init_ref (B, out_dim) initial input frame (carry-in)
        #   la_in_ref (B, max(n_att,1)) int32 last_attended carry-in
        #   buf_in refs: n_buf ring-buffer carry-ins (B, L, C)
        #   kv refs: n_att * (keys (B,Tk,E), values (B,Tk,E))
        #   sp refs: n_sp * (B, cout) speaker softsign biases
        #   weight refs: flat list from build_plan
        #   out refs: out (1,B,out), align (1,B,Tk), done (1,B,1),
        #             dec_state (1,B,C), then carry-outs prev (B,out),
        #             la (B,max(n_att,1)), ring buffers (B,L,C)...
        # The carry-out refs (constant index map — VMEM-resident across the
        # whole grid) double as the working state, replacing scratch; they
        # are initialized from the carry-ins at t==0 so a chunked caller can
        # resume the decode exactly where the previous launch stopped.
        i = 0
        fpe_ref = refs[i]; i += 1
        wq_ref = refs[i] if fpe_raw else None
        i += 1 if fpe_raw else 0
        scale_ref = refs[i] if per_sample_scale else None
        i += 1 if per_sample_scale else 0
        mask_ref = refs[i]; i += 1
        init_ref = refs[i]; i += 1
        la_in_ref = refs[i]; i += 1
        buf_in_refs = refs[i:i + n_buf]; i += n_buf
        kv_refs = refs[i:i + 2 * n_att]; i += 2 * n_att
        sp_refs = refs[i:i + n_sp]; i += n_sp
        n_w = fc_idx + 2  # fc's (w, b) are the last two flat weights
        w_refs = refs[i:i + n_w]; i += n_w
        out_ref, align_ref, done_ref, dstate_ref = refs[i:i + 4]; i += 4
        prev_ref, la_ref = refs[i:i + 2]; i += 2
        buf_refs = refs[i:]

        t = pl.program_id(0)

        @pl.when(t == 0)
        def _init():
            prev_ref[...] = init_ref[...]
            la_ref[...] = la_in_ref[...]
            for br, bi in zip(buf_refs, buf_in_refs):
                br[...] = bi[...]

        x = prev_ref[...]
        if fpe_per_sample:
            ang = fpe_ref[:, pl.ds(t, 1), :][:, 0, :]   # (B, C) slot rows
        else:
            ang = fpe_ref[pl.ds(t, 1), :]       # (1, C) row t of the table
        if fpe_raw:
            # per-sample rate: y = w*ang, then sin on even / cos on odd
            # columns (ops/positional.py:sinusoidal_encoding; position >= 1
            # so the padding branch never applies)
            y = wq_ref[...] * ang               # (B, C)
            col = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            fpe = jnp.where(col % 2 == 0, jnp.sin(y), jnp.cos(y))
        else:
            fpe = ang                           # (1, C) already encoded
        addmask = mask_ref[...]                 # (B, Tk)
        ave_align = jnp.zeros((x.shape[0], tk), jnp.float32)
        residual = x
        q_saved = x

        def matmul(a, w, b):
            return jnp.dot(a, w, preferred_element_type=jnp.float32) + b[None, :]

        for op in plan:
            if op[0] == "linear":
                _, act, widx = op
                x = matmul(x, w_refs[widx][0], w_refs[widx + 1][...])
                if act == "relu":
                    x = jnp.maximum(x, 0.0)
                elif act == "sigmoid":
                    x = jax.nn.sigmoid(x)
            elif op[0] == "glu":
                _, kw, dil, res, buf, sp, widx = op
                w = w_refs[widx]                 # (kw, cin, 2*cout) ref
                b = w_refs[widx + 1][...]
                inp = x
                if buf >= 0:
                    # past tap j (j<kw-1) sits at row j*dil of the shifted
                    # buffer; the incoming frame is tap kw-1 and bypasses it.
                    # Accumulate one matmul per tap — no lane concat.
                    L = buffers[buf][0]
                    old = buf_refs[buf][...]
                    y = jnp.dot(inp, w[kw - 1],
                                preferred_element_type=jnp.float32)
                    for j in range(kw - 1):
                        tap = old[:, j * dil, :]
                        y = y + jnp.dot(tap, w[j],
                                        preferred_element_type=jnp.float32)
                    y = y + b[None, :]
                    if L > 1:
                        buf_refs[buf][:, :L - 1, :] = old[:, 1:, :]
                    buf_refs[buf][:, L - 1, :] = inp
                else:
                    y = matmul(inp, w[0], b)
                a, g = jnp.split(y, 2, axis=-1)
                if sp >= 0:
                    a = a + sp_refs[sp][...]     # speaker softsign bias
                x = a * jax.nn.sigmoid(g)
                if res:
                    x = (x + inp) * SQRT_HALF
            elif op[0] == "highway":
                _, kw, dil, buf, glu, widx = op
                w = w_refs[widx]
                b = w_refs[widx + 1][...]
                inp = x
                if buf >= 0:
                    L = buffers[buf][0]
                    old = buf_refs[buf][...]
                    y = jnp.dot(inp, w[kw - 1],
                                preferred_element_type=jnp.float32)
                    for j in range(kw - 1):
                        y = y + jnp.dot(old[:, j * dil, :], w[j],
                                        preferred_element_type=jnp.float32)
                    y = y + b[None, :]
                    if L > 1:
                        buf_refs[buf][:, :L - 1, :] = old[:, 1:, :]
                    buf_refs[buf][:, L - 1, :] = inp
                else:
                    y = matmul(inp, w[0], b)
                a, g = jnp.split(y, 2, axis=-1)
                if glu:
                    x = (a * jax.nn.sigmoid(g) + inp) * SQRT_HALF
                else:
                    gate = jax.nn.sigmoid(g)
                    x = gate * a + (1.0 - gate) * inp
            elif op[0] == "linear2":
                _, act, widx = op
                x = (jnp.dot(x, w_refs[widx][0],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(q_saved, w_refs[widx + 1][0],
                               preferred_element_type=jnp.float32)
                     + w_refs[widx + 2][...][None, :])
                if act == "relu":
                    x = jnp.maximum(x, 0.0)
                elif act == "sigmoid":
                    x = jax.nn.sigmoid(x)
            elif op[0] == "save_q":
                q_saved = x
            elif op[0] == "save_residual":
                residual = x
            elif op[0] == "residual":
                x = (x + residual) * SQRT_HALF
            elif op[0] == "attn":
                _, a_idx, monotonic, w_back, w_ahead, widx = op
                keys = kv_refs[2 * a_idx][...]       # (B, Tk, E)
                values = kv_refs[2 * a_idx + 1][...]
                q = x + fpe                          # fpe (B, C) or (1, C)
                qp = matmul(q, w_refs[widx][...], w_refs[widx + 1][...])
                s = jnp.sum(keys * qp[:, None, :], axis=-1)       # (B, Tk)
                s = s + addmask
                if monotonic:
                    la_full = la_ref[...]
                    la = la_full[:, a_idx:a_idx + 1]              # (B, 1)
                    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                    win = (col < la - w_back) | (col >= la + w_ahead)
                    s = jnp.where(win, MASK, s)
                attn = _softmax_lastdim(s)
                if monotonic:
                    new_la = _first_argmax(attn)[:, None]         # (B, 1)
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, la_full.shape, 1)
                    la_ref[...] = jnp.where(lane == a_idx, new_la, la_full)
                ctx = jnp.sum(attn[:, :, None] * values, axis=1)  # (B, E)
                if per_sample_scale:
                    ctx = ctx * scale_ref[...]        # (B, 1) broadcast
                else:
                    ctx = ctx * (tk * math.sqrt(1.0 / tk))
                o = matmul(ctx, w_refs[widx + 2][...], w_refs[widx + 3][...])
                x = (o + q) * SQRT_HALF
                ave_align = ave_align + attn
            else:
                raise AssertionError(op)

        dstate_ref[0] = x
        y = matmul(x, w_refs[last_idx][0], w_refs[last_idx + 1][...])
        out = jax.nn.sigmoid(y)
        out_ref[0] = out
        prev_ref[...] = out
        done = jax.nn.sigmoid(
            matmul(y, w_refs[fc_idx][...], w_refs[fc_idx + 1][...]))
        done_ref[0] = done                      # (B, 1)
        align_ref[0] = ave_align / max(n_att, 1)

    return kernel


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------


# Conservative per-core VMEM budget for the whole-loop kernel. v5e VMEM is
# 128 MiB; leave headroom for output blocks, double buffering, and compiler
# scratch. Above this the caller should use the scan path.
VMEM_BUDGET_BYTES = 64 * 1024 * 1024


def vmem_bytes_estimate(params, cfg, batch, tk):
    """Rough resident-VMEM footprint of the fused kernel: folded weights +
    projected K/V + ring buffers + a few activation blocks, all f32."""
    plan_pack, flat = build_plan(params, cfg)
    _, buffers, _, _, n_att, n_sp = plan_pack
    total = sum(int(np.prod(w.shape)) for w in flat) * 4
    # nyanko attends in `channels` dims; deepvoice3 in `embed_dim`
    e = (cfg.channels if hasattr(cfg, "channels") else cfg.embed_dim)
    total += n_att * 2 * batch * tk * e * 4             # keys/values
    total += sum(batch * L * C * 4 for (L, C) in buffers)
    total += 8 * batch * max(tk, 1024) * 4              # blocks/scratch slop
    return total


class _Prepared:
    """Launch-invariant state for one decoder: folded weights, projected
    K/V, masks — prepared ONCE so a chunked caller doesn't re-fold weights
    inside its while_loop body (XLA does not reliably hoist that)."""

    def __init__(self, params, cfg, projected_kv, mask, *, w_query,
                 speaker_bias, fpe_raw, fpe_per_sample=False,
                 ctx_scale=None):
        self.plan_pack, flat = build_plan(params, cfg)
        _, self.buffers, _, _, self.n_att, n_sp = self.plan_pack
        kv = [p for p in projected_kv if p is not None]
        assert len(kv) == self.n_att
        assert len(speaker_bias or []) == n_sp, \
            "need %d speaker-bias arrays, got %r" % (n_sp, speaker_bias)
        keys0 = kv[0][0]
        self.B, self.tk = keys0.shape[0], keys0.shape[1]
        self.out_dim = cfg.in_dim * cfg.r
        self.state_dim = (cfg.channels if hasattr(cfg, "channels")
                          else cfg.convolutions[0][0])
        self.fpe_raw = fpe_raw
        f32 = jnp.float32
        self.addmask = (jnp.where(mask, MASK, 0.0).astype(f32)
                        if mask is not None
                        else jnp.zeros((self.B, self.tk), f32))
        self.wq = (jnp.asarray(w_query, f32).reshape(self.B, 1)
                   if fpe_raw else None)
        self.kv = [(k.astype(f32), v.astype(f32)) for k, v in kv]
        self.sp = [sb.astype(f32) for sb in (speaker_bias or [])]
        self.flat = [w.astype(f32) for w in flat]
        # fpe_per_sample works in BOTH position modes: raw angles get the
        # per-sample rate applied in-kernel (deepvoice3 family); finished
        # encodings (nyanko) are gathered per sample and used directly —
        # continuous batching admits either family mid-stream.
        # ctx_scale (B,): per-sample attention context scale (admission-
        # frozen sqrt(padded text length) for serving batches whose text
        # dimension grows); None = the static sqrt(Tk) of this launch.
        self.scale = (None if ctx_scale is None
                      else jnp.asarray(ctx_scale, f32).reshape(self.B, 1))
        self.kernel = _make_kernel(self.plan_pack, self.n_att, self.out_dim,
                                   self.state_dim, self.tk, fpe_raw,
                                   fpe_per_sample=fpe_per_sample,
                                   per_sample_scale=ctx_scale is not None)

    def zero_carry(self):
        f32 = jnp.float32
        la = jnp.zeros((self.B, max(self.n_att, 1)), jnp.int32)
        bufs = tuple(jnp.zeros((self.B, L, C), f32)
                     for (L, C) in self.buffers)
        return la, bufs

    def launch(self, fpe_chunk, prev, la, bufs, steps, interpret):
        """One kernel launch of `steps` frames from carry (prev, la, bufs).

        Returns ((outputs, aligns, done, dstates) in (B, steps, ...) layout,
        (prev', la', bufs') carry after the last frame)."""
        B, tk, out_dim, state_dim = (self.B, self.tk, self.out_dim,
                                     self.state_dim)
        f32 = jnp.float32

        def full():
            return pl.BlockSpec(memory_space=pltpu.VMEM)

        inputs = [fpe_chunk.astype(f32)]
        if self.fpe_raw:
            inputs.append(self.wq)
        if self.scale is not None:
            inputs.append(self.scale)
        inputs += [self.addmask, prev.astype(f32), la]
        inputs += list(bufs)
        for k, v in self.kv:
            inputs += [k, v]
        inputs += self.sp
        inputs += self.flat
        in_specs = [full() for _ in inputs]

        out_shape = [
            jax.ShapeDtypeStruct((steps, B, out_dim), f32),
            jax.ShapeDtypeStruct((steps, B, tk), f32),
            jax.ShapeDtypeStruct((steps, B, 1), f32),
            jax.ShapeDtypeStruct((steps, B, state_dim), f32),
            jax.ShapeDtypeStruct((B, out_dim), f32),          # prev carry
            jax.ShapeDtypeStruct((B, max(self.n_att, 1)), jnp.int32),
        ]
        out_shape += [jax.ShapeDtypeStruct((B, L, C), f32)
                      for (L, C) in self.buffers]
        out_specs = [
            pl.BlockSpec((1, B, out_dim), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, tk), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, state_dim), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        # carry-outs: constant index map — stay VMEM-resident across the
        # grid (they ARE the working state) and write back once at the end
        out_specs += [full() for _ in range(2 + len(self.buffers))]

        outs = pl.pallas_call(
            self.kernel,
            grid=(steps,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(*inputs)

        outputs, aligns, done, dstates = outs[:4]
        prev2, la2 = outs[4], outs[5]
        bufs2 = tuple(outs[6:])
        # (T, B, ...) -> (B, T, ...)
        return ((jnp.swapaxes(outputs, 0, 1), jnp.swapaxes(aligns, 0, 1),
                 jnp.swapaxes(done[..., 0], 0, 1),
                 jnp.swapaxes(dstates, 0, 1)),
                (prev2, la2, bufs2))


def fused_decode(params, cfg, projected_kv, fpe_table, mask, initial_input,
                 max_steps, *, w_query=None, speaker_bias=None,
                 fpe_raw=False, interpret=None):
    """Run the decoder for max_steps frames in one Pallas kernel.

    Args:
        params: decoder params (weight-normalized; folded here).
        cfg: DecoderConfig / NyankoDecoderConfig.
        projected_kv: [(keys, values)] per attention layer (None entries
            dropped), from decoder_precompute.
        fpe_table: (max_steps, C) query position rows for t=1..max_steps —
            final encodings, or raw angles when fpe_raw (per-sample rates).
        mask: (B, Tk) bool padding mask or None.
        initial_input: (B, in_dim*r).
        max_steps: static step count.
        w_query: (B,) per-sample query position rate (fpe_raw mode).
        speaker_bias: [(B, cout)] per multi-speaker GLU layer, in plan order
            (softsign(speaker_proj(speaker_embed)), precomputed outside).

    Returns (outputs (B,T,out), aligns (B,T,Tk), done (B,T),
             dec_states (B,T,C)) — same layout as decode_scan before its
    length computation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    prep = _Prepared(params, cfg, projected_kv, mask, w_query=w_query,
                     speaker_bias=speaker_bias, fpe_raw=fpe_raw)
    la0, bufs0 = prep.zero_carry()
    outs, _ = prep.launch(fpe_table, initial_input, la0, bufs0, max_steps,
                          interpret)
    return outs


# frames per kernel launch for the early-exit path: small enough that a
# ~30-frame utterance wastes at most one chunk of compute, large enough
# that launch overhead stays negligible vs per-frame work
DEFAULT_CHUNK = 32


def fused_decode_chunked(params, cfg, projected_kv, fpe_table, mask,
                         initial_input, max_steps, min_steps, *, chunk=None,
                         w_query=None, speaker_bias=None, fpe_raw=False,
                         interpret=None):
    """Early-exit fused decode: the whole-loop kernel runs `chunk` frames
    per launch inside a lax.while_loop; the loop stops after the first
    chunk in which every sample's done latch has fired (reference stop rule
    deepvoice3.py:469-473, applied at chunk granularity — frame t is kept
    once done>0.5 with t+1>min_steps; per-sample lengths are recovered by
    the caller from the done sequence exactly as in decode_while).

    With a trained checkpoint decoding ~20-40 frames this costs 1-2 kernel
    launches instead of max_steps frames, closing the gap between the
    fixed-length fused headline and the real-checkpoint path.

    Returns (outputs, aligns, done, dstates, num_steps) with time buffers
    of length max_steps; frames past the stop chunk are zero (same
    convention as decode_while).
    """
    from jax import lax

    if chunk is None:
        chunk = DEFAULT_CHUNK
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    prep = _Prepared(params, cfg, projected_kv, mask, w_query=w_query,
                     speaker_bias=speaker_bias, fpe_raw=fpe_raw)
    B, tk = prep.B, prep.tk
    f32 = jnp.float32

    chunk = min(chunk, max_steps)
    n_chunks = -(-max_steps // chunk)
    total = n_chunks * chunk
    fpe = fpe_table.astype(f32)
    if fpe.shape[0] < total:
        # pad with the final row (the scan path's jnp.take clamps the same
        # way when max_decoder_steps exceeds the position table)
        fpe = jnp.concatenate(
            [fpe, jnp.repeat(fpe[-1:], total - fpe.shape[0], axis=0)])

    la0, bufs0 = prep.zero_carry()
    outbufs0 = (jnp.zeros((B, total, prep.out_dim), f32),
                jnp.zeros((B, total, tk), f32),
                jnp.zeros((B, total), f32),
                jnp.zeros((B, total, prep.state_dim), f32))

    def cond(carry):
        c, prev, la, bufs, outs, latch = carry
        return (c < n_chunks) & ~jnp.all(latch)

    def body(carry):
        c, prev, la, bufs, outs, latch = carry
        t0 = c * chunk
        fpe_c = lax.dynamic_slice_in_dim(fpe, t0, chunk, axis=0)
        (o, a, d, s), (prev2, la2, bufs2) = prep.launch(
            fpe_c, prev, la, bufs, chunk, interpret)
        outs = (lax.dynamic_update_slice_in_dim(outs[0], o, t0, 1),
                lax.dynamic_update_slice_in_dim(outs[1], a, t0, 1),
                lax.dynamic_update_slice_in_dim(outs[2], d, t0, 1),
                lax.dynamic_update_slice_in_dim(outs[3], s, t0, 1))
        gstep = t0 + jnp.arange(1, chunk + 1)             # 1-based frame no.
        latch = latch | jnp.any((d > 0.5) & (gstep[None, :] > min_steps),
                                axis=1)
        return (c + 1, prev2, la2, bufs2, outs, latch)

    carry = (jnp.int32(0), initial_input.astype(f32), la0, bufs0, outbufs0,
             jnp.zeros((B,), jnp.bool_))
    c, _, _, _, outs, _ = lax.while_loop(cond, body, carry)
    # trim the chunk-rounded buffers back to max_steps (scan-path layout)
    outs = tuple(o[:, :max_steps] for o in outs)
    return (outs[0], outs[1], outs[2], outs[3],
            jnp.minimum(c * chunk, max_steps))
