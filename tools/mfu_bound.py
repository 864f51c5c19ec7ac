#!/usr/bin/env python
# coding: utf-8
"""Attainable-MFU bound for the b64 bf16 train step (round-4 verdict #4).

The measured step is 19.26 ms / 54.6% MFU (tapsum lowering, DESIGN.md
§4.1). This tool answers "is that near the wall, or is there headroom?"
with arithmetic instead of narrative:

  1. Trace the EXACT production train step (bench.py's b64 bf16 config,
     tapsum conv lowering) to a jaxpr — pure CPU work, no TPU needed —
     and walk it recursively for every dot_general, forward and backward.
  2. Per GEMM, compute the v5e roofline time:
        t = max(  2*Mp*Kp*Np / peak_rate(dtype),       # MXU, tile-padded
                  (bytes(lhs)+bytes(rhs)+bytes(out)) / HBM_BW )
     with Mp = ceil(M/8)*8 (sublane stream granularity),
     Kp/Np = ceil(*/128)*128 (lane/MXU tile), peak 197 TFLOP/s for bf16
     and 197/3 for f32 dots (bf16x3 decomposition — f32 dots remain only
     in the f32 loss/stat epilogue).
  3. Sum -> the minimum time the step's GEMM work alone can take on this
     chip if every non-GEMM op were free and all GEMM HBM traffic were
     perfectly fused. model_flops / (197e12 * T_gemm) is then an UPPER
     bound on attainable MFU.
  4. A realistic attainable adds the two measured irreducible non-GEMM
     terms from DESIGN.md §4.1's ablations: optimizer update 1.18 ms and
     dropout mask generation 1.2 ms (rbg, already the fast generator).

Run: python tools/mfu_bound.py   (CPU; ~1 min)
"""
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax                                    # noqa: E402
import jax.numpy as jnp                       # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    import jax.extend
    jax.extend.backend.clear_backends()
except Exception:
    pass

PEAK_BF16 = 197e12       # v5e MXU, bf16 (the bench's MFU denominator)
F32_DERATE = 3.0         # f32 dot = bf16x3 multipass
HBM_BW = 819e9           # v5e HBM GB/s

MEASURED_STEP_MS = 19.26         # DESIGN.md §4.1 (tapsum, b64 bf16)
MEASURED_OPT_MS = 1.18           # optimizer ablation (round 3)
MEASURED_DROPOUT_MS = 1.2        # dropout-noise ablation (round 3)


def _collect_dots(jaxpr, dots):
    for eqn in jaxpr.eqns:
        # recurse into HOFs (scan/while/cond/pjit/custom_*)
        for k, v in eqn.params.items():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                if hasattr(item, "jaxpr"):       # ClosedJaxpr
                    _collect_dots(item.jaxpr, dots)
                elif hasattr(item, "eqns"):      # raw Jaxpr
                    _collect_dots(item, dots)
        if eqn.primitive.name == "dot_general":
            lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
            out = eqn.outvars[0].aval
            dn = eqn.params["dimension_numbers"]
            (lc, rc), (lb, rb) = dn
            batch = int(np.prod([lhs.shape[i] for i in lb])) if lb else 1
            K = int(np.prod([lhs.shape[i] for i in lc])) if lc else 1
            M = int(np.prod([s for i, s in enumerate(lhs.shape)
                             if i not in lc and i not in lb]))
            N = int(np.prod([s for i, s in enumerate(rhs.shape)
                             if i not in rc and i not in rb]))
            dt = str(out.dtype)
            in_dt = str(lhs.dtype)
            dots.append((batch, M, K, N, in_dt, dt,
                         lhs.shape, rhs.shape, out.shape))
        elif eqn.primitive.name.startswith("conv_general"):
            raise RuntimeError("unexpected convolution HLO under tapsum: %s"
                               % (eqn,))


def roofline(batch, M, K, N, in_dt, out_dt):
    isz = 2 if "bfloat16" in in_dt else 4
    osz = 2 if "bfloat16" in out_dt else 4
    Mp = -(-M // 8) * 8
    Kp = -(-K // 128) * 128
    Np = -(-N // 128) * 128
    rate = PEAK_BF16 if "bfloat16" in in_dt else PEAK_BF16 / F32_DERATE
    t_mxu = batch * 2.0 * Mp * Kp * Np / rate
    by = batch * (isz * (M * K + K * N) + osz * M * N)
    t_hbm = by / HBM_BW
    flops = batch * 2.0 * M * K * N
    return flops, t_mxu, t_hbm, max(t_mxu, t_hbm)


def main():
    from bench import _LJ_PARSE
    from deepvoice3_pytorch_tpu.frontend import en
    from deepvoice3_pytorch_tpu.hparams import default_hparams
    from deepvoice3_pytorch_tpu.model_builder import build_model
    from deepvoice3_pytorch_tpu.training import trainer

    jax.config.update("jax_default_prng_impl", "rbg")

    hp = default_hparams()
    hp.parse(_LJ_PARSE)
    cfg, params = build_model(hp, en.n_vocab)
    lc = trainer.loss_config_from_hparams(hp)
    opt = trainer.make_optimizer(hp, trainer.make_lr_fn(hp))
    mask = trainer.trainable_mask(params, cfg)
    step_fn = trainer.make_train_step(cfg, lc, opt, mask,
                                      compute_dtype="bfloat16")
    state = trainer.init_train_state(params, opt)

    B, T_text, T_lin = 64, 128, 512
    ds, r = hp.downsample_step, cfg.r
    T_mel = T_lin // ds
    T_dec = T_mel // r
    rs = np.random.RandomState(0)
    batch = {
        "x": rs.randint(1, en.n_vocab, (B, T_text)).astype(np.int32),
        "input_lengths": np.full((B,), T_text, np.int32),
        "mel": rs.rand(B, T_mel, hp.num_mels).astype(np.float32),
        "y": rs.rand(B, T_lin, hp.fft_size // 2 + 1).astype(np.float32),
        "text_positions": np.tile(np.arange(1, T_text + 1),
                                  (B, 1)).astype(np.int32),
        "frame_positions": np.tile(np.arange(1, T_dec + 1),
                                   (B, 1)).astype(np.int32),
        "done": np.zeros((B, T_dec, 1), np.float32),
        "target_lengths": np.full((B,), T_lin, np.int32),
    }
    batch = jax.tree.map(jnp.asarray, batch)

    jaxpr = jax.make_jaxpr(
        lambda s, b, r_: step_fn(s, b, r_))(state, batch,
                                            jax.random.PRNGKey(0))
    dots = []
    _collect_dots(jaxpr.jaxpr, dots)

    rows = []
    total_flops = total_t = total_mxu = total_hbm_t = 0.0
    by_shape = defaultdict(lambda: [0, 0.0, 0.0, 0.0])
    for batch_n, M, K, N, in_dt, out_dt, ls, rs_, os_ in dots:
        flops, t_mxu, t_hbm, t = roofline(batch_n, M, K, N, in_dt,
                                           out_dt)
        total_flops += flops
        total_t += t
        total_mxu += t_mxu
        total_hbm_t += t_hbm
        key = (batch_n, M, K, N, in_dt)
        agg = by_shape[key]
        agg[0] += 1
        agg[1] += flops
        agg[2] += t
        agg[3] += t_mxu

    print("%d dot_general ops; %.1f distinct shapes"
          % (len(dots), len(by_shape)))
    print("%-42s %5s %10s %10s %8s" % ("(batch, M, K, N, dtype)", "count",
                                       "GFLOP", "t_us", "bound"))
    items = sorted(by_shape.items(), key=lambda kv: -kv[1][2])
    for key, (cnt, fl, t, t_mxu_sum) in items[:20]:
        bound = "mxu" if t_mxu_sum >= t - 1e-12 else "hbm"
        print("%-42s %5d %10.2f %10.1f %8s"
              % (str(key), cnt, fl / 1e9, t * 1e6, bound))
    if len(items) > 20:
        rest = sum(v[2] for _, v in items[20:])
        print("  ... %d more shapes, %.2f ms" % (len(items) - 20,
                                                 rest * 1e3))

    t_gemm_ms = total_t * 1e3
    mfu_ub = total_flops / (PEAK_BF16 * total_t)
    t_real = total_t + (MEASURED_OPT_MS + MEASURED_DROPOUT_MS) / 1e3
    mfu_real = total_flops / (PEAK_BF16 * t_real)
    measured_mfu = total_flops / (PEAK_BF16 * MEASURED_STEP_MS / 1e3)

    print()
    print("GEMM flops (jaxpr dots):        %.3f TFLOP" % (total_flops / 1e12))
    print("sum per-GEMM roofline:          %.3f ms   (mxu %.3f / hbm %.3f)"
          % (t_gemm_ms, total_mxu * 1e3, total_hbm_t * 1e3))
    print("attainable MFU (GEMMs free-fused, non-GEMM free): %.1f%%"
          % (100 * mfu_ub))
    print("attainable MFU (+ measured optimizer %.2f ms + dropout %.2f ms):"
          " %.1f%%" % (MEASURED_OPT_MS, MEASURED_DROPOUT_MS, 100 * mfu_real))
    print("measured step %.2f ms -> %.1f%% of the realistic attainable"
          % (MEASURED_STEP_MS,
             100 * (t_real * 1e3) / MEASURED_STEP_MS))


if __name__ == "__main__":
    main()
