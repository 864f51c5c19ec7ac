# coding: utf-8
"""Device mesh + sharding layer — first-class in this framework even though
the reference is strictly single-device (SURVEY §2.x: no DP/TP/PP anywhere).

Design: a ('data', 'model') mesh.
  * 'data'  — batch axis. The loader shards each batch across it; with
    replicated params, jit emits a psum gradient all-reduce over ICI.
  * 'model' — tensor-parallel axis. Wide conv stacks (encoder/converter)
    shard their out-channel dimension; XLA GSPMD inserts the halo/all-reduce
    collectives. model=1 (pure DP) is the default and is what the batch-16
    reference workload wants; the axis exists so the same program scales to
    tp>1 without code changes.

Everything is mesh-axis-generic: axes come from the same Mesh object, so a
multi-slice DCN mesh only changes make_mesh()'s device array.
"""

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1, devices=None):
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None or n_data <= 0:
        n_data = len(devices) // n_model
    if n_data < 1 or n_data * n_model > len(devices):
        raise ValueError(
            "mesh %dx%d needs %d devices, have %d"
            % (max(n_data, 1), n_model, max(n_data, 1) * n_model,
               len(devices)))
    use = n_data * n_model
    dev_array = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh):
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def seq_sharding(mesh):
    """Megatron-style sequence parallelism: (B, T, ...) activations shard
    batch over 'data' AND time over 'model' (sp reuses the tp axis — the
    same ranks that hold a weight shard hold a frame shard, so the
    halo/all-gather collectives ride the intra-slice ICI). XLA GSPMD
    propagates this sharding through the conv stacks (halo exchange) and
    attention (query rows are time-sharded; keys/values stay replicated)."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


# batch keys whose axis 1 is a frame/time axis long enough to be worth
# sequence-sharding (the big activations that seed GSPMD propagation)
_SEQ_KEYS = ("mel", "y")


def shard_batch(mesh, batch, *, sp: bool = False):
    """Place a pytree of host arrays with leading batch dims on the mesh.

    sp=True additionally shards the time axis of the large frame-aligned
    arrays (mel/linear targets) over 'model' — see seq_sharding()."""
    s = batch_sharding(mesh)
    s_seq = seq_sharding(mesh) if sp else s

    def put(k, x):
        if x is None:
            return None
        return jax.device_put(x, s_seq if k in _SEQ_KEYS else s)

    return {k: put(k, v) for k, v in batch.items()}


# ---------------------------------------------------------------------------
# tensor-parallel param shardings
# ---------------------------------------------------------------------------


def param_shardings(params, mesh, *, tp: bool = False):
    """PartitionSpec pytree for the params.

    With tp=False everything is replicated. With tp=True, conv/linear kernels
    shard their output-channel axis over 'model' where it is large enough to
    tile (>= 2 * mesh model size * 128 would be ideal; we use a simple >= 2 *
    model-size rule since XLA pads internally).
    """
    n_model = mesh.shape[MODEL_AXIS]

    def spec_for(path, x):
        if not tp or n_model <= 1 or x.ndim == 0:
            return P()
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if leaf == "v" and x.ndim == 3 and x.shape[-1] % n_model == 0:
            return P(None, None, MODEL_AXIS)     # conv (kw, in, out)
        if leaf == "v" and x.ndim == 2 and x.shape[-1] % n_model == 0:
            return P(None, MODEL_AXIS)           # linear (in, out)
        # g/b stay replicated: cheap, and convT's g indexes the *input*
        # channel (torch weight_norm dim=0 on (in, out, kw)), not out
        return P()

    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, spec_for(p, x)), params)


def shard_params(params, mesh, *, tp: bool = False):
    shardings = param_shardings(params, mesh, tp=tp)
    return jax.tree.map(jax.device_put, params, shardings)
