# coding: utf-8
"""Checkpointing (reference train.py:788-897): whole-model or
seq2seq/postnet halves, exact resume, shape-tolerant partial restore for
speaker adaptation, embedding-only load.

Format: a single msgpack file (flax.serialization) holding
{params, opt_state, global_step, global_epoch}. Torch `.pth` checkpoints from
the reference import via utils/torch_import.py.
"""

import os
import pickle
import queue
import threading
from os.path import join

import numpy as np
import jax
import jax.numpy as jnp

try:
    from flax import serialization as flax_ser
except ImportError:  # pragma: no cover
    flax_ser = None


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def _save_blob(blob, path):
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        if flax_ser is not None:
            f.write(flax_ser.msgpack_serialize(blob))
        else:
            pickle.dump(blob, f)
    os.replace(tmp, path)


def _load_blob(path):
    with open(path, "rb") as f:
        data = f.read()
    if flax_ser is not None:
        try:
            return flax_ser.msgpack_restore(data)
        except Exception:
            pass
    return pickle.loads(data)


def checkpoint_path(checkpoint_dir, step, suffix=""):
    return join(checkpoint_dir,
                "checkpoint_step{:09d}{}.ckpt".format(step, suffix))


class _AsyncWriter:
    """Single background thread that fetches device snapshots to host and
    serializes them, in submission order. Keeps the training loop stepping
    during checkpoint saves: the device→host transfer (the dominant cost —
    seconds through a slow host link, ~params-size/PCIe-bandwidth anywhere)
    happens off the step path. One save in flight at a time: submit()
    waits on the PREVIOUS save's completion event before enqueuing, so at
    most one device snapshot is alive in the writer at any moment (never
    unbounded memory, never reordered files)."""

    def __init__(self):
        self._q = queue.Queue(maxsize=1)
        self._errors = []
        self._thread = None
        self._lock = threading.Lock()
        self._last_done = None

    def _ensure_thread(self):
        with self._lock:
            if self._thread is None or not self._thread.is_alive():
                self._thread = threading.Thread(
                    target=self._run, name="ckpt-writer", daemon=True)
                self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            blob, path, done = item
            try:
                blob = dict(blob, params=_to_host(blob["params"]),
                            opt_state=_to_host(blob["opt_state"]))
                _save_blob(blob, path)
            except Exception as e:  # surfaced at the next wait()/submit
                self._errors.append(e)
            finally:
                done.set()
                self._q.task_done()

    def submit(self, blob, path):
        self.raise_pending_errors()
        self._ensure_thread()
        if self._last_done is not None:
            # bound the writer to ONE outstanding snapshot: without this,
            # Queue(maxsize=1) still allows one dequeued save in flight
            # plus one queued — two full HBM snapshots alive
            self._last_done.wait()
            self.raise_pending_errors()
        done = threading.Event()
        self._q.put((blob, path, done))
        self._last_done = done
        return done

    def wait(self):
        """Block until every submitted save has been written; re-raise the
        first background failure so a bad disk never loses work silently."""
        if self._thread is not None and self._thread.is_alive():
            self._q.join()
        self.raise_pending_errors()

    def raise_pending_errors(self):
        if self._errors:
            e, self._errors = self._errors[0], []
            raise RuntimeError("async checkpoint save failed") from e


_writer = _AsyncWriter()


def wait_pending_saves():
    """Flush the async checkpoint writer (call before process exit and
    before any synchronous save that must supersede queued ones)."""
    _writer.wait()


@jax.jit
def _device_snapshot(tree):
    """HBM→HBM copy of every leaf. Cheap (bandwidth-bound, no host sync) and
    REQUIRED before an async save: the train step donates its opt_state/params
    buffers (trainer.py donate_argnums), so by the time the writer thread
    fetches them the originals may have been overwritten by step N+1.
    One jitted program, NOT an eager per-leaf copy loop: per-dispatch
    overhead times hundreds of leaves is seconds on a remote-dispatch
    backend (measured 6.8 s at LJSpeech-preset state size via the dev
    tunnel; one dispatch is ~ms). Buffer-distinctness of the copied outputs
    (inputs are not donated, so XLA may not alias results back onto the
    live param buffers) is pinned by
    test_checkpoint_async_matches_sync, which mutates the donated source
    buffers while the save is in flight."""
    return jax.tree.map(jnp.copy, tree)


def save_checkpoint(checkpoint_dir, params, opt_state, step, epoch, *,
                    train_seq2seq=True, train_postnet=True,
                    save_optimizer_state=True, async_save=False):
    """Whole / _seq2seq / _postnet suffixed saves (reference
    train.py:788-809).

    async_save=True returns immediately after an HBM-resident snapshot of
    the payload (safe against the train step's buffer donation); the
    device→host fetch and the file write run on a background writer thread.
    Call wait_pending_saves() before exit. The written file is byte-level
    identical in content to a synchronous save of the same state."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    if train_seq2seq and train_postnet:
        suffix, payload = "", params
    elif train_seq2seq:
        suffix = "_seq2seq"
        payload = {k: params[k] for k in params if k != "converter"}
    else:
        suffix = "_postnet"
        payload = {"converter": params["converter"]}
    keep_opt = save_optimizer_state and opt_state is not None
    blob = {
        "params": payload,
        "opt_state": flatten_opt_state(opt_state) if keep_opt else None,
        "opt_fingerprint": (opt_state_fingerprint(opt_state)
                            if keep_opt else None),
        "global_step": int(step),
        "global_epoch": int(epoch),
    }
    path = checkpoint_path(checkpoint_dir, int(step), suffix)
    if async_save:
        arrays = {"params": blob["params"], "opt_state": blob["opt_state"]}
        snap = _device_snapshot(arrays)
        blob.update(params=snap["params"], opt_state=snap["opt_state"])
        _writer.submit(blob, path)
    else:
        blob.update(params=_to_host(blob["params"]),
                    opt_state=_to_host(blob["opt_state"]))
        _save_blob(blob, path)
    return path


def save_checkpoint_file(path, params, opt_state, step, epoch):
    """Save a whole-model checkpoint to an explicit path (used by
    convert_checkpoint.py and tooling)."""
    blob = {
        "params": _to_host(params),
        "opt_state": (_to_host(flatten_opt_state(opt_state))
                      if opt_state is not None else None),
        "opt_fingerprint": (opt_state_fingerprint(opt_state)
                            if opt_state is not None else None),
        "global_step": int(step),
        "global_epoch": int(epoch),
    }
    _save_blob(blob, path)
    return path


def flatten_opt_state(opt_state):
    """optax states are nested namedtuples; they are stored as a leaf list
    plus a structure fingerprint (opt_state_fingerprint) and rebuilt against
    a template with per-leaf shape checks — a silent leaf misalignment after
    an optax version bump or optimizer-chain change fails loudly instead."""
    return jax.tree.leaves(opt_state)


def _structure_desc(tree):
    """Canonical, version-stable description of an optimizer-state pytree:
    namedtuple class names + field order, dict keys, and leaf shape/dtype.
    Deliberately NOT str(treedef) — that format is jax-version-dependent."""
    if isinstance(tree, dict):
        return "{" + ",".join(
            "%s:%s" % (k, _structure_desc(tree[k])) for k in sorted(tree)) \
            + "}"
    if hasattr(tree, "_fields"):  # namedtuple (optax states)
        return type(tree).__name__ + "(" + ",".join(
            "%s:%s" % (f, _structure_desc(getattr(tree, f)))
            for f in tree._fields) + ")"
    if isinstance(tree, (list, tuple)):
        return "[" + ",".join(_structure_desc(x) for x in tree) + "]"
    if tree is None:
        return "None"
    if hasattr(tree, "shape"):
        dt = (np.dtype(tree.dtype).name if hasattr(tree, "dtype") else "?")
        return "%s%s" % (dt, tuple(tree.shape))
    return type(tree).__name__


def opt_state_fingerprint(opt_state):
    import hashlib
    desc = _structure_desc(opt_state)
    return hashlib.sha256(desc.encode()).hexdigest()[:16]


def unflatten_opt_state(template, leaves):
    t_leaves, treedef = jax.tree.flatten(template)
    if len(leaves) != len(t_leaves):
        raise ValueError(
            "optimizer state mismatch: checkpoint has %d leaves, current "
            "optimizer expects %d — resume with reset_optimizer=True "
            "(--reset-optimizer) or rebuild the matching optimizer"
            % (len(leaves), len(t_leaves)))
    out = []
    for i, (t, leaf) in enumerate(zip(t_leaves, leaves)):
        arr = jnp.asarray(leaf)
        if hasattr(t, "shape") and tuple(t.shape) != tuple(arr.shape):
            raise ValueError(
                "optimizer state leaf %d has shape %s, expected %s — the "
                "checkpoint's optimizer layout does not match; resume with "
                "reset_optimizer=True (--reset-optimizer)"
                % (i, tuple(arr.shape), tuple(t.shape)))
        out.append(arr.astype(t.dtype) if hasattr(t, "dtype") else arr)
    return jax.tree.unflatten(treedef, out)


def load_checkpoint(path, params_template, opt_state_template=None, *,
                    reset_optimizer=False):
    """Exact resume (reference train.py:852-867). Returns
    (params, opt_state_or_None, step, epoch)."""
    blob = _load_blob(path)
    params = _merge_exact(params_template, blob["params"])
    opt_state = None
    if not reset_optimizer and blob.get("opt_state") is not None \
            and opt_state_template is not None:
        saved_fp = blob.get("opt_fingerprint")
        if saved_fp is not None \
                and saved_fp != opt_state_fingerprint(opt_state_template):
            raise ValueError(
                "optimizer state structure mismatch: the checkpoint was "
                "saved with a different optimizer chain (e.g. weight_decay "
                "toggled, optax version change). Resume with "
                "reset_optimizer=True (--reset-optimizer) to discard it.")
        opt_state = unflatten_opt_state(opt_state_template,
                                        blob["opt_state"])
    return params, opt_state, blob["global_step"], blob["global_epoch"]


def _merge_exact(template, saved):
    """Structure-checked merge: every leaf in template must exist in saved
    with the same shape (partial payloads merge into the template)."""
    if isinstance(template, dict):
        out = {}
        for k, v in template.items():
            if saved is not None and k in saved:
                out[k] = _merge_exact(v, saved[k])
            else:
                out[k] = v
        return out
    if isinstance(template, (list, tuple)):
        saved_list = saved if saved is not None else [None] * len(template)
        if isinstance(saved_list, dict):  # msgpack may turn lists into dicts
            saved_list = [saved_list.get(str(i)) for i in
                          range(len(template))]
        merged = [_merge_exact(t, s) for t, s in zip(template, saved_list)]
        return type(template)(merged)
    if saved is None:
        return template
    arr = jnp.asarray(saved)
    if hasattr(template, "shape") and template.shape != arr.shape:
        raise ValueError("shape mismatch: %s vs %s"
                         % (template.shape, arr.shape))
    return arr.astype(template.dtype) if hasattr(template, "dtype") else arr


def restore_parts(path, params_template):
    """Shape-tolerant partial restore (reference train.py:878-897): leaves
    whose path exists AND shape matches are taken from the checkpoint,
    everything else keeps the template value. Used for speaker adaptation."""
    blob = _load_blob(path)

    def merge(t, s):
        if isinstance(t, dict):
            return {k: merge(v, s.get(k) if isinstance(s, dict) else None)
                    for k, v in t.items()}
        if isinstance(t, (list, tuple)):
            if isinstance(s, dict):
                s = [s.get(str(i)) for i in range(len(t))]
            if not isinstance(s, (list, tuple)) or len(s) != len(t):
                return t
            return type(t)([merge(a, b) for a, b in zip(t, s)])
        if s is None:
            return t
        arr = jnp.asarray(s)
        if hasattr(t, "shape") and t.shape != arr.shape:
            return t  # skip invalid sizes, like the reference warns+skips
        return arr

    return merge(params_template, blob["params"])


def load_embedding(path, params):
    """Reuse a trained text embedding (reference train.py:870-873)."""
    blob = _load_blob(path)
    emb = blob["params"]["encoder"]["embed_tokens"]
    params = dict(params)
    params["encoder"] = dict(params["encoder"])
    params["encoder"]["embed_tokens"] = jax.tree.map(jnp.asarray, emb)
    return params


def latest_checkpoint(checkpoint_dir, suffix=""):
    import glob
    paths = sorted(glob.glob(join(checkpoint_dir,
                                  "checkpoint_step*%s.ckpt" % suffix)))
    paths = [p for p in paths
             if suffix or ("_seq2seq" not in p and "_postnet" not in p)]
    return paths[-1] if paths else None
