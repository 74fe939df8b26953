"""Checkpoint / resume.

The reference never saves weights (SURVEY.md §5: only figures + hp.json
are persisted; the closest artifact is its flat get_weights/set_weights
codec, reference utils/neuralnetwork.py:68-89).  This module adds real
checkpointing on top of the same flat-vector layout:

* ``save_npz`` / ``load_npz`` — single-file checkpoints holding the
  flat parameter vector + layer shapes + hp, loadable without the
  model object (numpy only).
* ``save_orbax`` / ``load_orbax`` — pytree checkpoints via orbax for
  ecosystem interop (optional; gated on the import).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinn import params as pcodec


def save_npz(path: str, params: Any, hp: Optional[dict] = None,
             extra: Optional[dict] = None) -> None:
    """Flat-vector checkpoint: portable, layout = reference codec order."""
    flat = np.asarray(pcodec.ravel(params))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [list(leaf.shape) for leaf in leaves]
    meta = {"shapes": shapes, "hp": hp or {}, "extra": extra or {}}
    np.savez_compressed(path, flat=flat, meta=json.dumps(meta))


def load_npz(path: str, like: Any = None) -> Tuple[Any, dict]:
    """Returns (params, meta).  With ``like`` (a template pytree) the
    flat vector is unraveled into that structure; otherwise a flat list
    of arrays with the stored shapes is returned."""
    d = np.load(path, allow_pickle=False)
    flat = d["flat"]
    meta = json.loads(str(d["meta"]))
    if like is not None:
        unravel = pcodec.make_unravel(like)
        params = unravel(flat)
        # Cast to the template's leaf dtypes (e.g. loading an f32
        # checkpoint to warm-start an f64 refinement run).
        params = jax.tree_util.tree_map(
            lambda leaf, tmpl: jnp.asarray(leaf, tmpl.dtype), params, like)
        return params, meta
    out, off = [], 0
    for shape in meta["shapes"]:
        size = int(np.prod(shape)) if shape else 1
        out.append(flat[off:off + size].reshape(shape))
        off += size
    return out, meta


def save_npz_atomic(path: str, params: Any, hp: Optional[dict] = None,
                    extra: Optional[dict] = None) -> str:
    """Crash-safe ``save_npz``: write to a sibling temp file, then
    ``os.replace`` into place, so a process killed mid-write never
    leaves a truncated checkpoint behind.  This is what the Trainer's
    periodic saves (hp["save_every"]) use.  Returns the final path
    (``.npz`` appended if missing, matching ``np.savez`` behavior)."""
    final = path if path.endswith(".npz") else path + ".npz"
    tmp = final + ".tmp.npz"
    save_npz(tmp, params, hp=hp, extra=extra)
    os.replace(tmp, final)
    return final


def resume_meta(path: str) -> dict:
    """The ``extra`` metadata of a checkpoint (phase/epoch for periodic
    Trainer saves) without touching the weights."""
    d = np.load(path, allow_pickle=False)
    return json.loads(str(d["meta"])).get("extra", {})


def save_orbax(path: str, params: Any) -> None:
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def load_orbax(path: str, like: Any):
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, like)
