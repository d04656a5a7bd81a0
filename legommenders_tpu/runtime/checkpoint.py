"""Checkpointing: params + optimizer state + step metadata.

Parity: reference base_lego.py:228-267 (single-file torch.save of
model/optimizer/scheduler state, best-only policy, configurable
strict/model_only load). Implementation: flax serialization to a single
msgpack file; orbax-backed sharded checkpoints are used by the parallel
trainer when a mesh is active.
"""
import os
from typing import Any, Dict, Optional

import jax
from flax import serialization

from legommenders_tpu.utils.io import json_load, json_save


def save_checkpoint(path: str, params, opt_state=None,
                    meta: Optional[Dict[str, Any]] = None):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    params = jax.device_get(params)
    blob = {"params": params}
    if opt_state is not None:
        blob["opt_state"] = jax.device_get(opt_state)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(blob)))
    if meta is not None:
        json_save(meta, path + ".meta.json")


def load_checkpoint(path: str, params_template, opt_state_template=None,
                    model_only: bool = False):
    """Restore into templates (shape/type targets). Returns
    (params, opt_state, meta)."""
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(
        params_template, state["params"])
    opt_state = None
    if not model_only and opt_state_template is not None and \
            "opt_state" in state:
        opt_state = serialization.from_state_dict(
            opt_state_template, state["opt_state"])
    meta = None
    if os.path.isfile(path + ".meta.json"):
        meta = json_load(path + ".meta.json")
    return params, opt_state, meta


# ---------------------------------------------------------------------------
# Orbax-backed sharded checkpoints (multi-chip: each host writes its param
# shards; restore honors the target sharding). The msgpack path above
# host-gathers and is right for single-chip runs.
# ---------------------------------------------------------------------------
def save_sharded(path: str, params, opt_state=None,
                 meta: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    blob = {"params": params}
    if opt_state is not None:
        blob["opt_state"] = opt_state
    ckptr.save(path, blob, force=True)
    ckptr.wait_until_finished()
    if meta is not None:
        json_save(meta, path + ".meta.json")


def params_are_sharded(tree) -> bool:
    """True if any leaf is device-sharded (non-replicated) over a >1-device
    mesh — the signal to prefer orbax sharded checkpoints."""
    for leaf in jax.tree_util.tree_leaves(tree):
        sh = getattr(leaf, "sharding", None)
        mesh = getattr(sh, "mesh", None)
        if mesh is not None and mesh.size > 1 and \
                not sh.is_fully_replicated:
            return True
    return False


def save_auto(path: str, params, opt_state=None,
              meta: Optional[Dict[str, Any]] = None) -> str:
    """Single-chip runs -> one msgpack file at `path`; mesh-sharded params
    -> orbax sharded checkpoint at `path`.orbax (each host writes its own
    shards). Returns the path actually written."""
    if params_are_sharded(params):
        opath = path + ".orbax"
        save_sharded(opath, params, opt_state, meta)
        return opath
    save_checkpoint(path, params, opt_state, meta)
    return path


def load_auto(path: str, params_template, opt_state_template=None,
              model_only: bool = False):
    """Counterpart of save_auto: restores from `path`.orbax when present
    (honoring the templates' shardings), else the msgpack file."""
    opath = path + ".orbax"
    if os.path.isdir(opath):
        params, opt_state, meta = load_sharded(
            opath, params_template,
            None if model_only else opt_state_template)
        return params, (None if model_only else opt_state), meta
    return load_checkpoint(path, params_template, opt_state_template,
                           model_only=model_only)


def load_sharded(path: str, params_template, opt_state_template=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    target = {"params": params_template}
    if opt_state_template is not None:
        target["opt_state"] = opt_state_template
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, target)
    else:
        # model-only restore from a checkpoint that also holds opt_state:
        # partial restore of just the params subtree (the templates'
        # shardings are honored via construct_restore_args)
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        restored = ckptr.restore(path, args=ocp.args.PyTreeRestore(
            item=target, restore_args=restore_args, partial_restore=True))
    meta = None
    if os.path.isfile(path + ".meta.json"):
        meta = json_load(path + ".meta.json")
    return (restored["params"], restored.get("opt_state"), meta)
