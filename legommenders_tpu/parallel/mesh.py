"""Device mesh + sharding layer.

No reference counterpart — the reference is strictly single-device
(base_lego.py:272-296; SURVEY §2.9). This layer provides the TPU-native
scaling design: a 2-D `(dp, mp)` jax.sharding.Mesh where
  * the interaction batch is sharded over `dp` (data parallel),
  * embedding tables are row-sharded over `mp` (annotated via
    nn.with_partitioning in models/embedding.py; XLA SPMD inserts the
    gather collectives),
  * everything else is replicated.
Multi-host initialization uses jax.distributed; ICI carries the collectives
within a slice, DCN across slices.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
MP_AXIS = "mp"
SP_AXIS = "sp"

# ambient sequence-parallel mesh: operators flagged sequence_parallel=True
# read it at trace time to shard_map their attention/pooling over SP_AXIS
# (ops/sp_attention.py, ops/sp_additive.py)
_ACTIVE_SP_MESH: Optional[Mesh] = None


def get_sp_mesh() -> Optional[Mesh]:
    return _ACTIVE_SP_MESH


def set_sp_mesh(mesh: Optional[Mesh]):
    global _ACTIVE_SP_MESH
    _ACTIVE_SP_MESH = mesh


class sequence_parallel:
    """Context manager activating an SP mesh for operator tracing:
        with sequence_parallel(mesh):  # mesh must carry an "sp" axis
            step(...)
    """

    def __init__(self, mesh: Mesh):
        assert SP_AXIS in mesh.axis_names, \
            f"mesh {mesh.axis_names} lacks a '{SP_AXIS}' axis"
        self.mesh = mesh

    def __enter__(self):
        self._prev = get_sp_mesh()
        set_sp_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_sp_mesh(self._prev)
        return False


# ambient pipeline-parallel mesh: LM slices with pipeline_stages > 1 read
# it at trace time to stage their layer stack over the "pp" axis
# (parallel/pipeline.py gpipe_tree)
_ACTIVE_PP_MESH: Optional[Mesh] = None


def get_pp_mesh() -> Optional[Mesh]:
    return _ACTIVE_PP_MESH


def set_pp_mesh(mesh: Optional[Mesh]):
    global _ACTIVE_PP_MESH
    _ACTIVE_PP_MESH = mesh


class pipeline_parallel:
    """Context manager activating a PP mesh for LM-slice tracing:
        with pipeline_parallel(mesh):  # mesh must carry a "pp" axis
            step(...)
    """

    def __init__(self, mesh: Mesh):
        from legommenders_tpu.parallel.pipeline import PP_AXIS
        assert PP_AXIS in mesh.axis_names, \
            f"mesh {mesh.axis_names} lacks a '{PP_AXIS}' axis"
        self.mesh = mesh

    def __enter__(self):
        self._prev = get_pp_mesh()
        set_pp_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_pp_mesh(self._prev)
        return False


class no_pipeline:
    """Deactivate the ambient PP mesh for a block. Used by every path that
    traces the model inside a shard_map (fast-eval cache builds, LM offline
    caches) — a gpipe shard_map cannot nest inside another shard_map — and
    by evaluation, where batch sizes are arbitrary and pipeline staging is a
    training-throughput feature (the serial layer stack is numerically the
    same params/math)."""

    def __enter__(self):
        self._prev = get_pp_mesh()
        set_pp_mesh(None)
        return None

    def __exit__(self, *exc):
        set_pp_mesh(self._prev)
        return False


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None):
    """Multi-host bring-up: jax.distributed.initialize (auto-detected on
    TPU pods; explicit args for manual launches). Call once per process
    before any jax computation; afterwards jax.devices() spans the pod and
    make_mesh() lays the (dp, mp) axes across hosts — collectives ride ICI
    within a slice and DCN across slices."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def enable_compilation_cache(path: str = "~/.cache/lego_jax_cache"):
    """Persistent XLA compilation cache — second runs of trainer/bench skip
    the (slow) TPU compiles."""
    import os

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def make_mesh(n_dp: Optional[int] = None, n_mp: int = 1,
              n_sp: int = 1, devices=None, n_pp: int = 1) -> Mesh:
    """(dp, mp[, sp][, pp]) mesh — sp/pp axes appear only when > 1 so the
    common 2-D shape (and every catalog_axes consumer) is unchanged."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_dp is None:
        n_dp = n // (n_mp * n_sp * n_pp)
    assert n_dp * n_mp * n_sp * n_pp == n, \
        f"{n_dp}x{n_mp}x{n_sp}x{n_pp} != {n} devices"
    dims = [(DP_AXIS, n_dp), (MP_AXIS, n_mp)]
    if n_sp > 1:
        dims.append((SP_AXIS, n_sp))
    if n_pp > 1:
        from legommenders_tpu.parallel.pipeline import PP_AXIS
        dims.append((PP_AXIS, n_pp))
    arr = np.asarray(devices).reshape([d for _, d in dims])
    return Mesh(arr, tuple(a for a, _ in dims))


def mesh_from_policy(cfg, devices=None) -> Mesh:
    """Build the experiment mesh from the `exp.policy.mesh` config block.

    Schema (all keys optional):
        mesh:
          dp: 8                  # data-parallel width; default = the rest
          mp: 2                  # model-parallel width (table row-sharding
                                 #   + Megatron-TP on LM slices)
          sp: 1                  # sequence-parallel width
          pp: 1                  # pipeline-parallel width (LM slices with
                                 #   pipeline_stages stage over this axis;
                                 #   the Trainer activates the ambient PP
                                 #   mesh when pp > 1)
          catalog_parallel: true # routes the Trainer through
                                 #   parallel/catalog.py (read by the
                                 #   Trainer, not here)
          min_rows_to_shard: 0   # embedding-table sharding threshold
    `mesh: true` (bare flag) means "all visible devices, pure dp".
    Uses the first dp*mp*sp*pp of `devices` (default jax.devices()).

    This is the config-only composition contract of the reference
    (trainer.py:299-313) extended to multi-chip — no reference counterpart
    (it is single-device, base_lego.py:272-296).
    """
    if cfg is True:
        cfg = {}
    if not isinstance(cfg, dict):
        raise ValueError(f"exp.policy.mesh must be a mapping or true, "
                         f"got {cfg!r}")
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_mp = int(cfg.get("mp") or 1)
    n_sp = int(cfg.get("sp") or 1)
    n_pp = int(cfg.get("pp") or 1)
    dp = cfg.get("dp")
    n_dp = int(dp) if dp else max(1, n // (n_mp * n_sp * n_pp))
    need = n_dp * n_mp * n_sp * n_pp
    if need > n:
        raise ValueError(
            f"mesh policy wants {n_dp}x{n_mp}x{n_sp}x{n_pp}={need} devices, "
            f"only {n} visible")
    return make_mesh(n_dp, n_mp, n_sp, devices=devices[:need], n_pp=n_pp)


def batch_spec() -> P:
    return P(DP_AXIS)


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh):
    """Shard every batch array over dp on its leading axis."""
    sharding = NamedSharding(mesh, P(DP_AXIS))
    return {k: jax.device_put(jnp.asarray(v), sharding)
            for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


# Megatron-style tensor parallelism for the LM encoder pass (SURVEY §7
# item 11 "TP sharding for the encoder pass"): first GEMM of each pair is
# column-sharded (its bias too), the second row-sharded with a replicated
# bias — GSPMD then inserts exactly one all-reduce per attention/FFN block.
_TP_COL_SHARDED = {"query", "key", "value", "q_proj", "k_proj", "v_proj",
                   "intermediate", "fc1", "gate_proj", "up_proj"}
_TP_ROW_SHARDED = {"output", "o_proj", "out_proj", "ffn_output", "fc2",
                   "down_proj"}


def params_shardings(params, mesh: Mesh, min_rows_to_shard: int = 0,
                     lm_tp: bool = True):
    """Rule-based shardings: embedding tables (param name `emb_*`, 2-D, at
    least `min_rows_to_shard` rows) are row-sharded over `mp`; CrossNetMix
    expert tensors (U_i/V_i/C_i inside a CrossNetMix scope, leading axis =
    experts) are expert-sharded over `mp` (expert parallelism — GSPMD turns
    the MoE combine into a psum); LM-slice attention/FFN kernels are
    Megatron-TP-sharded over `mp` when `lm_tp` (LoRA deltas and norms stay
    replicated — they are small); everything else replicated. Rule-based
    (instead of flax Partitioned boxes) keeps params as plain arrays for
    optax."""
    n_mp = mesh.shape[MP_AXIS]

    def spec_for(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else ""
        keys = [str(getattr(p, "key", "")) for p in path]
        scope = "/".join(keys)
        if (name.startswith("emb_") and leaf.ndim == 2
                and leaf.shape[0] >= max(min_rows_to_shard, n_mp)
                and leaf.shape[0] % n_mp == 0):
            return NamedSharding(mesh, P(MP_AXIS, None))
        if ("CrossNetMix" in scope and leaf.ndim == 3
                and name.split("_")[0] in ("U", "V", "C")
                and leaf.shape[0] % n_mp == 0):
            return NamedSharding(mesh, P(MP_AXIS, None, None))
        if lm_tp and n_mp > 1 and ("lm" in keys or "lm_lower" in keys):
            parent = keys[-2] if len(keys) >= 2 else ""
            if parent in _TP_COL_SHARDED:
                if (name == "kernel" and leaf.ndim == 2
                        and leaf.shape[1] % n_mp == 0):
                    return NamedSharding(mesh, P(None, MP_AXIS))
                if (name == "bias" and leaf.ndim == 1
                        and leaf.shape[0] % n_mp == 0):
                    return NamedSharding(mesh, P(MP_AXIS))
            if (parent in _TP_ROW_SHARDED and name == "kernel"
                    and leaf.ndim == 2 and leaf.shape[0] % n_mp == 0):
                return NamedSharding(mesh, P(MP_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, min_rows_to_shard: int = 0):
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, s),
        params, params_shardings(params, mesh, min_rows_to_shard))
