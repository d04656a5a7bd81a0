"""Catalog-parallel training: shard the ITEM CATALOG over every device.

No reference counterpart (the reference is single-device; its cached
hidden states live in host RAM and page through one GPU,
loader/pager/lm_layer_pager.py). TPU-first design for two problems at
once:

1. **Memory**: a 7B-geometry LM layer cache does not fit one chip
   ((65536, 31, 4096) bf16 = 16.6 GB > 15.75 GB v5e HBM). Row-sharding
   the cache over all `n_dev` mesh devices stores N/n_dev rows per chip —
   an 8-chip v5e pod holds the 7B cache at ~2 GB/chip.
2. **Compute**: in full-catalog mode the item encode is the dominant,
   per-step-FIXED cost (bench_lm: ~2.7 s of a 2.74 s step). Under plain
   dp the encode is REPLICATED on every device. Here each device encodes
   only its local rows — the catalog cost scales 1/n_dev — and only the
   tiny (N, output_dim) repr matrix is all-gathered for the occurrence
   gathers (65k x 64 bf16 = 8 MB vs the 3.1-GB BERT-base cache).

Mechanics: `shard_map` over the mesh's flattened (dp, mp) axes. Inside,
each device runs the model's own `encode_item_content` on its local rows
(local paging/remat still applies), with the dropout key folded by device
index so mask draws differ across shards. Params enter replicated; the
shard_map transpose psums their cotangents, so gradients equal the
replicated-encode step (validated by test_catalog_parallel.py). The user
side and predictor run under ordinary dp-sharded SPMD on the gathered
reprs via Legommender.encode_user / .score.
"""
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from legommenders_tpu.parallel.mesh import DP_AXIS, MP_AXIS
from legommenders_tpu.runtime.steps import (
    default_rng_impl, neg_sampling_loss, ranking_loss,
)

try:  # jax >= 0.4.35 exposes it at top level
    from jax import shard_map
    def _shard_map(f, mesh, in_specs, out_specs):
        return shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _esm
    def _shard_map(f, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)


def catalog_axes(mesh: Mesh) -> Tuple[str, ...]:
    """The mesh axes the catalog rows shard over: every axis that exists
    of (dp, mp) — sp/pp stay out (they partition within-row work)."""
    return tuple(a for a in (DP_AXIS, MP_AXIS) if a in mesh.axis_names)


def pad_catalog(contents: Dict[str, np.ndarray], n_dev: int
                ) -> Tuple[Dict[str, jnp.ndarray], int]:
    """Pad every content column's rows to a multiple of n_dev by repeating
    the last row (encodes cleanly; padded reprs are never gathered —
    occurrence ids stay < N). Returns (padded contents, original N)."""
    n = next(iter(contents.values())).shape[0]
    pad = (-n) % n_dev
    if pad == 0:
        return dict(contents), n
    out = {}
    for c, a in contents.items():
        reps = jnp.broadcast_to(a[-1:], (pad,) + a.shape[1:])
        out[c] = jnp.concatenate([jnp.asarray(a), reps], axis=0)
    return out, n


def contents_shardings(contents: Dict[str, jnp.ndarray], mesh: Mesh):
    """NamedShardings placing every content column row-sharded over the
    catalog axes (rows must already be padded to a multiple — see
    pad_catalog)."""
    axes = catalog_axes(mesh)
    return {c: NamedSharding(mesh, P(axes, *([None] * (a.ndim - 1))))
            for c, a in contents.items()}


def place_catalog(contents: Dict[str, jnp.ndarray], mesh: Mesh
                  ) -> Tuple[Dict[str, jnp.ndarray], int]:
    """pad + device_put the catalog row-sharded; the returned dict is what
    the step consumes. The full (N, L, D) cache never materializes on any
    single device — each holds N/n_dev rows."""
    n_dev = int(np.prod([mesh.shape[a] for a in catalog_axes(mesh)]))
    padded, n = pad_catalog(contents, n_dev)
    sh = contents_shardings(padded, mesh)
    return {c: jax.device_put(a, sh[c]) for c, a in padded.items()}, n


def sharded_catalog_encode(model, mesh: Mesh) -> Callable:
    """Returns encode(params, contents, rng, training) -> (N, D) reprs,
    row-sharded over the catalog axes. contents must be placed by
    place_catalog (rows padded to the device count)."""
    axes = catalog_axes(mesh)

    def encode(params, contents, rng, training: bool = True):
        def local_encode(params, local, rng):
            idx = jax.lax.axis_index(axes[0])
            for a in axes[1:]:
                idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
            key = jax.random.fold_in(rng, idx)
            return model.apply(params, local, training=training,
                               method=model.encode_item_content,
                               rngs={"dropout": key})

        in_specs = (P(), {c: P(axes, *([None] * (a.ndim - 1)))
                          for c, a in contents.items()}, P())
        fn = _shard_map(local_encode, mesh, in_specs, P(axes))
        return fn(params, contents, rng)

    return encode


def make_catalog_parallel_step(model, optimizer, mesh: Mesh,
                               use_neg_sampling: bool = True,
                               seed: int = 0,
                               rng_impl: Optional[str] = None,
                               assemble: Optional[Callable] = None
                               ) -> Callable:
    """Train step with the catalog encode sharded over ALL mesh devices.

    step(params, opt_state, contents, batch, step_idx) -> (params,
    opt_state, loss); contents from place_catalog (row-sharded arg — NOT
    a captured constant), batch dp-sharded, params/opt_state replicated
    (combine with mesh.shard_params for mp table sharding if desired —
    embedding-table lookups inside the local encode then gather over mp).

    With `assemble` (DeviceTrainPipeline.assemble), `batch` is instead a
    (B,) dp-sharded substrate index vector and batch assembly (history
    gathers + in-jit negative sampling) fuses into the step — this is what
    lets catalog_parallel COMPOSE with device_batching instead of falling
    back to host batch assembly. The rng split mirrors the fused dp step
    (sample_rng first) so negative draws are identical to
    DeviceTrainPipeline.make_fused_train_step at the same seed/impl.

    Rebuilds the catalog branch of Legommender.__call__ around the
    sharded encode (legommender.py:287-308); matching losses only differ
    from the fused single-device step by dropout draws. Catalog-gradient
    plans don't apply to local shards (content-hash mismatch) — the
    embedding backward falls back to the plain lookup transpose.
    """
    encode = sharded_catalog_encode(model, mesh)
    base = jax.random.key(seed, impl=rng_impl or default_rng_impl())
    repl = NamedSharding(mesh, P())

    def loss_fn(params, contents, batch, rng):
        if assemble is not None:
            sample_rng, rng = jax.random.split(rng)
            batch = assemble(batch, sample_rng)
        r_enc, r_user, r_pred = jax.random.split(rng, 3)
        all_reprs = encode(params, contents, r_enc, True)
        num_items = next(iter(contents.values())).shape[0]
        cand = jnp.clip(batch[model.candidate_col], 0, num_items - 1)
        hist = jnp.clip(batch[model.history_col], 0, num_items - 1)
        # the (N, D) gather operand is all-gathered by GSPMD here — the
        # only catalog-sized collective in the step
        item_repr = jnp.take(all_reprs, cand, axis=0)
        clicks = jnp.take(all_reprs, hist, axis=0)
        user_repr = model.apply(params, clicks, batch[model.mask_col],
                                True, method=model.encode_user,
                                rngs={"dropout": r_user})
        scores = model.apply(params, user_repr, item_repr, True,
                             method=model.score, rngs={"dropout": r_pred})
        if use_neg_sampling:
            return neg_sampling_loss(scores)
        return ranking_loss(scores, batch["label"])

    def step(params, opt_state, contents, batch, step_idx):
        rng = jax.random.fold_in(base, step_idx)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, contents, batch, rng)
        grads = jax.lax.with_sharding_constraint(
            grads, jax.tree_util.tree_map(lambda _: repl, grads))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
