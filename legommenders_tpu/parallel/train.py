"""Sharded training: jit over a (dp, mp) mesh.

The step function is the same pure function as runtime/steps.py; sharding
is expressed through in/out shardings so XLA SPMD partitions the program:
batch rows over `dp` (gradients all-reduced over ICI automatically),
embedding tables row-sharded over `mp` (lookups become collective gathers).
"""
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from legommenders_tpu.parallel.mesh import (
    DP_AXIS, params_shardings, shard_params,
)
from legommenders_tpu.runtime.steps import make_loss_fn


def place_opt_state(optimizer, opt_state, params_sh, mesh):
    """Shard the optimizer state WITH the params: every params-shaped leaf
    (Adam moments, MultiSteps grad accumulators) inherits the matching
    param's sharding, scalars/counters are replicated. Without this a
    mp-row-sharded embedding table would drag two fully-replicated moment
    replicas onto every device — surrendering the memory win row-sharding
    exists to provide."""
    repl = NamedSharding(mesh, P())
    return optax.tree_map_params(
        optimizer,
        lambda x, s: jax.device_put(x, s),
        opt_state, params_sh,
        transform_non_params=lambda x: jax.device_put(x, repl))


def make_sharded_train_step(model, item_contents, optimizer, mesh,
                            use_neg_sampling: bool = True,
                            min_rows_to_shard: int = 0) -> Callable:
    """Returns (step, place_fn): step(params, opt_state, batch, rng) with
    sharding-annotated jit; place_fn(params, opt_state, batch) places inputs
    on the mesh (optimizer moments follow the param shardings)."""
    loss_fn = make_loss_fn(model, item_contents, use_neg_sampling)

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_sharding = NamedSharding(mesh, P(DP_AXIS))

    def place(params, opt_state, batch):
        p_sh = params_shardings(params, mesh, min_rows_to_shard)
        params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        opt_state = place_opt_state(optimizer, opt_state, p_sh, mesh)
        batch = {k: jax.device_put(jnp.asarray(v), batch_sharding)
                 for k, v in batch.items()}
        return params, opt_state, batch

    jitted = jax.jit(step, donate_argnums=(0, 1))
    return jitted, place


def make_sharded_train_step_folded(model, item_contents, optimizer, mesh,
                                   use_neg_sampling: bool = True,
                                   seed: int = 0,
                                   rng_impl: Optional[str] = None,
                                   min_rows_to_shard: int = 0):
    """Hot-loop mesh variant of runtime/steps.make_train_step_folded: rng
    derived in-jit from the step counter, batch dp-sharded, params/opt
    sharded per params_shardings. This is what `exp.policy.mesh` routes the
    Trainer through (reference trainer.py:299-313 composes everything by
    config; the reference itself is single-device, base_lego.py:272-296).

    Returns (step, place_params, place_batch):
      step(params, opt_state, batch, step_idx) -> (params, opt_state, loss)
    """
    from legommenders_tpu.runtime.steps import default_rng_impl
    loss_fn = make_loss_fn(model, item_contents, use_neg_sampling)
    base = jax.random.key(seed, impl=rng_impl or default_rng_impl())

    def step(params, opt_state, batch, step_idx):
        rng = jax.random.fold_in(base, step_idx)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_sharding = NamedSharding(mesh, P(DP_AXIS))

    def place_params(params, opt_state):
        p_sh = params_shardings(params, mesh, min_rows_to_shard)
        params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        opt_state = place_opt_state(optimizer, opt_state, p_sh, mesh)
        return params, opt_state

    def place_batch(batch):
        return {k: jax.device_put(jnp.asarray(v), batch_sharding)
                for k, v in batch.items()}

    jitted = jax.jit(step, donate_argnums=(0, 1))
    return jitted, place_params, place_batch
