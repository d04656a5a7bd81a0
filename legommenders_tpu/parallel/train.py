"""Sharded training: jit over a (dp, mp) mesh.

The step function is the same pure function as runtime/steps.py; sharding
is expressed through in/out shardings so XLA SPMD partitions the program:
batch rows over `dp` (gradients all-reduced over ICI automatically),
embedding tables row-sharded over `mp` (lookups become collective gathers).
"""
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from legommenders_tpu.parallel.mesh import (
    DP_AXIS, params_shardings, shard_params,
)
from legommenders_tpu.runtime.steps import make_loss_fn


def make_sharded_train_step(model, item_contents, optimizer, mesh,
                            use_neg_sampling: bool = True,
                            min_rows_to_shard: int = 0) -> Callable:
    """Returns (step, place_fn): step(params, opt_state, batch, rng) with
    sharding-annotated jit; place_fn(params, opt_state, batch) places inputs
    on the mesh."""
    loss_fn = make_loss_fn(model, item_contents, use_neg_sampling)

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_sharding = NamedSharding(mesh, P(DP_AXIS))
    repl = NamedSharding(mesh, P())

    def place(params, opt_state, batch):
        p_sh = params_shardings(params, mesh, min_rows_to_shard)
        params = jax.tree_util.tree_map(jax.device_put, params, p_sh)
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), opt_state)
        batch = {k: jax.device_put(jnp.asarray(v), batch_sharding)
                 for k, v in batch.items()}
        return params, opt_state, batch

    jitted = jax.jit(step, donate_argnums=(0, 1))
    return jitted, place
