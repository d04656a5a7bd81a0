"""Jitted train/eval step factories.

The reference's training loop computes loss inside the nn.Module
(legommender.py:114-118, 252-263: CE over (B, K+1) scores with the positive
at index 0, or BCEWithLogits for pointwise ranking). Here the module
returns raw scores and the loss lives in these pure step functions, which
`jax.jit` compiles once per shape.
"""
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def neg_sampling_loss(scores: jnp.ndarray) -> jnp.ndarray:
    """Cross-entropy with the positive always at column 0."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(logp[..., 0])


def ranking_loss(scores: jnp.ndarray, labels: jnp.ndarray,
                 valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """BCE-with-logits over (B, 1) scores."""
    s = scores.reshape(-1)
    l = labels.reshape(-1).astype(s.dtype)
    per = optax.sigmoid_binary_cross_entropy(s, l)
    if valid is not None:
        v = valid.reshape(-1).astype(s.dtype)
        return jnp.sum(per * v) / jnp.maximum(jnp.sum(v), 1.0)
    return jnp.mean(per)


def make_loss_fn(model, item_contents, use_neg_sampling: bool):
    def loss_fn(params, batch, rng):
        scores = model.apply(
            params, batch, item_contents, training=True,
            rngs={"dropout": rng})
        if use_neg_sampling:
            return neg_sampling_loss(scores)
        return ranking_loss(scores, batch["label"])
    return loss_fn


def make_train_step(model, item_contents, optimizer,
                    use_neg_sampling: bool = True,
                    donate: bool = True) -> Callable:
    """Returns jitted step(params, opt_state, batch, rng) ->
    (params, opt_state, loss)."""
    loss_fn = make_loss_fn(model, item_contents, use_neg_sampling)

    def step(params, opt_state, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    donate_argnums = (0, 1) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def default_rng_impl() -> str:
    """Dropout PRNG implementation for the hot train path.

    threefry2x32 key derivation folded inside a donated train step sends
    the TPU (axon Mosaic) compiler into a pathological ~300s compile at
    per-occurrence encode shapes (measured: 308s threefry vs 6.7s rbg on
    an otherwise identical NAML step; grad-only threefry is 9s, so it is
    the threefry×fold_in×donation combination). `rbg` uses the hardware
    RNG and sidesteps it entirely; dropout needs no counter-based
    reproducibility guarantees across backends, so TPU defaults to rbg
    and CPU keeps threefry (test determinism)."""
    return "rbg" if jax.default_backend() not in ("cpu",) else "threefry2x32"


def make_train_step_folded(model, item_contents, optimizer,
                           use_neg_sampling: bool = True,
                           seed: int = 0,
                           rng_impl: Optional[str] = None) -> Callable:
    """Hot-loop variant: rng derived in-jit from an int32 step counter
    (avoids a host-side jax.random.split per step)."""
    loss_fn = make_loss_fn(model, item_contents, use_neg_sampling)
    base = jax.random.key(seed, impl=rng_impl or default_rng_impl())

    def step(params, opt_state, batch, step_idx):
        rng = jax.random.fold_in(base, step_idx)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_step(model, item_contents) -> Callable:
    """Returns jitted step(params, batch) -> scores (B, K)."""

    def step(params, batch):
        return model.apply(params, batch, item_contents, training=False)

    return jax.jit(step)


def init_params(model, data_or_batch, item_contents, seed: int = 0):
    """Initialize params with a representative batch; uses the model's
    `warmup` method (if present) so auxiliary paths (offline LM slices)
    also create their params."""
    rng = jax.random.PRNGKey(seed)
    batch = {k: jnp.asarray(v) for k, v in data_or_batch.items()}
    method = getattr(model, "warmup", None)
    return model.init({"params": rng, "dropout": rng}, batch,
                      item_contents, training=False, method=method)
