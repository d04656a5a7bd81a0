"""Predictor base — scoring heads.

Parity: reference model/predictors/base_predictor.py:13-31 — flags
`allow_ranking` / `allow_matching` / `keep_input_dim`.

Contract (TPU-first): `__call__(user, items, ...)` where
    user  : (B, D)  [or (B, C, D) for keep_input_dim heads like MINER]
    items : (B, K, D)
returns scores (B, K). The reference instead expands the user B -> B·K and
flattens (legommender.py:268-283); under XLA broadcasting inside one fused
kernel is free, so predictors broadcast internally. Pairwise heads implement
`score_pair(u, i)` on (..., D) leading-broadcast inputs.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class BasePredictor(nn.Module):
    hidden_size: int = 64
    dtype: jnp.dtype = jnp.float32

    allow_ranking: bool = True
    allow_matching: bool = True
    keep_input_dim: bool = False

    def score_pair(self, user: jnp.ndarray, item: jnp.ndarray,
                   training: bool = False) -> jnp.ndarray:
        """(..., D), (..., D) -> (...,). Override in pairwise heads."""
        raise NotImplementedError

    @nn.compact
    def __call__(self, user: jnp.ndarray, items: jnp.ndarray,
                 training: bool = False) -> jnp.ndarray:
        K = items.shape[-2]
        u = jnp.broadcast_to(user[..., None, :], (*user.shape[:-1], K,
                                                  user.shape[-1]))
        return self.score_pair(u, items, training=training)
