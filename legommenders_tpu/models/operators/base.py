"""Operator base — item/user encoders.

Parity: reference model/operators/base_operator.py:22-73 — the
config_class/inputer_class pattern, `allow_caching` (representation may be
precomputed for fast eval), `flatten_mode` (user-side operator consumes the
raw flattened history instead of per-click vectors), and
`prepare_for_predictor` (user expansion over candidates — here handled by
the predictor base via broadcasting, no data movement needed under XLA).

Each operator is a flax.linen module:
    __call__(embeddings, mask, training) -> (N, output_dim)
where `embeddings` is (N, L, D) for single-sequence inputers or a dict
col -> (N, L_c, D) for SimpleInputer-style operators.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.inputers.concat import ConcatInputer


class BaseOperator(nn.Module):
    hidden_size: int = 64
    input_dim: int = 64          # embedding dim fed by the inputer
    dtype: jnp.dtype = jnp.float32

    # class-level contract flags (reference base_operator.py:22-33)
    inputer_class = ConcatInputer
    allow_caching: bool = True
    flatten_mode: bool = False
    user_only: bool = False

    @property
    def output_dim(self) -> int:
        return self.hidden_size

    def __call__(self, embeddings, mask=None, training: bool = False):
        raise NotImplementedError

    @classmethod
    def default_config(cls) -> dict:
        return {}
