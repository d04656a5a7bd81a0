"""SemanticOperator — cumulative semantic-layer user encoder.

Parity: reference model/operators/semantic_operator.py:32-85 — user-only
flatten-mode operator over (B, S, C, D) semantic-code embeddings: for each
semantic layer i a cloned base user operator encodes the cumulative
residual sum of code embeddings; layer outputs are stacked and (by
default) pooled by additive attention. `return_stack=True` yields the
(B, C, D) stack for the PolyPredictor.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import AdditiveAttention
from legommenders_tpu.models.inputers.semantic import (
    SemanticInputer, SemanticMixInputer,
)
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class SCMixOperator(BaseOperator):
    """User-side pass-through over the user's own semantic-code column.

    The reference ships SemanticMixInputer (semantic_mix_inputer.py:10-38)
    and SemanticMixPredictor without an operator binding them into a model;
    this operator completes the wiring (deliberate divergence): user codes
    (B, Su) embed via the shared semantic vocab and pass through unchanged,
    giving the (B, Su, D) stack the SemanticMix predictor expects.
    """

    inputer_class = SemanticMixInputer
    flatten_mode = True
    user_only = True
    allow_caching = False

    @property
    def output_dim(self):
        return self.input_dim

    def __call__(self, embeddings, mask=None, training: bool = False):
        return embeddings


@OPERATORS.register
class SemanticOperator(BaseOperator):
    base_operator: str = "Ada"
    base_operator_config: Optional[dict] = None
    num_semantic_layers: int = 4
    additive_hidden_size: int = 256
    return_stack: bool = False

    inputer_class = SemanticInputer
    flatten_mode = True
    user_only = True
    allow_caching = False

    @property
    def output_dim(self):
        return self.input_dim

    def setup(self):
        cls = OPERATORS[self.base_operator]
        cfg = dict(self.base_operator_config or {})
        cfg = {k: v for k, v in cfg.items() if k in cls.__dataclass_fields__}
        cfg.setdefault("hidden_size", self.hidden_size)
        cfg.setdefault("input_dim", self.input_dim)
        self.base_ops = [cls(dtype=self.dtype, name=f"base_{i}", **cfg)
                         for i in range(self.num_semantic_layers)]
        self.pool = AdditiveAttention(self.additive_hidden_size,
                                      dtype=self.dtype, name="pool")

    def __call__(self, embeddings, mask=None, training: bool = False):
        """embeddings (B, S, C, D); mask (B, S) -> (B, D) or (B, C, D)."""
        C = embeddings.shape[2]
        n = min(C, self.num_semantic_layers)
        increment = jnp.zeros(
            embeddings.shape[:2] + embeddings.shape[-1:],
            embeddings.dtype)
        outs = []
        for i in range(n):
            increment = increment + embeddings[:, :, i, :]
            outs.append(self.base_ops[i](increment, mask, training=training))
        stack = jnp.stack(outs, axis=1)           # (B, C, D')
        if self.return_stack:
            return stack
        return self.pool(stack)
