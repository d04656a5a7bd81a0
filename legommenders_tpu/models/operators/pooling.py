"""PoolingOperator + Null operators + single-column pass-throughs.

Parity: reference model/operators/pooling_operator.py:23-61 (masked
mean/max pooling per column, then mean/flatten/max across columns),
null_operator.py:12-25 (pass-through dict for DIN), and
single_column_operator.py (identity over one column).
"""
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.inputers.simple import SimpleInputer
from legommenders_tpu.models.inputers.single_column import SingleColumnInputer
from legommenders_tpu.models.inputers.concat import ConcatInputer
from legommenders_tpu.ops.core import masked_max, masked_mean
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class PoolingOperator(BaseOperator):
    flatten: bool = False
    max_pooling: bool = False

    inputer_class = SimpleInputer

    @property
    def output_dim(self):
        return self.input_dim

    def __call__(self, embeddings, mask=None, training: bool = False):
        if not isinstance(embeddings, dict):
            embeddings, mask = {"temp": embeddings}, {"temp": mask}
        pooled = {}
        for col, emb in embeddings.items():
            m = mask[col].astype(emb.dtype)
            if self.max_pooling:
                pooled[col] = masked_max(emb, m)
            else:
                s = jnp.einsum("...l,...ld->...d", m, emb)
                pooled[col] = s / (m.sum(-1, keepdims=True) + 1e-8)
        order = list(embeddings)
        if self.flatten:
            return jnp.concatenate([pooled[c] for c in order], axis=-1)
        stack = jnp.stack([pooled[c] for c in order], axis=-2)
        if self.max_pooling:
            return jnp.max(stack, axis=-2)
        return jnp.mean(stack, axis=-2)


@OPERATORS.register
class NullSimpleOperator(BaseOperator):
    """Pass-through returning {embedding, mask} (DIN user side)."""

    inputer_class = SimpleInputer
    allow_caching: bool = False

    @property
    def output_dim(self):
        return self.input_dim

    def __call__(self, embeddings, mask=None, training: bool = False):
        return {"embedding": embeddings, "mask": mask}


@OPERATORS.register
class NullConcatOperator(NullSimpleOperator):
    inputer_class = ConcatInputer


@OPERATORS.register
class SCSimpleOperator(BaseOperator):
    """Single-column identity (reference single_column_operator.py)."""

    inputer_class = SingleColumnInputer

    @property
    def output_dim(self):
        return self.input_dim

    def __call__(self, embeddings, mask=None, training: bool = False):
        if embeddings.ndim == 3 and embeddings.shape[-2] == 1:
            return embeddings[..., 0, :]
        return embeddings


@OPERATORS.register
class SCFlattenOperator(SCSimpleOperator):
    flatten_mode: bool = True
    allow_caching: bool = False
