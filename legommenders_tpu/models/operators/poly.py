"""PolyAttentionOperator — MINER user encoder (poly context codes).

Parity: reference model/operators/poly_attention_operator.py:20-62 —
tanh projection against learned context codes -> (B, num_codes, D);
`allow_caching = False` (user repr is a matrix, not a vector).
"""
import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class PolyAttentionOperator(BaseOperator):
    num_context_codes: int = 32
    context_code_dim: int = 200

    allow_caching: bool = False

    @property
    def output_dim(self):
        return self.input_dim

    @nn.compact
    def __call__(self, embeddings, mask=None, training: bool = False):
        B, L, D = embeddings.shape
        proj = jnp.tanh(nn.Dense(self.context_code_dim, use_bias=False,
                                 dtype=self.dtype)(embeddings))  # (B, L, C')
        codes = self.param(
            "context_codes",
            nn.initializers.xavier_uniform(),
            (self.num_context_codes, self.context_code_dim))
        weights = jnp.einsum("blc,kc->bkl", proj, codes)  # (B, K, L)
        if mask is not None:
            # reference masks with 1e-30 (not -inf) before softmax
            weights = jnp.where(mask[:, None, :] > 0, weights, 1e-30)
        weights = nn.softmax(weights, axis=-1)
        return jnp.einsum("bkl,bld->bkd", weights, embeddings)
