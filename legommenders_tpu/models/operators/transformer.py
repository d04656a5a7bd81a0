"""TransformerOperator — randomly-initialized BERT-style encoder.

Parity: reference model/operators/transformer_operator.py:22-61 (BertModel
over inputs_embeds + Linear + AdditiveAttention). Implemented natively:
learned positions + N post-LN transformer layers with BERT geometry
(intermediate = 4x hidden as configured in the reference: note the
reference sets intermediate_size = hidden_size*4, i.e. the OUTPUT hidden,
while layers run at input_dim — mirrored).
"""
import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import (
    AdditiveAttention, MultiHeadSelfAttention,
)
from legommenders_tpu.models.inputers.flatten import FlattenSeqInputer
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


class TransformerLayer(nn.Module):
    num_heads: int = 8
    intermediate_size: int = 256
    dropout: float = 0.1
    sequence_parallel: bool = False
    sp_impl: str = "ulysses"   # or "ring" (ops/ring_attention.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask, training: bool = False):
        D = x.shape[-1]
        attn = MultiHeadSelfAttention(
            num_heads=self.num_heads,
            dropout=0.0 if self.sequence_parallel else self.dropout,
            use_scale=True, sequence_parallel=self.sequence_parallel,
            sp_impl=self.sp_impl,
            dtype=self.dtype, name="attn")(
            x, mask, training=training)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not training)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x + attn)
        ff = nn.Dense(self.intermediate_size, dtype=self.dtype)(x)
        ff = nn.Dense(D, dtype=self.dtype)(nn.gelu(ff, approximate=False))
        ff = nn.Dropout(self.dropout)(ff, deterministic=not training)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x + ff)


@OPERATORS.register
class TransformerOperator(BaseOperator):
    num_attention_heads: int = 8
    attention_dropout: float = 0.1
    num_hidden_layers: int = 3
    max_position_embeddings: int = 1024
    # opt-in SP (long flattened histories): per-layer sharded attention
    # (sp_impl: "ulysses" all-to-all or "ring" rotating-KV) + two-psum
    # additive pooling, active under parallel.mesh.sequence_parallel
    sequence_parallel: bool = False
    sp_impl: str = "ulysses"

    @nn.compact
    def __call__(self, embeddings, mask=None, training: bool = False):
        B, L, D = embeddings.shape
        if mask is None:
            mask = jnp.ones((B, L), jnp.int32)
        positions = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_position_embeddings, D))
        x = embeddings + positions[None, :L, :]
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x)
        for i in range(self.num_hidden_layers):
            x = TransformerLayer(
                self.num_attention_heads, self.hidden_size * 4,
                self.attention_dropout,
                sequence_parallel=self.sequence_parallel,
                sp_impl=self.sp_impl,
                dtype=self.dtype,
                name=f"layer_{i}")(x, mask, training)
        x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
        return AdditiveAttention(self.hidden_size,
                                 sequence_parallel=self.sequence_parallel,
                                 dtype=self.dtype)(x, mask)


@OPERATORS.register
class FlattenTransformerOperator(TransformerOperator):
    """BST-style user operator over the flattened history sequence
    (reference model/operators/flatten_transformer_operator.py)."""

    flatten_mode: bool = True
    user_only: bool = True
    allow_caching: bool = False
    inputer_class = FlattenSeqInputer
