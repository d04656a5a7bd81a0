"""AttentionOperator — NRMS-style self-attention encoder.

Parity: reference model/operators/attention_operator.py:24-59 —
MultiheadAttention over the sequence, Linear to hidden, additive-attention
pooling.
"""
import flax.linen as nn

from legommenders_tpu.models.common import AdditiveAttention, MultiHeadSelfAttention
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class AttentionOperator(BaseOperator):
    num_attention_heads: int = 8
    attention_dropout: float = 0.1
    additive_hidden_size: int = 256

    @nn.compact
    def __call__(self, embeddings, mask=None, training: bool = False):
        out = MultiHeadSelfAttention(
            num_heads=self.num_attention_heads,
            dropout=self.attention_dropout,
            use_scale=True,
            dtype=self.dtype,
        )(embeddings, mask, training=training)
        out = nn.Dense(self.hidden_size, dtype=self.dtype)(out)
        return AdditiveAttention(self.additive_hidden_size,
                                 dtype=self.dtype)(out, mask)
