"""FastformerOperator — additive-attention transformer encoder.

Parity: reference model/common/fastformer.py:6-227 (vendored Fastformer:
per-head additive query/key pooling, BERT-style FFN + residual LayerNorms,
learned positions, attention-pooling head) wired by
model/operators/fastformer_operator.py:24-49 (FastformerModel + Linear).
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


class FastSelfAttention(nn.Module):
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, neg_mask_bias):
        """x (B, L, D); neg_mask_bias (B, 1, L) additive -1e4 mask."""
        D = x.shape[-1]
        H = self.num_heads
        d = D // H
        B, L = x.shape[0], x.shape[1]

        q = nn.Dense(D, dtype=self.dtype, name="query")(x)
        k = nn.Dense(D, dtype=self.dtype, name="key")(x)

        # global query: per-head softmax over L of scalar scores
        q_score = nn.Dense(H, dtype=self.dtype, name="query_att")(q) / (d ** 0.5)
        q_score = q_score.transpose(0, 2, 1) + neg_mask_bias       # (B, H, L)
        q_w = nn.softmax(q_score, axis=-1)
        q_heads = q.reshape(B, L, H, d).transpose(0, 2, 1, 3)       # (B,H,L,d)
        pooled_q = jnp.einsum("bhl,bhld->bhd", q_w, q_heads)
        pooled_q_full = pooled_q.transpose(0, 1, 2).reshape(B, 1, D)

        mixed_qk = k * pooled_q_full                                # (B, L, D)
        k_score = nn.Dense(H, dtype=self.dtype,
                           name="key_att")(mixed_qk) / (d ** 0.5)
        k_score = k_score.transpose(0, 2, 1) + neg_mask_bias
        k_w = nn.softmax(k_score, axis=-1)
        k_heads = mixed_qk.reshape(B, L, H, d).transpose(0, 2, 1, 3)
        pooled_k = jnp.einsum("bhl,bhld->bhd", k_w, k_heads)        # (B,H,d)

        weighted_value = (pooled_k[:, :, None, :] * q_heads)        # (B,H,L,d)
        weighted_value = weighted_value.transpose(0, 2, 1, 3).reshape(B, L, D)
        return nn.Dense(D, dtype=self.dtype,
                        name="transform")(weighted_value) + q


class FastformerLayer(nn.Module):
    num_heads: int = 8
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, neg_mask_bias, training: bool = False):
        D = x.shape[-1]
        attn = FastSelfAttention(self.num_heads, dtype=self.dtype)(
            x, neg_mask_bias)
        attn = nn.Dense(D, dtype=self.dtype, name="self_out")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=not training)
        attn = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(attn + x)
        # BERT FFN
        # exact-erf gelu: HF BertIntermediate's "gelu" (parity with the
        # vendored reference fastformer.py FFN)
        inter = nn.gelu(nn.Dense(D * 4, dtype=self.dtype,
                                 name="intermediate")(attn),
                        approximate=False)
        out = nn.Dense(D, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(out + attn)


@OPERATORS.register
class FastformerOperator(BaseOperator):
    num_hidden_layers: int = 3
    num_attention_heads: int = 8
    hidden_dropout_prob: float = 0.1
    max_position_embeddings: int = 512
    # SP: the final additive pooler uses the explicit two-psum decomposition
    # under an active SP mesh; the fastformer mixing layers stay GSPMD-
    # sharded (their global softmaxes are handled by the partitioner)
    sequence_parallel: bool = False

    @nn.compact
    def __call__(self, embeddings, mask=None, training: bool = False):
        from legommenders_tpu.models.common import AdditiveAttention

        B, L, D = embeddings.shape
        if mask is None:
            mask = jnp.ones((B, L), jnp.float32)
        mask = mask.astype(jnp.float32)
        neg_bias = ((1.0 - mask) * -10000.0)[:, None, :]    # (B, 1, L)

        positions = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (self.max_position_embeddings, D))
        x = embeddings + positions[None, :L, :]
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype)(x)
        x = nn.Dropout(self.hidden_dropout_prob)(
            x, deterministic=not training)
        for i in range(self.num_hidden_layers):
            x = FastformerLayer(self.num_attention_heads,
                                self.hidden_dropout_prob,
                                dtype=self.dtype, name=f"layer_{i}")(
                x, neg_bias, training)
        pooled = AdditiveAttention(hidden_size=D, dtype=self.dtype,
                                   sequence_parallel=self.sequence_parallel,
                                   name="pooler")(x, mask)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        name="proj")(pooled)
