"""Attention-based heads: AutoInt, DIN, MINER.

Parity: reference model/predictors/autoint_predictor.py:32-107 (stacked
MultiHeadSelfAttention over the 2-field (user, item) stack + optional DNN),
din_predictor.py:63-143 (Dice-activated DIN attention of the candidate
over the raw click sequence; ranking-only), miner_predictor.py:18-64
(target-aware attention over poly user codes; matching-only).
"""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import (
    MLPLayer, MultiHeadSelfAttention,
)
from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


@PREDICTORS.register
class AutoIntPredictor(BasePredictor):
    dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False
    num_attention_layers: int = 3
    num_attention_heads: int = 8
    attention_dim: int = 64
    attention_dropout: float = 0.0
    attention_layer_norm: bool = False
    use_scale: bool = False
    use_residual: bool = True

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        fields = jnp.stack([user, item], axis=-2)          # (..., 2, D)
        lead = fields.shape[:-2]
        x = fields.reshape((-1, 2, fields.shape[-1]))
        for i in range(self.num_attention_layers):
            x = MultiHeadSelfAttention(
                num_heads=self.num_attention_heads,
                attention_dim=self.attention_dim,
                dropout=self.attention_dropout,
                use_residual=self.use_residual,
                use_scale=self.use_scale,
                layer_norm=self.attention_layer_norm,
                relu_out=True, out_proj=False,
                dtype=self.dtype, name=f"attn_{i}")(x, training=training)
        flat = x.reshape(*lead, -1)
        out = nn.Dense(1, dtype=self.dtype, name="prediction")(flat).squeeze(-1)
        if self.dnn_hidden_units:
            dnn = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                           output_dim=1, activation=self.dnn_activations,
                           dropout=self.dnn_dropout,
                           batch_norm=self.dnn_batch_norm,
                           dtype=self.dtype)(
                fields.reshape(*lead, -1), training).squeeze(-1)
            out = out + dnn
        return out


@PREDICTORS.register
class DINPredictor(BasePredictor):
    """user input is the Null-operator dict {embedding (B,S,D), mask (B,S)}."""

    allow_matching: bool = False
    dnn_hidden_units: Tuple[int, ...] = ()
    dnn_activations: str = "relu"
    attention_hidden_units: Tuple[int, ...] = ()
    attention_dropout: float = 0.0
    net_dropout: float = 0.0
    batch_norm: bool = False
    din_use_softmax: bool = False

    @nn.compact
    def __call__(self, user, items, training: bool = False):
        clicks, mask = user["embedding"], user["mask"]      # (B,S,D), (B,S)
        if isinstance(clicks, dict):
            # SimpleInputer variant: concatenate columns on S
            cols = list(clicks)
            mask = jnp.concatenate([mask[c] for c in cols], axis=-1)
            clicks = jnp.concatenate([clicks[c] for c in cols], axis=-2)
        D = clicks.shape[-1]
        att_units = tuple(self.attention_hidden_units) or (D,)
        dnn_units = tuple(self.dnn_hidden_units) or (D * 8, D * 2, D)

        att_mlp = MLPLayer(hidden_units=att_units, output_dim=1,
                           use_dice=True, dropout=self.attention_dropout,
                           batch_norm=self.batch_norm, dtype=self.dtype,
                           name="att_mlp")
        dnn = MLPLayer(hidden_units=dnn_units, output_dim=1,
                       activation=self.dnn_activations,
                       dropout=self.net_dropout,
                       batch_norm=self.batch_norm, dtype=self.dtype,
                       name="dnn")

        # vectorize over candidates: (B, K, S, D) interaction tensor
        c = items[..., :, None, :]                          # (B, K, 1, D)
        cl = clicks[..., None, :, :]                        # (B, 1, S, D)
        c, cl = jnp.broadcast_arrays(c, cl)
        att_in = jnp.concatenate([c, cl, c - cl, c * cl], axis=-1)
        w = att_mlp(att_in, training).squeeze(-1)           # (B, K, S)
        m = mask[..., None, :].astype(w.dtype)
        w = w * m
        if self.din_use_softmax:
            w = jnp.where(m > 0, w, -1e9)
            w = nn.softmax(w, axis=-1)
        pooled = jnp.einsum("bks,bsd->bkd", w, clicks)
        return dnn(pooled, training).squeeze(-1)            # (B, K)


@PREDICTORS.register
class MINERPredictor(BasePredictor):
    """user is the PolyAttention output (B, C, D); items (B, K, D)."""

    allow_ranking: bool = False
    keep_input_dim: bool = True
    score_type: str = "weighted"

    @nn.compact
    def __call__(self, user, items, training: bool = False):
        scores = jnp.einsum("bkd,bcd->bkc", items, user)    # (B, K, C)
        if self.score_type == "max":
            return jnp.max(scores, axis=-1)
        if self.score_type == "mean":
            return jnp.mean(scores, axis=-1)
        assert self.score_type == "weighted", self.score_type
        proj = nn.gelu(nn.Dense(user.shape[-1], use_bias=False,
                                dtype=self.dtype)(user),
                       approximate=False)                   # (B, C, D)
        w = nn.softmax(jnp.einsum("bkd,bcd->bkc", items, proj), axis=-1)
        return jnp.sum(w * scores, axis=-1)
