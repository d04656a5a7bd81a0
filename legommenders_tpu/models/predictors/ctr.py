"""FuxiCTR-derived scoring heads: DNN, DeepFM, PNN.

Parity: reference model/predictors/dnn_predictor.py:46-73 (MLP over
concat(u, i)), deepfm_predictor.py:46-84 (FM bi-interaction + DNN,
averaged), pnn_predictor.py:31-85 (inner-product interaction + DNN).
"""
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import MLPLayer
from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


@PREDICTORS.register
class DNNPredictor(BasePredictor):
    dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        x = jnp.concatenate([user, item], axis=-1)
        out = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                       output_dim=1, activation=self.dnn_activations,
                       dropout=self.dnn_dropout,
                       batch_norm=self.dnn_batch_norm,
                       dtype=self.dtype)(x, training)
        return out.squeeze(-1)


@PREDICTORS.register
class DeepFMPredictor(BasePredictor):
    dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        fields = jnp.stack([user, item], axis=-2)          # (..., 2, D)
        # FM bi-interaction: 0.5 * ((sum)^2 - sum(squares)), summed over D
        s = jnp.sum(fields, axis=-2)
        sq = jnp.sum(fields ** 2, axis=-2)
        fm = 0.5 * jnp.sum(s ** 2 - sq, axis=-1)           # (...,)
        flat = jnp.concatenate([user, item], axis=-1)
        dnn = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                       output_dim=1, activation=self.dnn_activations,
                       dropout=self.dnn_dropout,
                       batch_norm=self.dnn_batch_norm,
                       dtype=self.dtype)(flat, training).squeeze(-1)
        return (fm + dnn) / 2.0


@PREDICTORS.register
class PNNPredictor(BasePredictor):
    dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        # two fields -> single upper-triangular inner product <u, i>
        inner = jnp.sum(user * item, axis=-1, keepdims=True)
        x = jnp.concatenate([user, item, inner], axis=-1)
        out = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                       output_dim=1, activation=self.dnn_activations,
                       dropout=self.dnn_dropout,
                       batch_norm=self.dnn_batch_norm,
                       dtype=self.dtype)(x, training)
        return out.squeeze(-1)
