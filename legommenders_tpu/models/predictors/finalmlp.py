"""FinalMLP predictor — dual-stream MLPs + bilinear InteractionAggregation.

Parity: reference model/predictors/final_mlp_predictor.py:81-146.
"""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import MLPLayer
from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


class InteractionAggregation(nn.Module):
    num_heads: int = 1
    output_dim: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        Dx, Dy = x.shape[-1], y.shape[-1]
        H = self.num_heads
        assert Dx % H == 0 and Dy % H == 0
        hx, hy = Dx // H, Dy // H
        out = (nn.Dense(self.output_dim, dtype=self.dtype, name="w_x")(x)
               + nn.Dense(self.output_dim, dtype=self.dtype, name="w_y")(y))
        w_xy = self.param("w_xy", nn.initializers.xavier_normal(),
                          (H, hx, hy * self.output_dim))
        head_x = x.reshape(*x.shape[:-1], H, hx)
        head_y = y.reshape(*y.shape[:-1], H, hy)
        # bilinear per head: x_h^T W_h y_h
        xw = jnp.einsum("...hx,hxz->...hz", head_x, w_xy)
        xw = xw.reshape(*x.shape[:-1], H, self.output_dim, hy)
        xy = jnp.einsum("...hoy,...hy->...ho", xw, head_y)
        return out + jnp.sum(xy, axis=-2)


@PREDICTORS.register
class FinalMLPPredictor(BasePredictor):
    mlp1_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    mlp1_hidden_activations: str = "relu"
    mlp1_dropout: float = 0.0
    mlp1_batch_norm: bool = False
    mlp2_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    mlp2_hidden_activations: str = "relu"
    mlp2_dropout: float = 0.0
    mlp2_batch_norm: bool = False
    num_heads: int = 1

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        x = jnp.concatenate([user, item], axis=-1)
        f1 = MLPLayer(hidden_units=tuple(self.mlp1_hidden_units),
                      activation=self.mlp1_hidden_activations,
                      dropout=self.mlp1_dropout,
                      batch_norm=self.mlp1_batch_norm,
                      dtype=self.dtype, name="mlp1")(x, training)
        f2 = MLPLayer(hidden_units=tuple(self.mlp2_hidden_units),
                      activation=self.mlp2_hidden_activations,
                      dropout=self.mlp2_dropout,
                      batch_norm=self.mlp2_batch_norm,
                      dtype=self.dtype, name="mlp2")(x, training)
        out = InteractionAggregation(self.num_heads, 1,
                                     dtype=self.dtype)(f1, f2)
        return out.squeeze(-1)
