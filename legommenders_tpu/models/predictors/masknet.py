"""MaskNet predictor — serial/parallel instance-guided mask blocks.

Parity: reference model/predictors/mask_net_predictor.py:61-192.
"""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import MLPLayer, get_activation
from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


class MaskBlock(nn.Module):
    hidden_dim: int
    output_dim: int
    activation: str = "relu"
    reduction_ratio: float = 1.0
    dropout: float = 0.0
    layer_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embeddings, hidden_states, training: bool = False):
        mid = int(self.hidden_dim * self.reduction_ratio)
        mask = nn.Dense(self.hidden_dim, dtype=self.dtype)(
            nn.relu(nn.Dense(mid, dtype=self.dtype)(embeddings)))
        x = nn.Dense(self.output_dim, use_bias=False,
                     dtype=self.dtype)(mask * hidden_states)
        if self.layer_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = get_activation(self.activation)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=not training)
        return x


@PREDICTORS.register
class MaskNetPredictor(BasePredictor):
    hidden_units: Tuple[int, ...] = (64, 64)
    activations: str = "relu"
    output_activation: str = None
    dropout: float = 0.0
    layer_norm: bool = True
    embed_layer_norm: bool = True
    reduction_ratio: float = 1.0
    num_blocks: int = 1
    block_dim: int = 64
    sequential_mode: bool = False

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        x = jnp.concatenate([user, item], axis=-1)
        if self.embed_layer_norm:
            hidden = jnp.concatenate(
                [nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_u")(user),
                 nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_i")(item)],
                axis=-1)
        else:
            hidden = x

        if self.sequential_mode:
            out = hidden
            units = list(self.hidden_units)
            widths = [x.shape[-1]] + units
            for i in range(len(widths) - 1):
                out = MaskBlock(widths[i], widths[i + 1],
                                self.activations, self.reduction_ratio,
                                self.dropout, self.layer_norm,
                                dtype=self.dtype, name=f"block_{i}")(
                    x, out, training)
            out = nn.Dense(1, dtype=self.dtype, name="fc")(out)
            if self.output_activation:
                out = get_activation(self.output_activation)(out)
            return out.squeeze(-1)

        blocks = [MaskBlock(x.shape[-1], self.block_dim,
                            self.activations, self.reduction_ratio,
                            self.dropout, self.layer_norm,
                            dtype=self.dtype, name=f"block_{i}")(
                      x, hidden, training)
                  for i in range(self.num_blocks)]
        concat = jnp.concatenate(blocks, axis=-1)
        out = MLPLayer(hidden_units=tuple(self.hidden_units), output_dim=1,
                       activation=self.activations,
                       output_activation=self.output_activation,
                       dropout=self.dropout, dtype=self.dtype,
                       name="dnn")(concat, training)
        return out.squeeze(-1)
