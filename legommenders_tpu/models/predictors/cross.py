"""Cross-network heads: DCN, DCNv2 (CrossNetV2 / CrossNetMix), GDCN.

Parity: reference model/predictors/dcn_predictor.py:50-108,
dcnv2_predictor.py:65-206 (incl. the low-rank mixture-of-experts cross and
the stacked/parallel/stacked_parallel structures — note the reference feeds
`cross_output` to the parallel DNN, dcnv2_predictor.py:198-204; mirrored
here), gdcn_predictor.py:41-109 (gated cross layers).
"""
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import MLPLayer
from legommenders_tpu.models.predictors.base import BasePredictor
from legommenders_tpu.utils.registry import PREDICTORS


class CrossNet(nn.Module):
    """DCN v1: x_{l+1} = x_l + x0 * <w, x_l> + b."""

    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0):
        x = x0
        for i in range(self.num_layers):
            w = nn.Dense(1, use_bias=False, dtype=self.dtype,
                         name=f"w_{i}")(x)
            b = self.param(f"b_{i}", nn.initializers.zeros, (x0.shape[-1],))
            x = x + w * x0 + b
        return x


class CrossNetV2(nn.Module):
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0):
        x = x0
        for i in range(self.num_layers):
            x = x + x0 * nn.Dense(x0.shape[-1], dtype=self.dtype,
                                  name=f"cross_{i}")(x)
        return x


class CrossNetMix(nn.Module):
    """Low-rank mixture-of-experts cross (DCNv2 paper; reference
    dcnv2_predictor.py:80-137)."""

    num_layers: int = 2
    low_rank: int = 32
    num_experts: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0):
        D = x0.shape[-1]
        x = x0
        init = nn.initializers.xavier_normal()
        for i in range(self.num_layers):
            U = self.param(f"U_{i}", init, (self.num_experts, D, self.low_rank))
            V = self.param(f"V_{i}", init, (self.num_experts, D, self.low_rank))
            C = self.param(f"C_{i}", init,
                           (self.num_experts, self.low_rank, self.low_rank))
            bias = self.param(f"bias_{i}", nn.initializers.zeros, (D,))
            gates = jnp.stack(
                [nn.Dense(1, use_bias=False, dtype=self.dtype,
                          name=f"gate_{i}_{e}")(x).squeeze(-1)
                 for e in range(self.num_experts)], axis=-1)  # (..., E)
            gates = nn.softmax(gates, axis=-1)
            v_x = jnp.tanh(jnp.einsum("...d,edr->...er", x, V))
            # C @ v (rows r, cols s): out[r] = sum_s C[r,s] v[s]
            v_x = jnp.tanh(jnp.einsum("ers,...es->...er", C, v_x))
            uv_x = jnp.einsum("...er,edr->...ed", v_x, U)       # (..., E, D)
            expert_out = x0[..., None, :] * (uv_x + bias)       # hadamard
            moe = jnp.einsum("...ed,...e->...d", expert_out, gates)
            x = x + moe
        return x


class GateCrossLayer(nn.Module):
    num_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x0):
        x = x0
        for i in range(self.num_layers):
            xw = nn.Dense(x0.shape[-1], use_bias=False, dtype=self.dtype,
                          name=f"w_{i}")(x)
            xg = nn.sigmoid(nn.Dense(x0.shape[-1], use_bias=False,
                                     dtype=self.dtype, name=f"wg_{i}")(x))
            b = self.param(f"b_{i}", nn.initializers.uniform(1.0),
                           (x0.shape[-1],))
            x = x0 * (xw + b) * xg + x
        return x


@PREDICTORS.register
class DCNPredictor(BasePredictor):
    dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False
    cross_num: int = 3

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        x = jnp.concatenate([user, item], axis=-1)
        cross = CrossNet(self.cross_num, dtype=self.dtype)(x)
        dnn = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                       activation=self.dnn_activations,
                       dropout=self.dnn_dropout,
                       batch_norm=self.dnn_batch_norm,
                       dtype=self.dtype)(x, training)
        out = jnp.concatenate([cross, dnn], axis=-1)
        return nn.Dense(1, dtype=self.dtype)(out).squeeze(-1)


@PREDICTORS.register
class DCNv2Predictor(BasePredictor):
    model_structure: str = "parallel"
    use_low_rank_mixture: bool = False
    low_rank: int = 32
    num_experts: int = 4
    stacked_dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    parallel_dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    cross_num: int = 3
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        assert self.model_structure in (
            "crossnet_only", "stacked", "parallel", "stacked_parallel")
        x = jnp.concatenate([user, item], axis=-1)
        if self.use_low_rank_mixture:
            cross = CrossNetMix(self.cross_num, self.low_rank,
                                self.num_experts, dtype=self.dtype)(x)
        else:
            cross = CrossNetV2(self.cross_num, dtype=self.dtype)(x)

        def mlp(units, name):
            return MLPLayer(hidden_units=tuple(units),
                            activation=self.dnn_activations,
                            dropout=self.dnn_dropout,
                            batch_norm=self.dnn_batch_norm,
                            dtype=self.dtype, name=name)

        if self.model_structure == "crossnet_only":
            out = cross
        elif self.model_structure == "stacked":
            out = mlp(self.stacked_dnn_hidden_units, "stacked")(cross, training)
        elif self.model_structure == "parallel":
            dnn = mlp(self.parallel_dnn_hidden_units, "parallel")(cross, training)
            out = jnp.concatenate([cross, dnn], axis=-1)
        else:
            out = jnp.concatenate([
                mlp(self.stacked_dnn_hidden_units, "stacked")(cross, training),
                mlp(self.parallel_dnn_hidden_units, "parallel")(cross, training),
            ], axis=-1)
        return nn.Dense(1, dtype=self.dtype)(out).squeeze(-1)


@PREDICTORS.register
class GDCNPredictor(BasePredictor):
    dnn_hidden_units: Tuple[int, ...] = (1000, 1000, 1000)
    dnn_activations: str = "relu"
    dnn_dropout: float = 0.0
    dnn_batch_norm: bool = False
    cross_num: int = 3
    sequential_mode: bool = False

    @nn.compact
    def score_pair(self, user, item, training: bool = False):
        x = jnp.concatenate([user, item], axis=-1)
        cross = GateCrossLayer(self.cross_num, dtype=self.dtype)(x)
        if self.sequential_mode:
            out = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                           output_dim=1, activation=self.dnn_activations,
                           dropout=self.dnn_dropout,
                           batch_norm=self.dnn_batch_norm,
                           dtype=self.dtype)(cross, training)
            return out.squeeze(-1)
        dnn = MLPLayer(hidden_units=tuple(self.dnn_hidden_units),
                       activation=self.dnn_activations,
                       dropout=self.dnn_dropout,
                       batch_norm=self.dnn_batch_norm,
                       dtype=self.dtype)(x, training)
        out = jnp.concatenate([cross, dnn], axis=-1)
        return nn.Dense(1, dtype=self.dtype)(out).squeeze(-1)
