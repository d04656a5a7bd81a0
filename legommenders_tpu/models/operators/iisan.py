"""IISAN operators — frozen-LM side-adapter item encoders.

Parity: reference model/operators/iisan_operator.py:51-216 — the LM is
always cached: per-layer masked-mean-pooled sentence states `(N, H, D)` are
computed once offline (IISANLayerPager, iisan_operator.py:149-214) over the
`layer_selection_step`-strided layer subset (shifted so the last selected
layer is the final one); the trainable side network is a chain of gated
SANBlocks (up-down MLP + residual LayerNorm) fusing layer states with
learned scalar gates, plus optional global/local projections; the
transformer itself never runs at train time.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.operators.lm_ops import (
    BertOperator, LlamaOperator, LMOperator, OPTOperator, GLMOperator,
)
from legommenders_tpu.utils.registry import OPERATORS

IISAN_STATES_KEY = "__iisan_states__"


class SANBlock(nn.Module):
    """up-proj -> relu -> down-proj -> residual LayerNorm
    (reference iisan_operator.py:40-49)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        h = nn.relu(nn.Dense(D * 2, dtype=self.dtype, name="fc_up")(x))
        h = nn.Dense(D, dtype=self.dtype, name="fc_down")(h)
        return nn.LayerNorm(dtype=self.dtype)(h + x)


class IISANMixin(nn.Module):
    """Shared IISAN behavior over any LMOperator backbone (must subclass
    nn.Module so flax wraps `setup` with its registration context)."""

    @property
    def use_lm_cache(self) -> bool:
        return True

    @property
    def is_iisan(self) -> bool:
        return True

    @property
    def transformer_key(self) -> str:
        return (self.__class__.__name__.replace("Operator", "")
                .replace("IISAN", "").lower())

    def get_selected_layers(self):
        """Strided layer subset shifted so the last layer is included
        (reference iisan_operator.py:93-101)."""
        step = self.layer_selection_step
        n = self.num_hidden_layers
        sel = list(range(0, n, step))
        margin = n - sel[-1] - 1
        return [s + margin for s in sel]

    def setup(self):
        self.num_selected = len(self.get_selected_layers())
        self.lower_slice = self.make_slice(
            0, self.num_hidden_layers, trainable=False, name="lm",
            collect_pooled=True)
        if self.global_proj_size:
            self.global_projection = nn.Dense(
                self.global_proj_size, use_bias=False, dtype=self.dtype,
                name="global_proj")
        if self.local_proj_size:
            self.local_projections = [
                nn.Dense(self.local_proj_size, use_bias=False,
                         dtype=self.dtype, name=f"local_proj_{i}")
                for i in range(self.num_selected)]
        self.san_blocks = [SANBlock(dtype=self.dtype, name=f"san_{i}")
                           for i in range(self.num_selected - 1)]
        self.gates = self.param(
            "gates", lambda key, shape: jnp.full(shape, 0.5),
            (self.num_selected - 1,))
        self.linear = nn.Dense(self.hidden_size, dtype=self.dtype,
                               name="linear")

    def __call__(self, states, mask=None, training: bool = False):
        """states: gathered cached (B, H, D) selected-layer pooled states."""
        x = states.astype(self.dtype)
        if self.global_proj_size:
            x = self.global_projection(x)
        current = x[:, 0, :]
        if self.local_proj_size:
            current = self.local_projections[0](current)
        for i in range(self.num_selected - 1):
            nxt = x[:, i + 1, :]
            if self.local_proj_size:
                nxt = self.local_projections[i + 1](nxt)
            gate = nn.sigmoid(self.gates[i])
            current = self.san_blocks[i](gate * current + (1 - gate) * nxt)
        return self.linear(current)

    def encode_lower(self, embeddings, mask, training: bool = False):
        """Offline: all-layer pooled states (B, num_hidden_layers, D)."""
        return self.lower_slice(embeddings, mask, training)


class _IISANFields:
    layer_selection_step: int = 2
    global_proj_size: Optional[int] = None
    local_proj_size: Optional[int] = None


@OPERATORS.register
class BertIISANOperator(IISANMixin, _IISANFields, BertOperator):
    layer_selection_step: int = 2
    global_proj_size: Optional[int] = None
    local_proj_size: Optional[int] = None


@OPERATORS.register
class LlamaIISANOperator(IISANMixin, _IISANFields, LlamaOperator):
    layer_selection_step: int = 2
    global_proj_size: Optional[int] = None
    local_proj_size: Optional[int] = None


@OPERATORS.register
class OPTIISANOperator(IISANMixin, _IISANFields, OPTOperator):
    layer_selection_step: int = 2
    global_proj_size: Optional[int] = None
    local_proj_size: Optional[int] = None


@OPERATORS.register
class GLMIISANOperator(IISANMixin, _IISANFields, GLMOperator):
    layer_selection_step: int = 2
    global_proj_size: Optional[int] = None
    local_proj_size: Optional[int] = None
