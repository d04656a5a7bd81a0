"""CNNOperator / CNNCatOperator — NAML/LSTUR item encoders.

Parity: reference model/operators/cnn_operator.py:25-67 (per-column Conv1d
'same' + ReLU + mask + dropout, length-1 columns get a Linear; concat on
the sequence axis then additive attention) and cnn_cat_operator.py
(per-column CNN + additive attention, concat on the feature axis,
output_dim = hidden × num_cols).
"""
import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import AdditiveAttention
from legommenders_tpu.models.inputers.simple import SimpleInputer
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class CNNOperator(BaseOperator):
    kernel_size: int = 3
    dropout: float = 0.1
    additive_hidden_size: int = 256

    inputer_class = SimpleInputer

    @nn.compact
    def __call__(self, embeddings: dict, mask: dict = None,
                 training: bool = False):
        conv = nn.Conv(self.hidden_size, kernel_size=(self.kernel_size,),
                       padding="SAME", dtype=self.dtype, name="cnn")
        linear = nn.Dense(self.hidden_size, dtype=self.dtype, name="linear")
        outs, out_masks = [], []
        for col, emb in embeddings.items():
            m = mask[col]
            if emb.shape[-2] > 1:
                x = nn.relu(conv(emb))
                x = x * m[..., None].astype(x.dtype)
                x = nn.Dropout(self.dropout)(x, deterministic=not training)
            else:
                x = linear(emb)
            outs.append(x)
            out_masks.append(m)
        seq = jnp.concatenate(outs, axis=-2)
        seq_mask = jnp.concatenate(out_masks, axis=-1)
        return AdditiveAttention(self.additive_hidden_size,
                                 dtype=self.dtype)(seq, seq_mask)


@OPERATORS.register
class CNNCatOperator(BaseOperator):
    kernel_size: int = 3
    dropout: float = 0.1
    additive_hidden_size: int = 256

    inputer_class = SimpleInputer
    num_cols: int = 1  # set by the builder from the item input spec

    @property
    def output_dim(self):
        return self.hidden_size * self.num_cols

    @nn.compact
    def __call__(self, embeddings: dict, mask: dict = None,
                 training: bool = False):
        outs = []
        for col, emb in embeddings.items():
            m = mask[col]
            if emb.shape[-2] > 1:
                x = nn.Conv(self.hidden_size, (self.kernel_size,),
                            padding="SAME", dtype=self.dtype,
                            name=f"cnn_{col}")(emb)
                x = nn.relu(x)
                x = x * m[..., None].astype(x.dtype)
                x = nn.Dropout(self.dropout)(x, deterministic=not training)
            else:
                x = nn.Dense(self.hidden_size, dtype=self.dtype,
                             name=f"linear_{col}")(emb)
            pooled = AdditiveAttention(self.additive_hidden_size,
                                       dtype=self.dtype,
                                       name=f"att_{col}")(x, m)
            outs.append(pooled)
        return jnp.concatenate(outs, axis=-1)
