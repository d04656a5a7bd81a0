"""AdaOperator — additive attention pooling only.

Parity: reference model/operators/ada_operator.py:18-38 (default user
operator for NAML/PLM-NR). Output dim == input dim.
"""
import flax.linen as nn

from legommenders_tpu.models.common import AdditiveAttention
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class AdaOperator(BaseOperator):
    additive_hidden_size: int = 256

    @property
    def output_dim(self):
        return self.input_dim

    @nn.compact
    def __call__(self, embeddings, mask=None, training: bool = False):
        return AdditiveAttention(self.additive_hidden_size,
                                 dtype=self.dtype)(embeddings, mask)
