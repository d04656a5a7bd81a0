"""GRUOperator — LSTUR user encoder.

Parity: reference model/operators/gru_operator.py:18-54 — packed GRU over
the click sequence, take the last valid hidden state, Linear back to
input_dim. TPU version: flax nn.RNN(GRUCell) with seq_lengths (masked
carry), which yields the hidden state at the last valid step.
"""
import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class GRUOperator(BaseOperator):
    num_layers: int = 1

    @property
    def output_dim(self):
        return self.input_dim

    @nn.compact
    def __call__(self, embeddings, mask=None, training: bool = False):
        B, L, D = embeddings.shape
        if mask is None:
            mask = jnp.ones((B, L), jnp.int32)
        lengths = jnp.maximum(mask.astype(jnp.int32).sum(axis=1), 1)

        x = embeddings
        carry = None
        for layer in range(self.num_layers):
            rnn = nn.RNN(nn.GRUCell(features=self.hidden_size,
                                    dtype=self.dtype),
                         name=f"gru_{layer}")
            carry, x = rnn(x, seq_lengths=lengths, return_carry=True)
        return nn.Dense(self.input_dim, dtype=self.dtype)(carry)
