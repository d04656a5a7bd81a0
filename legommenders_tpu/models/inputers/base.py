"""Inputer base — the sample→tensor contract, device side.

Parity: reference model/inputer/base_inputer.py:10-41. In the reference an
inputer does host-side per-sample tensorization AND device-side embedding
lookup; here the host side is gone (content is gathered from device token
matrices, see models/item_table.py) and an inputer is a pure device mapping
    token-id arrays (…, L) int32 with UNSET padding
        -> embeddings (…, L', D) + mask (…, L')
`output_single_sequence` distinguishes concat-style (one sequence) from
simple-style (per-column dict) outputs, as in the reference.

The shared EmbeddingTables module is passed at call time (bound in the
parent Legommender's setup) rather than held as a field, so its params live
in exactly one scope.
"""
from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.data.token_store import UNSET

# column spec: (column_name, vocab_name, max_len)
ColSpec = Tuple[str, str, int]


class BaseInputer(nn.Module):
    cols: Tuple[ColSpec, ...] = ()
    output_single_sequence: bool = True
    dtype: jnp.dtype = jnp.float32

    # flatten-mode user inputers normally consume gathered item content
    # columns over the click history; an inputer with
    # `consumes_user_cols = True` instead reads user-store columns straight
    # from the batch (reference semantic_mix_inputer.py:24-27 reads the
    # user's own semantic column)
    consumes_user_cols = False

    def vocab_names(self):
        return sorted({v for _, v, _ in self.cols})

    @staticmethod
    def mask_of(ids: jnp.ndarray) -> jnp.ndarray:
        return (ids != UNSET).astype(jnp.int32)

    def get_embeddings(self, eh, contents: Dict[str, jnp.ndarray],
                       training: bool = False):
        raise NotImplementedError

    @property
    def total_len(self) -> int:
        return sum(l for _, _, l in self.cols)

    def __call__(self, eh, contents, training: bool = False):
        return self.get_embeddings(eh, contents, training)
