"""SimpleInputer — columns kept separate (reference
model/inputer/simple_inputer.py:11-66): per-column padded ids+masks,
embeddings returned as an ordered dict col -> (…, L, D)."""
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.utils.registry import INPUTERS


@INPUTERS.register
class SimpleInputer(BaseInputer):
    output_single_sequence: bool = False

    def get_embeddings(self, eh, contents: Dict[str, jnp.ndarray],
                       training: bool = False):
        embs, masks = {}, {}
        for col, vocab, _ in self.cols:
            ids = contents[col]
            m = self.mask_of(ids)
            emb = eh.embed(ids, vocab, col, training=training)
            embs[col] = (emb * m[..., None].astype(emb.dtype)).astype(self.dtype)
            masks[col] = m
        return embs, masks
