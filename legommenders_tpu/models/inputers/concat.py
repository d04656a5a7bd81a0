"""ConcatInputer — all input columns as one token sequence.

Parity: reference model/inputer/concat_inputer.py:24-114 — optional [CLS]
prefix and [SEP] after each column from a private special-token vocab;
per-column vocab-embedding lookups concatenated into one (…, L, D) tensor
masked by the UNSET sentinel.

Layout note (deliberate TPU divergence): the reference compacts each
sample's non-pad tokens to the left before padding; we keep fixed per-column
slots and rely on the mask, which is equivalent for position-free encoders
(additive/self-attention pooling). Encoders that consume positions (BERT,
Fastformer with learned positions) set `compact=True`, which performs an
in-jit stable-argsort compaction to reproduce the reference layout.
"""
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.utils.registry import INPUTERS

CLS, SEP = 0, 1


def compact_sequence(emb: jnp.ndarray, mask: jnp.ndarray):
    """Move valid positions to the front (stable), as if tokens had been
    concatenated before padding. emb (..., L, D), mask (..., L)."""
    order = jnp.argsort(1 - mask, axis=-1, stable=True)
    emb_c = jnp.take_along_axis(emb, order[..., None], axis=-2)
    mask_c = jnp.take_along_axis(mask, order, axis=-1)
    return emb_c, mask_c


@INPUTERS.register
class ConcatInputer(BaseInputer):
    use_cls_token: bool = False
    use_sep_token: bool = False
    compact: bool = False

    @property
    def total_len(self) -> int:
        n = sum(l for _, _, l in self.cols)
        if self.use_sep_token:
            n += len(self.cols)
        if self.use_cls_token:
            n += 1
        return n

    @nn.compact
    def get_embeddings(self, eh, contents: Dict[str, jnp.ndarray],
                       training: bool = False):
        dim = eh.dim_of(self.cols[0][1], self.cols[0][0])
        parts, mask_parts = [], []

        if self.use_cls_token or self.use_sep_token:
            special = self.param(
                "special_tokens", nn.initializers.normal(0.02), (2, dim))
        first = contents[self.cols[0][0]]
        lead = first.shape[:-1]

        if self.use_cls_token:
            cls_vec = jnp.broadcast_to(
                special[CLS].astype(self.dtype), (*lead, 1, dim))
            parts.append(cls_vec)
            mask_parts.append(jnp.ones((*lead, 1), jnp.int32))

        for col, vocab, _ in self.cols:
            ids = contents[col]
            m = self.mask_of(ids)
            emb = eh.embed(ids, vocab, col, training=training)
            emb = emb * m[..., None].astype(emb.dtype)
            parts.append(emb.astype(self.dtype))
            mask_parts.append(m)
            if self.use_sep_token:
                sep_vec = jnp.broadcast_to(
                    special[SEP].astype(self.dtype), (*lead, 1, dim))
                parts.append(sep_vec)
                mask_parts.append(jnp.ones((*lead, 1), jnp.int32))

        emb = jnp.concatenate(parts, axis=-2)
        mask = jnp.concatenate(mask_parts, axis=-1)
        if self.compact:
            emb, mask = compact_sequence(emb, mask)
        return emb, mask
