"""FlattenSeqInputer — an entire click history as one long token sequence.

Parity: reference model/inputer/flatten_seq_inputer.py:13-86 — history ×
item attrs flattened with optional [CLS] prefix, [ATTR_SEP] between a
click's attribute columns and [SEP] after each click; special ids come
from a private 4-token vocab ([PAD]/[CLS]/[SEP]/[ATTR_SEP]).

Device-side layout: contents arrive as {col: (B, S, L_col)} gathered
history token matrices; the flattened sequence keeps fixed per-click slots
    [attr0 tokens, ATTR_SEP, attr1 tokens, ..., SEP] × S
with pad positions masked (the reference compacts tokens left; the fixed
layout is mask-equivalent for position-free encoders; positional encoders
may enable `compact=True` for reference layout).
"""
from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.models.inputers.concat import compact_sequence
from legommenders_tpu.utils.registry import INPUTERS

PAD, CLS, SEP, ATTR_SEP = 0, 1, 2, 3


@INPUTERS.register
class FlattenSeqInputer(BaseInputer):
    use_cls_token: bool = False
    use_sep_token: bool = True
    use_attr_sep_token: bool = True
    compact: bool = False

    @property
    def per_click_len(self) -> int:
        n = sum(l for _, _, l in self.cols)
        if self.use_sep_token:
            n += 1
        if self.use_attr_sep_token:
            n += len(self.cols) - 1
        return n

    @nn.compact
    def get_embeddings(self, eh, contents: Dict[str, jnp.ndarray],
                       training: bool = False):
        first = contents[self.cols[0][0]]          # (B, S, L0)
        B, S = first.shape[0], first.shape[1]
        dim = eh.dim_of(self.cols[0][1], self.cols[0][0])
        special = self.param("special_tokens",
                             nn.initializers.normal(0.02), (4, dim))

        parts, mask_parts = [], []
        # per-click slots: attr tokens (+ATTR_SEP between), then SEP
        for idx, (col, vocab, _) in enumerate(self.cols):
            ids = contents[col]                    # (B, S, L)
            m = self.mask_of(ids)
            emb = eh.embed(ids, vocab, col, training=training)
            emb = emb * m[..., None].astype(emb.dtype)
            parts.append(emb.astype(self.dtype))
            mask_parts.append(m)
            is_last = idx == len(self.cols) - 1
            token = SEP if is_last and self.use_sep_token else (
                ATTR_SEP if not is_last and self.use_attr_sep_token else None)
            if token is not None:
                # special token is real only when the click has any token
                click_valid = (m.sum(axis=-1, keepdims=True) > 0)
                vec = jnp.broadcast_to(
                    special[token].astype(self.dtype), (B, S, 1, dim))
                vec = vec * click_valid[..., None].astype(vec.dtype)
                parts.append(vec)
                mask_parts.append(click_valid.astype(jnp.int32))

        emb = jnp.concatenate(parts, axis=2)        # (B, S, per_click, D)
        mask = jnp.concatenate(mask_parts, axis=2)  # (B, S, per_click)
        emb = emb.reshape(B, S * emb.shape[2], dim)
        mask = mask.reshape(B, -1)

        if self.use_cls_token:
            cls_vec = jnp.broadcast_to(
                special[CLS].astype(self.dtype), (B, 1, dim))
            emb = jnp.concatenate([cls_vec, emb], axis=1)
            mask = jnp.concatenate(
                [jnp.ones((B, 1), jnp.int32), mask], axis=1)
        if self.compact:
            emb, mask = compact_sequence(emb, mask)
        return emb, mask
