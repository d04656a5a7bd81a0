"""Semantic-code inputers (ONCE semantic-ID family).

Parity: reference model/inputer/semantic_inputer.py:12-66 (user history ×
per-item semantic-code matrix -> (B, S, C) ids embedded via the item
semantic vocab; mask = click mask) and semantic_mix_inputer.py:10-38
(user-side semantic codes as one sequence, mask of ones).
"""
from typing import Dict

import jax.numpy as jnp

from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.utils.registry import INPUTERS


@INPUTERS.register
class SemanticInputer(BaseInputer):
    output_single_sequence = False

    def get_embeddings(self, eh, contents: Dict[str, jnp.ndarray],
                       training: bool = False):
        assert len(self.cols) == 1, \
            "semantic inputer supports one semantic column"
        col, vocab, _ = self.cols[0]
        ids = contents[col]                       # (B, S, C)
        click_mask = (ids != -1).any(axis=-1).astype(jnp.int32)  # (B, S)
        emb = eh.embed(ids, vocab, col, training=training)       # (B,S,C,D)
        return emb, click_mask


@INPUTERS.register
class SemanticMixInputer(BaseInputer):
    output_single_sequence = True
    consumes_user_cols = True

    def get_embeddings(self, eh, contents: Dict[str, jnp.ndarray],
                       training: bool = False):
        assert len(self.cols) == 1
        col, vocab, _ = self.cols[0]
        ids = contents[col]                       # (B, C)
        emb = eh.embed(ids, vocab, col, training=training)
        return emb, jnp.ones(ids.shape, jnp.int32)
