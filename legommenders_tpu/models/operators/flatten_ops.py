"""Flatten-mode user operators (BST-style).

Parity: reference model/operators/flatten_fastformer_operator.py /
flatten_transformer_operator.py — parent architectures consuming the
FlattenSeqInputer sequence; user-only, no caching.
(FlattenTransformerOperator lives in operators/transformer.py.)
"""
from legommenders_tpu.models.inputers.flatten import FlattenSeqInputer
from legommenders_tpu.models.operators.fastformer import FastformerOperator
from legommenders_tpu.utils.registry import OPERATORS


@OPERATORS.register
class FlattenFastformerOperator(FastformerOperator):
    flatten_mode: bool = True
    user_only: bool = True
    allow_caching: bool = False
    inputer_class = FlattenSeqInputer
