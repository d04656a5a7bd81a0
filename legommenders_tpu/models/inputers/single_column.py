"""SingleColumnInputer — one column, direct lookup (reference
model/inputer/single_column_inputer.py:10-34)."""
from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.utils.registry import INPUTERS


@INPUTERS.register
class SingleColumnInputer(BaseInputer):

    def get_embeddings(self, eh, contents, training: bool = False):
        assert len(self.cols) == 1, "SingleColumnInputer takes exactly one column"
        col, vocab, _ = self.cols[0]
        ids = contents[col]
        m = self.mask_of(ids)
        emb = eh.embed(ids, vocab, col, training=training)
        return emb * m[..., None].astype(emb.dtype), m
