"""HF token-embedding extractors: BERT / Llama / OPT / GLM.

Parity: reference embedder/{bert,llama,opt,glm}_embedder.py — pull the
word-embedding table out of a HuggingFace checkpoint (torch, CPU) and
export it as float32 numpy. Checkpoint paths come from the `.model`
dotfile registry (utils/config_init.py ModelInit) or an explicit
`model_path`; loading is lazy and clearly errors when the checkpoint is
absent (no-egress environment).
"""
import numpy as np

from legommenders_tpu.embedders.base import BaseEmbedder
from legommenders_tpu.utils.registry import EMBEDDERS


class HFEmbedder(BaseEmbedder):
    """Extract `model.embeddings.word_embeddings` / `embed_tokens`."""

    def _load(self):
        if not self.model_path:
            raise FileNotFoundError(
                f"{self.name()} requires a local HF checkpoint path "
                f"(model_path=... or .model dotfile)")
        from transformers import AutoModel

        return AutoModel.from_pretrained(self.model_path)

    def _embedding_module(self, model):
        for attr in ("embeddings", "decoder", "model"):
            sub = getattr(model, attr, None)
            if sub is None:
                continue
            for name in ("word_embeddings", "embed_tokens"):
                emb = getattr(sub, name, None)
                if emb is not None:
                    return emb
                inner = getattr(sub, "decoder", None) or getattr(sub, "embeddings", None)
                if inner is not None:
                    emb = getattr(inner, name, None)
                    if emb is not None:
                        return emb
        emb = getattr(model, "embed_tokens", None)
        if emb is not None:
            return emb
        raise AttributeError(f"cannot locate embedding table in {type(model)}")

    def get_embeddings(self) -> np.ndarray:
        import torch

        model = self._load()
        emb = self._embedding_module(model)
        with torch.no_grad():
            return emb.weight.to(torch.float32).cpu().numpy()


@EMBEDDERS.register
class BertBaseEmbedder(HFEmbedder):
    vocab_name = "bert"

    def name(self):
        return "bertbase"


@EMBEDDERS.register
class BertLargeEmbedder(HFEmbedder):
    vocab_name = "bert"

    def name(self):
        return "bertlarge"


@EMBEDDERS.register
class LlamaEmbedder(HFEmbedder):
    vocab_name = "llama"

    def name(self):
        return "llama"


@EMBEDDERS.register
class OPTEmbedder(HFEmbedder):
    vocab_name = "opt"

    def name(self):
        return "opt"


@EMBEDDERS.register
class GLMEmbedder(HFEmbedder):
    vocab_name = "glm"

    def name(self):
        return "glm"
