from legommenders_tpu.embedders.base import BaseEmbedder
from legommenders_tpu.embedders import glove, hf  # noqa: F401
