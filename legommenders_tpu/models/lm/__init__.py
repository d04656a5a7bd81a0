from legommenders_tpu.models.lm.layers import (
    BertEncoderSlice, LlamaDecoderSlice, OPTDecoderSlice,
)
