from legommenders_tpu.ops.core import (
    masked_softmax,
    additive_attention_pool,
    masked_mean,
    masked_max,
)
