"""LLM content-encoder operators (ONCE family).

Parity: reference model/operators/once_operator.py:41-236 + the per-LM
subclasses (bert_operator.py, opt_operator.py, llama_operator.py,
glm_operator.py):
  * full-LM mode (`tune_from` unset): the inputer supplies word embeddings
    (the LM's own word-embedding table is dropped, bert_operator.py:16) and
    the whole encoder runs at train time;
  * layer-split mode (`tune_from = k`): layers 0..k-1 run ONCE offline over
    all items (splitter.py / runtime cacher), the cached hidden states are
    device-resident `(N, L, D)` arrays gathered by item id inside jit, and
    only the top slice runs at train time;
  * LoRA on the trainable slice with the base weights frozen
    (once_operator.py:128-151) — implemented natively in lm/layers.py;
  * head: Linear(input_dim -> hidden) + AdditiveAttention
    (once_operator.py:190-193).

Layer-indexing note: the reference slices `encoder.layer[tune_from+1:]`
while caching HF `hidden_states[tune_from]` (the output of layers
0..tune_from-1), silently skipping layer `tune_from`. Here the split is
exact: offline runs layers 0..tune_from-1, runtime runs tune_from..N-1.
"""
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.common import AdditiveAttention
from legommenders_tpu.models.inputers.concat import ConcatInputer
from legommenders_tpu.models.lm.layers import (
    BertEncoderSlice, LlamaDecoderSlice, OPTDecoderSlice,
)
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.utils.registry import OPERATORS

LM_HIDDEN_KEY = "__lm_hidden__"
LM_MASK_KEY = "__lm_mask__"


class LMOperator(BaseOperator):
    """Abstract LM content encoder (reference lm_operator.py:8-23)."""

    tune_from: Optional[int] = None
    use_lora: bool = True
    lora_r: int = 32
    lora_alpha: int = 16
    lora_dropout: float = 0.1
    # HF hidden-state / attention-probs dropout, forwarded to slices that
    # model them (BERT hidden+attn, OPT hidden; HF Llama defaults to 0.0
    # and the Llama slice models none). None attn_dropout = same as
    # `dropout`. Without these fields a YAML item_config.dropout was
    # silently filtered and the slice defaults (0.1) always won.
    dropout: float = 0.1
    attn_dropout: Optional[float] = None
    additive_hidden_size: int = 256
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position: int = 512
    lm_dtype: jnp.dtype = jnp.float32
    # first-class pipeline parallelism over the trainable slice: stage the
    # layer stack across an ambient `pp` mesh (parallel.mesh.pipeline_parallel
    # context; lm/layers._pipelined_stack). 0/1 = off.
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0
    # fused Pallas attention core (ops/pallas_attention): (T, T) scores,
    # probs and dropout mask stay in VMEM per (row, head) instead of
    # materializing in HBM; requires (packed) seq len <= 128
    fused_attention: bool = False
    # q/k/v base projections as ONE concatenated GEMM per layer (exact
    # math, same param tree — lm/layers._fused_qkv_proj)
    fused_qkv: bool = False
    # fold the LoRA deltas into the base kernels at apply time: skips all
    # skinny M-sized LoRA GEMMs + their dropout masks for one D×r×D fold
    # per projection (requires lora_dropout == 0; lm/layers.LoRADense)
    lora_fold: bool = False
    # LayerNorm/RMSNorm apply in bf16 (statistics stay f32) — removes the
    # f32 elementwise materializations that cost ~10 ms/page at bench_lm
    # geometry (tools/lm_ablate.py)
    norm_bf16: bool = False
    # one random-bits draw per layer feeds both hidden-dropout sites
    # (lm/layers.SharedBitsDropout) — halves RNG traffic; BERT/OPT only
    dropout_reuse: bool = False

    inputer_class = ConcatInputer
    hf_family: str = ""  # "bert" | "llama" | "opt" — hf_loader mapping

    @property
    def use_lm_cache(self) -> bool:
        return bool(self.tune_from)

    @property
    def resolved_tune_from(self) -> int:
        if self.tune_from is None:
            return 0
        t = int(self.tune_from)
        return t if t >= 0 else self.num_hidden_layers + t

    @property
    def transformer_key(self) -> str:
        """Dotfile key for the HF checkpoint (reference once_operator.py:75)."""
        return self.__class__.__name__.replace("Operator", "").lower()

    def get_layer_nums(self) -> int:
        return self.num_hidden_layers

    def _lora_kwargs(self, trainable_slice: bool):
        if self.use_lora and trainable_slice:
            return dict(lora_r=self.lora_r, lora_alpha=self.lora_alpha,
                        lora_dropout=self.lora_dropout, freeze_base=True)
        return dict(lora_r=0, freeze_base=False)

    def make_slice(self, start: int, num_layers: int, trainable: bool,
                   name: str = "lm", **extra):
        raise NotImplementedError

    # ------------------------------------------------------------------
    def setup(self):
        start = self.resolved_tune_from
        # forward the first-class PP knobs into the slice so a YAML/CLI
        # `item_config.pipeline_stages` actually stages the trainable stack
        # (the offline lower slice stays serial: it runs paged, off-mesh)
        if self.lora_fold and self.use_lora:
            assert self.lora_dropout == 0.0, (
                "lora_fold requires lora_dropout: 0 in item_config")
        if self.dropout_reuse and self.hf_family in ("llama", "glm"):
            raise ValueError(
                "dropout_reuse applies to BERT/OPT slices only — the "
                "Llama/GLM decoder has no hidden-dropout sites to share")
        pp = dict(pipeline_stages=self.pipeline_stages,
                  pipeline_microbatches=self.pipeline_microbatches,
                  fused_attention=self.fused_attention,
                  fused_qkv=self.fused_qkv,
                  lora_fold=self.lora_fold,
                  norm_bf16=self.norm_bf16)
        if self.dropout_reuse:
            pp["dropout_reuse"] = True
        self.upper_slice = self.make_slice(
            start, self.num_hidden_layers - start, trainable=True,
            name="lm", **pp)
        if start > 0:
            # the offline lower slice benefits from the fused GEMM too
            # (cache build time); PP stays off there (runs paged, off-mesh)
            self.lower_slice = self.make_slice(
                0, start, trainable=False, name="lm_lower",
                fused_qkv=self.fused_qkv, norm_bf16=self.norm_bf16)
        self.linear = nn.Dense(self.hidden_size, dtype=self.dtype,
                               name="linear")
        self.pool = AdditiveAttention(self.additive_hidden_size,
                                      dtype=self.dtype, name="pool")

    def __call__(self, embeddings, mask=None, training: bool = False):
        """embeddings: inputer word embeddings (tune_from unset) OR cached
        hidden states (layer-split mode); both (B, L, D)."""
        x = self.upper_slice(embeddings, mask, training)
        x = x.astype(jnp.float32)
        x = self.linear(x)
        return self.pool(x, mask)

    def encode_lower(self, embeddings, mask, training: bool = False):
        """Offline path: run layers 0..tune_from-1 (splitter/cache build)."""
        assert self.resolved_tune_from > 0, "encode_lower requires tune_from"
        return self.lower_slice(embeddings, mask, training)

    def get_pretrained_parameter_names(self):
        # dual-LR signal (reference once_operator.py:153-154)
        return ["lm"]


@OPERATORS.register
class BertOperator(LMOperator):
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    hf_family: str = "bert"
    # tanh-gelu instead of HF's exact erf (~1e-3 output delta): the erf on
    # the (tokens, 4D) bf16 intermediate is VPU-transcendental-bound and
    # costs as much as the layer's GEMMs on v5e (tools/lm_ablate.py)
    gelu_approximate: bool = False
    # pack 128//L items per attention call (block-diag mask) so the tiny
    # (L, L) matmuls fill MXU lanes; exact math, only reduction order
    # differs. -1 auto (default), 0 off
    attention_pack: int = -1

    def make_slice(self, start, num_layers, trainable, name="lm", **extra):
        return BertEncoderSlice(
            num_layers=num_layers, num_heads=self.num_attention_heads,
            start=start, embed=(start == 0), max_position=self.max_position,
            gelu_approximate=self.gelu_approximate,
            attention_pack=self.attention_pack,
            dropout=self.dropout, attn_dropout=self.attn_dropout,
            dtype=self.lm_dtype, name=name,
            **self._lora_kwargs(trainable), **extra)


@OPERATORS.register
class BertBaseOperator(BertOperator):
    pass


@OPERATORS.register
class BertLargeOperator(BertOperator):
    num_hidden_layers: int = 24
    num_attention_heads: int = 16


@OPERATORS.register
class LlamaOperator(LMOperator):
    hf_family: str = "llama"
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_kv_heads: Optional[int] = None
    intermediate_size: Optional[int] = None
    rope_theta: float = 10000.0
    lm_dtype: jnp.dtype = jnp.bfloat16

    # GLM geometry knobs (defaults are plain Llama)
    qkv_bias: bool = False
    rotary_fraction: float = 1.0
    rotary_interleaved: bool = False
    attention_pack: int = -1   # pack 128//L items per attn call; 0 off

    def make_slice(self, start, num_layers, trainable, name="lm", **extra):
        return LlamaDecoderSlice(
            num_layers=num_layers, num_heads=self.num_attention_heads,
            num_kv_heads=self.num_kv_heads,
            intermediate_size=self.intermediate_size, start=start,
            final_norm=trainable, rope_theta=self.rope_theta,
            qkv_bias=self.qkv_bias, rotary_fraction=self.rotary_fraction,
            rotary_interleaved=self.rotary_interleaved,
            attention_pack=self.attention_pack,
            dtype=self.lm_dtype, name=name,
            **self._lora_kwargs(trainable), **extra)


@OPERATORS.register
class Llama1Operator(LlamaOperator):
    pass


@OPERATORS.register
class Llama2Operator(LlamaOperator):
    pass


@OPERATORS.register
class Llama3Operator(LlamaOperator):
    rope_theta: float = 500000.0


@OPERATORS.register
class OPTOperator(LMOperator):
    hf_family: str = "opt"
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    ffn_dim: Optional[int] = None
    max_position: int = 2048
    lm_dtype: jnp.dtype = jnp.bfloat16
    attention_pack: int = -1   # pack 128//L items per attn call; 0 off

    def make_slice(self, start, num_layers, trainable, name="lm", **extra):
        return OPTDecoderSlice(
            num_layers=num_layers, num_heads=self.num_attention_heads,
            ffn_dim=self.ffn_dim, start=start,
            embed_positions=(start == 0), final_norm=trainable,
            max_position=self.max_position,
            attention_pack=self.attention_pack,
            dropout=self.dropout,
            dtype=self.lm_dtype, name=name,
            **self._lora_kwargs(trainable), **extra)


@OPERATORS.register
class OPTBaseOperator(OPTOperator):
    pass


@OPERATORS.register
class OPTLargeOperator(OPTOperator):
    num_hidden_layers: int = 24
    num_attention_heads: int = 16


@OPERATORS.register
class GLMOperator(LlamaOperator):
    """ChatGLM family (reference glm_operator.py; the reference's vendored
    glm_interface.py is interface stubs only — the real modeling code comes
    from the checkpoint's trust_remote_code). Native ChatGLM2/3/GLM-4
    geometry: RMSNorm, multi-query attention (2 kv groups), qkv bias,
    partial interleaved rotary over the first half of each head dim, SwiGLU
    with fused h_to_4h (split on load, lm/hf_loader.glm_slice_params)."""

    hf_family: str = "glm"

    num_hidden_layers: int = 28
    num_attention_heads: int = 32
    num_kv_heads: Optional[int] = 2        # multi_query_group_num
    intermediate_size: Optional[int] = 13696
    qkv_bias: bool = True                  # add_qkv_bias
    rotary_fraction: float = 0.5
    rotary_interleaved: bool = True


@OPERATORS.register
class GLM4TH9BOperator(GLMOperator):
    num_hidden_layers: int = 40
