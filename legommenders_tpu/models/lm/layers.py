"""Native flax LM encoder/decoder slices (BERT / OPT / Llama / GLM).

These replace the reference's HF torch models (model/operators/
{bert,opt,llama,glm}_operator.py). A "slice" runs layers [start, end) over
provided hidden states — the mechanism behind the reference's `tune_from`
offline split (once_operator.py:101-134): the lower layers run once offline
(splitter), the upper slice runs at train time over cached states.

LoRA (reference: peft on the remaining layers, once_operator.py:128-151) is
native: attention q/v projections get a low-rank trainable delta while the
base kernel is stop-gradient-frozen when `lora` is enabled.

Weight layout matches HF naming closely enough for a mechanical torch->flax
port (lm/hf_loader.py).
"""
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# residual tag for the FFN second-GEMM output of every trainable layer:
# under `item_page_remat: "ffn"` (legommender._encode_paged) the paging
# remat saves exactly these tensors — at bench_lm geometry that is
# tokens x D x n_layers bf16 (~6 GB for the 65k catalog, within the v5e
# headroom the round-4 ablation established) and removes the widest GEMM
# (2*D*4D flops/token, ~1/3 of the slice recompute) from the backward
# rematerialization. All other intermediates still rematerialize.
FFN_OUT_TAG = "lm_ffn_out"


class LoRADense(nn.Module):
    """Dense whose base kernel can be frozen with a trainable low-rank
    delta: y = x @ (W + B A / ?scale) + b.

    NB: `ProjParams` below declares this exact param tree (names, shapes,
    initializers) for the fused-QKV path — any change to the params
    declared here MUST be mirrored there (test_fused_qkv_parity pins the
    value equality)."""

    features: int
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    use_bias: bool = True
    freeze_base: bool = False
    # fold the LoRA delta into the base kernel BEFORE the GEMM:
    # y = x @ (W + s·AB) — one full-width GEMM instead of base + two
    # skinny M-sized GEMMs. Requires lora_dropout == 0 (the delta's input
    # dropout cannot be expressed on a folded kernel). Gradients to A/B
    # flow through the D×r×D fold (negligible FLOPs); the backward pays
    # one extra x^T@dy GEMM for dW_eff but skips all skinny M-sized LoRA
    # GEMMs + their activations (measured win at bench_lm geometry,
    # tools/lm_ablate.py). Exact same math as unfused up to f32->bf16
    # rounding of (W + s·AB) vs (x@A)@B association.
    lora_fold: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        D = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (D, self.features))
        if self.freeze_base:
            kernel = jax.lax.stop_gradient(kernel)
        fold = self.lora_fold and self.lora_r > 0
        if fold:
            assert self.lora_dropout == 0.0, \
                "lora_fold requires lora_dropout == 0"
            a = self.param("lora_A", nn.initializers.normal(0.02),
                           (D, self.lora_r))
            b = self.param("lora_B", nn.initializers.zeros,
                           (self.lora_r, self.features))
            kernel = kernel + (a @ b) * (self.lora_alpha / self.lora_r)
        y = jnp.einsum("...d,df->...f", x.astype(self.dtype),
                       kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            if self.freeze_base:
                bias = jax.lax.stop_gradient(bias)
            y = y + bias.astype(self.dtype)
        if self.lora_r > 0 and not fold:
            a = self.param("lora_A", nn.initializers.normal(0.02),
                           (D, self.lora_r))
            b = self.param("lora_B", nn.initializers.zeros,
                           (self.lora_r, self.features))
            h = x
            if self.lora_dropout > 0:
                h = nn.Dropout(self.lora_dropout)(
                    h, deterministic=not training)
            y = y + jnp.einsum("...d,dr,rf->...f", h.astype(self.dtype),
                               a.astype(self.dtype), b.astype(self.dtype)
                               ) * (self.lora_alpha / self.lora_r)
        return y



class FrozenableLayerNorm(nn.Module):
    """LayerNorm whose params can be stop-gradient-frozen (peft freezes
    every base weight incl. norms when LoRA is active)."""

    epsilon: float = 1e-12
    freeze: bool = False
    # apply in the compute dtype: moments still accumulate in f32, but the
    # normalize/scale/shift elementwise runs in bf16 — on v5e the f32
    # elementwise materializations of 4 LNs cost ~10 ms/page at bench_lm
    # geometry (tools/lm_ablate.py). Off by default (HF-golden parity).
    bf16_apply: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (D,))
        bias = self.param("bias", nn.initializers.zeros, (D,))
        if self.freeze:
            scale = jax.lax.stop_gradient(scale)
            bias = jax.lax.stop_gradient(bias)
        mean = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
        var = jnp.var(x.astype(jnp.float32), axis=-1, keepdims=True)
        if self.bf16_apply and self.dtype != jnp.float32:
            inv = jax.lax.rsqrt(var + self.epsilon).astype(self.dtype)
            y = (x.astype(self.dtype) - mean.astype(self.dtype)) * inv
            return y * scale.astype(self.dtype) + bias.astype(self.dtype)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def _frozen_dense(features, freeze, dtype, name, use_bias=True):
    return LoRADense(features=features, freeze_base=freeze, dtype=dtype,
                     name=name, use_bias=use_bias)


class SharedBitsDropout(nn.Module):
    """One uint32 random-bits draw feeds several dropout sites: site k
    compares byte k of the SAME bits tensor against a quantized keep
    threshold (p rounds to 1/256 granularity; the keep scale uses the
    quantized probability, so E[output] stays exactly unbiased).

    Rationale (VERDICT r3 weak #3 / tools/lm_ablate.py): each nn.Dropout
    site draws its own (M, D) random tensor — at bench_lm geometry the
    draws+materializations cost more than the layer's GEMM floor allows.
    Byte-slicing one draw halves the RNG traffic per transformer layer
    (2 hidden-dropout sites). Masks at different bytes of one uint32 are
    independent Bernoulli draws (rbg/threefry bits are iid by design), so
    this is ordinary dropout — just cheaper; a documented TPU divergence
    from per-site nn.Dropout draws."""

    rate: float
    num_sites: int = 2

    @nn.compact
    def __call__(self, inputs, site: int, bits=None, training: bool = False):
        if not training or self.rate <= 0.0:
            return inputs, bits
        assert 0 <= site < min(self.num_sites, 4)
        t = max(1, min(256, round((1.0 - self.rate) * 256)))
        if bits is None:
            bits = jax.random.bits(self.make_rng("dropout"),
                                   inputs.shape, jnp.uint32)
        byte = (bits >> jnp.uint32(8 * site)) & jnp.uint32(0xFF)
        keep = byte < jnp.uint32(t)
        scale = jnp.asarray(256.0 / t, inputs.dtype)
        return jnp.where(keep, inputs * scale,
                         jnp.zeros((), inputs.dtype)), bits


class ProjParams(nn.Module):
    """Declares exactly LoRADense's param tree (kernel/bias/lora_A/lora_B,
    same names, shapes, initializers) WITHOUT computing, so a fused-QKV
    attention can read the weights and run one concatenated GEMM while
    checkpoints, the HF weight mapping (lm/hf_loader.py), and the golden
    tests stay byte-identical. Flax derives param init RNG from the param
    path, so fused and unfused modules even initialize to the same values."""

    features: int
    lora_r: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_dim: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        a = b = None
        if self.lora_r > 0:
            a = self.param("lora_A", nn.initializers.normal(0.02),
                           (in_dim, self.lora_r))
            b = self.param("lora_B", nn.initializers.zeros,
                           (self.lora_r, self.features))
        return kernel, bias, a, b


def _fused_qkv_proj(x, specs, *, freeze_base, dtype, lora_alpha,
                    lora_dropout, training, lora_fold=False):
    """Project x through q/k/v as ONE GEMM against the concatenated base
    kernels (exact math — each output column block is the same dot product
    as the per-projection GEMM), then add the LoRA low-rank deltas.

    specs: [(name, features, lora_r, use_bias)] in q, k, v order (use_bias
    must be homogeneous across specs — asserted). The three per-projection
    dispatches at news-rec token counts leave the MXU idle between calls;
    one (D, sum(features)) GEMM amortizes that (ROADMAP perf #2 "fused
    QKV"). Each LoRA'd projection draws its OWN dropout mask (named per
    spec), matching the unfused path's independent per-projection draws.
    No reference counterpart (torch/HF keep separate q/k/v Linears)."""
    assert len({ub for (_, _, _, ub) in specs}) == 1, \
        f"fused QKV requires homogeneous use_bias, got {specs}"
    D = x.shape[-1]
    parts = [ProjParams(f, r, use_bias=ub, name=n)(D)
             for (n, f, r, ub) in specs]
    if lora_fold and any(r > 0 for (_, _, r, _) in specs):
        # fold each projection's LoRA delta into its base block before the
        # concat (see LoRADense.lora_fold); base blocks stop-gradient
        # individually so the deltas stay trainable
        assert lora_dropout == 0.0, "lora_fold requires lora_dropout == 0"
        blocks = []
        for p, (_, f, r, _) in zip(parts, specs):
            kern = jax.lax.stop_gradient(p[0]) if freeze_base else p[0]
            if r > 0:
                kern = kern + (p[2] @ p[3]) * (lora_alpha / r)
            blocks.append(kern)
        kernel = jnp.concatenate(blocks, axis=1)
        lora_live = False
    else:
        kernel = jnp.concatenate([p[0] for p in parts], axis=1)
        if freeze_base:
            kernel = jax.lax.stop_gradient(kernel)
        lora_live = True
    xd = x.astype(dtype)
    y = jnp.einsum("...d,df->...f", xd, kernel.astype(dtype))
    if parts[0][1] is not None:
        bias = jnp.concatenate([p[1] for p in parts])
        if freeze_base:
            bias = jax.lax.stop_gradient(bias)
        y = y + bias.astype(dtype)
    sizes = [f for (_, f, _, _) in specs]
    outs = list(jnp.split(y, _split_points(sizes), axis=-1))
    for i, (n, _, r, _) in enumerate(specs):
        if r > 0 and lora_live:
            h = x
            if lora_dropout > 0:
                h = nn.Dropout(lora_dropout, name=f"lora_drop_{n}")(
                    h, deterministic=not training)
            a, b = parts[i][2], parts[i][3]
            outs[i] = outs[i] + jnp.einsum(
                "...d,dr,rf->...f", h.astype(dtype), a.astype(dtype),
                b.astype(dtype)) * (lora_alpha / r)
    return outs


def _split_points(sizes):
    out, acc = [], 0
    for s in sizes[:-1]:
        acc += s
        out.append(acc)
    return out


def _pipelined_stack(mdl, layer_module, x, mask_bias, training: bool,
                     mesh):
    """Run a slice's layer stack through GPipe stages over the ambient
    `pp` mesh axis (parallel/pipeline.gpipe_tree).

    First-class `pipeline_stages` knob (ROADMAP scale-out): the slice's
    per-layer param subtrees are read from the module's bound variables
    (created by the serial path at init), stacked (stages,
    layers_per_stage, ...), and each device applies its own contiguous
    layer block; microbatches stream through stages with ppermute
    hand-offs. The attention bias and a per-microbatch dropout seed ride
    along with the activations. Differentiable — grads flow back through
    the stack to the original per-layer params. No reference counterpart
    (the reference is single-device)."""
    from legommenders_tpu.parallel.pipeline import (
        PP_AXIS, gpipe_tree, stack_layer_params,
    )

    stages = int(mdl.pipeline_stages)
    assert mdl.num_layers % stages == 0, (
        f"num_layers {mdl.num_layers} % pipeline_stages {stages} != 0")
    per = mdl.num_layers // stages
    assert not getattr(mdl, "collect_pooled", False), \
        "IISAN pooled collection is not supported under pipeline_stages"
    names = [f"layer_{i}"
             for i in range(mdl.start, mdl.start + mdl.num_layers)]
    params = mdl.variables["params"]
    stacked = stack_layer_params(params, names, per)

    B = x.shape[0]
    needs_rng = training and (mdl.dropout > 0 or mdl.lora_dropout > 0) \
        if hasattr(mdl, "dropout") else training and mdl.lora_dropout > 0
    if needs_rng:
        seeds = jax.random.bits(mdl.make_rng("dropout"), (B,), jnp.uint32)
    else:
        seeds = jnp.zeros((B,), jnp.uint32)

    M = int(getattr(mdl, "pipeline_microbatches", 0) or 2 * stages)
    # pad the row dim so arbitrary encode sizes (flattened occurrences,
    # catalog pages) split into M microbatches with the microbatch rows
    # dp-shardable; padded rows compute garbage that is sliced off
    n_dp = mesh.shape.get("dp", 1)
    pad = (-B) % (M * n_dp)
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        mask_bias = jnp.concatenate(
            [mask_bias,
             jnp.zeros((pad,) + mask_bias.shape[1:], mask_bias.dtype)],
            axis=0)
        seeds = jnp.concatenate([seeds, jnp.zeros((pad,), seeds.dtype)])

    def stage_fn(stage_params, tree):
        h, bias, seed = tree
        s_idx = jax.lax.axis_index(PP_AXIS)
        for j in range(per):
            pj = jax.tree_util.tree_map(lambda a: a[j], stage_params)
            key = jax.random.fold_in(
                jax.random.key(seed[0], impl="threefry2x32"),
                s_idx * per + j)
            h = layer_module.apply({"params": pj}, h, bias, training,
                                   rngs={"dropout": key})
        return (h, bias, seed)

    out = gpipe_tree(stage_fn, stacked, (x, mask_bias, seeds), mesh, M)
    return out[0][:B]


def _fused_attention(mdl, q, k, v, mask_bias, num_heads, attn_p,
                     training: bool):
    """Dispatch the attention core to the fused Pallas kernel
    (ops/pallas_attention.packed_attention): scores/probs/dropout stay in
    VMEM instead of materializing (B, H, T, T) tensors in HBM.

    q, k, v: (B, T, D) pre-head-split (the kernel slices heads from D —
    same contiguous layout as reshape(B, T, H, d)); mask_bias broadcasts
    from the slice's (B, 1, T|1, T) additive form. Scaling (1/sqrt(d)) and
    f32 softmax happen in-kernel."""
    from legommenders_tpu.ops.pallas_attention import packed_attention
    B, T, _ = q.shape
    bias3 = jnp.broadcast_to(mask_bias[:, 0], (B, T, T))
    p = float(attn_p) if training else 0.0
    if p > 0.0:
        seed = jax.random.bits(mdl.make_rng("dropout"), (1,),
                               jnp.uint32).astype(jnp.int32)
    else:
        seed = jnp.zeros((1,), jnp.int32)
    return packed_attention(num_heads, p, q, k, v, bias3, seed)


def pack_group_size(L: int, requested: int) -> int:
    """Resolve the attention-pack group size: `requested` < 0 = auto
    (as many L-token items as fit a 128-lane MXU tile), 0/1 = off."""
    if requested < 0:
        return max(1, 128 // max(L, 1))
    return max(1, requested)


def pack_items(x, mask, group: int):
    """(B, L, D) -> (ceil(B/G), G*L, D): G items share one attention call.

    News-rec item encodes run attention at tiny L (~31 tokens): the
    (L, L) score/AV matmuls pad L to 128 MXU lanes, wasting ~4x of the
    attention-core FLOPs (tools/lm_ablate.py measured the core at ~0.7%
    MXU efficiency). Packing G = 128//L items into one sequence with a
    block-diagonal mask makes the matmul dims ~G*L ~ 124. No reference
    counterpart (torch SDPA on GPU has no such tile constraint)."""
    B, L = mask.shape
    pad = (-B) % group
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        # pad rows get one valid token: an all-masked row is an all -inf
        # softmax row -> NaN, and 0-cotangent x NaN-jacobian would poison
        # the weight grads even though the rows are sliced away
        pad_mask = jnp.zeros((pad, L), mask.dtype).at[:, 0].set(1)
        mask = jnp.concatenate([mask, pad_mask], axis=0)
    Bp = x.shape[0] // group
    return (x.reshape(Bp, group * L, x.shape[-1]),
            mask.reshape(Bp, group * L), pad)


def packed_mask_bias(mask_p, L: int, dtype, causal: bool = False):
    """Block-diagonal attention bias for packed sequences: token i may
    attend j only within the same L-token block, j valid (and j <= i when
    causal). mask_p: (Bp, G*L)."""
    GL = mask_p.shape[1]
    blk = jnp.arange(GL) // L
    same = blk[:, None] == blk[None, :]
    if causal:
        same = same & (jnp.arange(GL)[:, None] >= jnp.arange(GL)[None, :])
    allowed = same[None, None] & mask_p.astype(bool)[:, None, None, :]
    return jnp.where(allowed, 0.0, jnp.finfo(dtype).min).astype(dtype)


# ---------------------------------------------------------------------------
# BERT
# ---------------------------------------------------------------------------
class BertSelfAttention(nn.Module):
    num_heads: int
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    dropout: float = 0.1
    fused: bool = False  # Pallas packed_attention core (T <= 128)
    fused_qkv: bool = False  # one concatenated (D, 3D) base GEMM
    lora_fold: bool = False  # fold LoRA deltas into base kernels
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, training: bool = False):
        D = x.shape[-1]
        H, d = self.num_heads, D // self.num_heads
        # HF LoRA default targets: query & value
        if self.fused_qkv:
            q, k, v = _fused_qkv_proj(
                x,
                [("query", D, self.lora_r, True),
                 ("key", D, 0, True),
                 ("value", D, self.lora_r, True)],
                freeze_base=self.freeze_base, dtype=self.dtype,
                lora_alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
                training=training, lora_fold=self.lora_fold)
        else:
            q = LoRADense(D, self.lora_r, self.lora_alpha, self.lora_dropout,
                          freeze_base=self.freeze_base, dtype=self.dtype,
                          lora_fold=self.lora_fold,
                          name="query")(x, training)
            k = _frozen_dense(D, self.freeze_base, self.dtype,
                              "key")(x, training)
            v = LoRADense(D, self.lora_r, self.lora_alpha, self.lora_dropout,
                          freeze_base=self.freeze_base, dtype=self.dtype,
                          lora_fold=self.lora_fold,
                          name="value")(x, training)
        B, L = x.shape[0], x.shape[1]
        if self.fused and L <= 128 and not self.is_initializing():
            out = _fused_attention(self, q, k, v, mask_bias, H,
                                   self.dropout, training)
        else:
            q = q.reshape(B, L, H, d)
            k = k.reshape(B, L, H, d)
            v = v.reshape(B, L, H, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.array(d, self.dtype))
            scores = scores + mask_bias
            attn = nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout)(attn, deterministic=not training)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, D)
        return _frozen_dense(D, self.freeze_base, self.dtype,
                             "output")(out, training)


class BertLayer(nn.Module):
    num_heads: int
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    dropout: float = 0.1
    # HF attention_probs_dropout_prob; None = same as `dropout`
    attn_dropout: Optional[float] = None
    intermediate_mult: int = 4
    # HF BERT uses exact-erf gelu; the erf transcendental on the (tokens,
    # 4D) bf16 intermediate is VPU-bound and costs as much as all the
    # layer's GEMMs on v5e (tools/lm_ablate.py). approximate=True switches
    # to the tanh form (~1e-3 max output delta) for speed.
    gelu_approximate: bool = False
    fused_attention: bool = False
    fused_qkv: bool = False
    lora_fold: bool = False
    norm_bf16: bool = False  # LayerNorms apply in bf16 (stats stay f32)
    dropout_reuse: bool = False  # one bits draw feeds both hidden sites
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, training: bool = False):
        D = x.shape[-1]
        attn_p = self.dropout if self.attn_dropout is None \
            else self.attn_dropout
        shared = (SharedBitsDropout(self.dropout, name="shared_drop")
                  if self.dropout_reuse else None)
        bits = None
        attn = BertSelfAttention(
            self.num_heads, self.lora_r, self.lora_alpha, self.lora_dropout,
            self.freeze_base, attn_p, fused=self.fused_attention,
            fused_qkv=self.fused_qkv, lora_fold=self.lora_fold,
            dtype=self.dtype,
            name="attention")(x, mask_bias, training)
        if shared is not None:
            attn, bits = shared(attn, 0, bits, training)
        else:
            attn = nn.Dropout(self.dropout)(attn,
                                            deterministic=not training)
        x = FrozenableLayerNorm(epsilon=1e-12, freeze=self.freeze_base,
                                bf16_apply=self.norm_bf16, dtype=self.dtype,
                                name="attention_norm")(x + attn)
        inter = _frozen_dense(D * self.intermediate_mult, self.freeze_base,
                              self.dtype, "intermediate")(x, training)
        inter = nn.gelu(inter, approximate=self.gelu_approximate)
        out = checkpoint_name(
            _frozen_dense(D, self.freeze_base, self.dtype,
                          "ffn_output")(inter, training), FFN_OUT_TAG)
        if shared is not None:
            out, bits = shared(out, 1, bits, training)
        else:
            out = nn.Dropout(self.dropout)(out, deterministic=not training)
        return FrozenableLayerNorm(epsilon=1e-12, freeze=self.freeze_base,
                                   bf16_apply=self.norm_bf16,
                                   dtype=self.dtype,
                                   name="output_norm")(x + out)


class BertEncoderSlice(nn.Module):
    """Layers [start, end) of a BERT encoder over hidden states.

    With start == 0, `embed=True` also applies the HF embedding stage
    (position + token-type embeddings + LayerNorm + dropout) on top of the
    inputer-provided word embeddings — the reference drops ONLY the word
    embedding table (bert_operator.py:16)."""

    num_layers: int
    collect_pooled: bool = False  # IISAN: per-layer masked-mean states
    num_heads: int = 12
    start: int = 0
    embed: bool = True
    max_position: int = 512
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    dropout: float = 0.1
    attn_dropout: Optional[float] = None  # None = same as `dropout`
    gelu_approximate: bool = False
    # pack G = 128//L items into one block-diag attention call so the
    # (L, L) score/AV matmuls fill MXU lanes (-1 auto, 0/1 off)
    attention_pack: int = 0
    # fused Pallas attention core (scores/probs/dropout stay in VMEM)
    fused_attention: bool = False
    # q/k/v base projections as one concatenated GEMM (exact math)
    fused_qkv: bool = False
    # fold LoRA deltas into base kernels (needs lora_dropout == 0)
    lora_fold: bool = False
    # LayerNorms apply in bf16 (stats stay f32)
    norm_bf16: bool = False
    # one random-bits draw feeds both hidden-dropout sites per layer
    dropout_reuse: bool = False
    pipeline_stages: int = 0      # >1: stage layers over the ambient pp mesh
    pipeline_microbatches: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, mask, training: bool = False):
        B, L, D = hidden_states.shape
        mask_bias = ((1.0 - mask.astype(self.dtype))
                     * jnp.finfo(self.dtype).min)[:, None, None, :]
        x = hidden_states.astype(self.dtype)
        if self.embed and self.start == 0:
            pos = self.param("position_embeddings",
                             nn.initializers.normal(0.02),
                             (self.max_position, D))
            tok_type = self.param("token_type_embeddings",
                                  nn.initializers.normal(0.02), (1, D))
            extra = pos[None, :L, :] + tok_type[None, :, :]
            if self.freeze_base:
                extra = jax.lax.stop_gradient(extra)
            x = x + extra
            x = FrozenableLayerNorm(epsilon=1e-12, freeze=self.freeze_base,
                                    bf16_apply=self.norm_bf16,
                                    dtype=self.dtype,
                                    name="embeddings_norm")(x)
            x = nn.Dropout(self.dropout)(x, deterministic=not training)
        from legommenders_tpu.parallel.mesh import get_pp_mesh
        pp_mesh = get_pp_mesh()
        if (self.pipeline_stages > 1 and pp_mesh is not None
                and not self.is_initializing()):
            layer_mod = BertLayer(self.num_heads, self.lora_r,
                                  self.lora_alpha, self.lora_dropout,
                                  self.freeze_base, self.dropout,
                                  attn_dropout=self.attn_dropout,
                                  gelu_approximate=self.gelu_approximate,
                                  fused_attention=self.fused_attention,
                                  fused_qkv=self.fused_qkv,
                                  lora_fold=self.lora_fold,
                                  norm_bf16=self.norm_bf16,
                                  dropout_reuse=self.dropout_reuse,
                                  dtype=self.dtype)
            return _pipelined_stack(self, layer_mod, x, mask_bias,
                                    training, pp_mesh)
        G = pack_group_size(L, self.attention_pack) \
            if self.attention_pack else 1
        if G > 1:
            x, mask_p, _pad = pack_items(x, mask, G)
            mask_bias = packed_mask_bias(mask_p, L, self.dtype)
        pooled = []
        m = mask.astype(self.dtype)[:, :, None]
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        for i in range(self.start, self.start + self.num_layers):
            x = BertLayer(self.num_heads, self.lora_r, self.lora_alpha,
                          self.lora_dropout, self.freeze_base, self.dropout,
                          attn_dropout=self.attn_dropout,
                          gelu_approximate=self.gelu_approximate,
                          fused_attention=self.fused_attention,
                          fused_qkv=self.fused_qkv,
                          lora_fold=self.lora_fold,
                          norm_bf16=self.norm_bf16,
                          dropout_reuse=self.dropout_reuse,
                          dtype=self.dtype, name=f"layer_{i}")(
                x, mask_bias, training)
            if self.collect_pooled:
                xi = x.reshape(-1, L, D)[:B] if G > 1 else x
                pooled.append((xi * m).sum(axis=1) / denom)
        if G > 1:
            x = x.reshape(-1, L, D)[:B]
        if self.collect_pooled:
            return jnp.stack(pooled, axis=1)  # (B, num_layers, D)
        return x


# ---------------------------------------------------------------------------
# Llama (RMSNorm + rotary + SwiGLU, causal)
# ---------------------------------------------------------------------------
class RMSNorm(nn.Module):
    eps: float = 1e-6
    freeze: bool = False
    bf16_apply: bool = False  # see FrozenableLayerNorm.bf16_apply
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        if self.freeze:
            scale = jax.lax.stop_gradient(scale)
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        if self.bf16_apply and self.dtype != jnp.float32:
            inv = jax.lax.rsqrt(var + self.eps).astype(self.dtype)
            return x.astype(self.dtype) * inv * scale.astype(self.dtype)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(self.dtype) * scale


def rotary_embedding(L, d, base=10000.0, dtype=jnp.float32):
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    t = jnp.arange(L, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                   # (L, d/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)   # (L, d)
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def apply_rotary(x, cos, sin):
    """x (B, L, H, d)."""
    d = x.shape[-1]
    x1, x2 = x[..., : d // 2], x[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos[None, :, None, :] + rotated * sin[None, :, None, :]


def rotary_interleaved_embedding(L, rot_dim, base=10000.0,
                                 dtype=jnp.float32):
    """ChatGLM-style rope cache for a PARTIAL rotary of `rot_dim` dims:
    (L, rot_dim/2) cos/sin over interleaved (even, odd) pairs."""
    inv_freq = 1.0 / (base ** (jnp.arange(0, rot_dim, 2,
                                          dtype=jnp.float32) / rot_dim))
    t = jnp.arange(L, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)                   # (L, rot_dim/2)
    return jnp.cos(freqs).astype(dtype), jnp.sin(freqs).astype(dtype)


def apply_rotary_partial_interleaved(x, cos, sin):
    """ChatGLM rotary: rotate only the first `rot_dim` head dims, pairing
    (even, odd) neighbours; the tail passes through unchanged.
    x (B, L, H, d); cos/sin (L, rot_dim/2)."""
    rot = cos.shape[-1] * 2
    xr, x_pass = x[..., :rot], x[..., rot:]
    x0 = xr[..., 0::2]
    x1 = xr[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out0 = x0 * c - x1 * s
    out1 = x1 * c + x0 * s
    rotated = jnp.stack([out0, out1], axis=-1).reshape(xr.shape)
    return jnp.concatenate([rotated, x_pass], axis=-1)


class LlamaDecoderLayer(nn.Module):
    num_heads: int
    num_kv_heads: Optional[int] = None
    intermediate_size: Optional[int] = None
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    rope_theta: float = 10000.0
    # ChatGLM geometry knobs (reference glm_operator.py loads the HF
    # checkpoint's remote modeling code; these reproduce it natively):
    # qkv projections with bias, rotary over only the first
    # `rotary_fraction`·d dims in interleaved (even, odd) pairs
    qkv_bias: bool = False
    rotary_fraction: float = 1.0
    rotary_interleaved: bool = False
    # >0: positions restart every `rotary_period` tokens (attention
    # packing — each packed item keeps its original absolute positions)
    rotary_period: int = 0
    fused_attention: bool = False
    fused_qkv: bool = False
    lora_fold: bool = False
    norm_bf16: bool = False  # RMSNorms apply in bf16 (stats stay f32)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, training: bool = False):
        B, L, D = x.shape
        H = self.num_heads
        KV = self.num_kv_heads or H
        d = D // H
        inter = self.intermediate_size or int(D * 8 / 3)
        L_tab = self.rotary_period or L

        h = RMSNorm(freeze=self.freeze_base, bf16_apply=self.norm_bf16,
                    dtype=self.dtype, name="input_norm")(x)
        if self.fused_qkv:
            q, k, v = _fused_qkv_proj(
                h,
                [("q_proj", D, self.lora_r, self.qkv_bias),
                 ("k_proj", KV * d, 0, self.qkv_bias),
                 ("v_proj", KV * d, self.lora_r, self.qkv_bias)],
                freeze_base=self.freeze_base, dtype=self.dtype,
                lora_alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
                training=training, lora_fold=self.lora_fold)
        else:
            q = LoRADense(D, self.lora_r, self.lora_alpha, self.lora_dropout,
                          use_bias=self.qkv_bias, freeze_base=self.freeze_base,
                          lora_fold=self.lora_fold,
                          dtype=self.dtype, name="q_proj")(h, training)
            k = LoRADense(KV * d, 0, use_bias=self.qkv_bias,
                          freeze_base=self.freeze_base, dtype=self.dtype,
                          name="k_proj")(h, training)
            v = LoRADense(KV * d, self.lora_r, self.lora_alpha,
                          self.lora_dropout, use_bias=self.qkv_bias,
                          freeze_base=self.freeze_base,
                          lora_fold=self.lora_fold, dtype=self.dtype,
                          name="v_proj")(h, training)
        q = q.reshape(B, L, H, d)
        k = k.reshape(B, L, KV, d)
        v = v.reshape(B, L, KV, d)
        if self.rotary_interleaved or self.rotary_fraction < 1.0:
            rot = int(d * self.rotary_fraction) // 2 * 2
            cos, sin = rotary_interleaved_embedding(
                L_tab, rot, self.rope_theta, self.dtype)
            if L_tab != L:
                cos = jnp.tile(cos, (L // L_tab, 1))
                sin = jnp.tile(sin, (L // L_tab, 1))
            q = apply_rotary_partial_interleaved(q, cos, sin)
            k = apply_rotary_partial_interleaved(k, cos, sin)
        else:
            cos, sin = rotary_embedding(L_tab, d, self.rope_theta,
                                        self.dtype)
            if L_tab != L:
                cos = jnp.tile(cos, (L // L_tab, 1))
                sin = jnp.tile(sin, (L // L_tab, 1))
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
        if KV != H:  # grouped-query attention
            rep = H // KV
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        if self.fused_attention and L <= 128 and not self.is_initializing():
            # kernel scales by 1/sqrt(D//H) = 1/sqrt(d) in-kernel
            out = _fused_attention(
                self, q.reshape(B, L, D), k.reshape(B, L, D),
                v.reshape(B, L, D), mask_bias, H, 0.0, training)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.array(d, self.dtype))
            scores = scores + mask_bias
            attn = nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, D)
        out = LoRADense(D, 0, use_bias=False, freeze_base=self.freeze_base,
                        dtype=self.dtype, name="o_proj")(out, training)
        x = x + out

        h = RMSNorm(freeze=self.freeze_base, bf16_apply=self.norm_bf16,
                    dtype=self.dtype, name="post_norm")(x)
        gate = LoRADense(inter, 0, use_bias=False,
                         freeze_base=self.freeze_base, dtype=self.dtype,
                         name="gate_proj")(h, training)
        up = LoRADense(inter, 0, use_bias=False,
                       freeze_base=self.freeze_base, dtype=self.dtype,
                       name="up_proj")(h, training)
        down = checkpoint_name(
            LoRADense(D, 0, use_bias=False,
                      freeze_base=self.freeze_base, dtype=self.dtype,
                      name="down_proj")(nn.silu(gate) * up, training),
            FFN_OUT_TAG)
        return x + down


class LlamaDecoderSlice(nn.Module):
    num_layers: int
    collect_pooled: bool = False  # IISAN: per-layer masked-mean states
    num_heads: int = 32
    num_kv_heads: Optional[int] = None
    intermediate_size: Optional[int] = None
    start: int = 0
    final_norm: bool = True
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    rope_theta: float = 10000.0
    qkv_bias: bool = False
    rotary_fraction: float = 1.0
    rotary_interleaved: bool = False
    attention_pack: int = 0    # -1 auto: pack 128//L items per attn call
    lora_fold: bool = False
    norm_bf16: bool = False
    fused_attention: bool = False
    fused_qkv: bool = False
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden_states, mask, training: bool = False):
        B, L, D = hidden_states.shape
        neg = jnp.finfo(self.dtype).min
        causal = jnp.tril(jnp.ones((L, L), bool))
        pad = mask.astype(bool)[:, None, None, :]
        allowed = causal[None, None, :, :] & pad
        mask_bias = jnp.where(allowed, 0.0, neg).astype(self.dtype)
        x = hidden_states.astype(self.dtype)
        from legommenders_tpu.parallel.mesh import get_pp_mesh
        pp_mesh = get_pp_mesh()
        if (self.pipeline_stages > 1 and pp_mesh is not None
                and not self.is_initializing()):
            layer_mod = LlamaDecoderLayer(
                self.num_heads, self.num_kv_heads, self.intermediate_size,
                self.lora_r, self.lora_alpha, self.lora_dropout,
                self.freeze_base, self.rope_theta, qkv_bias=self.qkv_bias,
                rotary_fraction=self.rotary_fraction,
                rotary_interleaved=self.rotary_interleaved,
                fused_attention=self.fused_attention,
                fused_qkv=self.fused_qkv,
                lora_fold=self.lora_fold, norm_bf16=self.norm_bf16,
                dtype=self.dtype)
            x = _pipelined_stack(self, layer_mod, x, mask_bias,
                                 training, pp_mesh)
            if self.final_norm:
                x = RMSNorm(freeze=self.freeze_base,
                            bf16_apply=self.norm_bf16, dtype=self.dtype,
                            name="final_norm")(x)
            return x
        G = pack_group_size(L, self.attention_pack) \
            if self.attention_pack else 1
        if G > 1:
            x, mask_p, _pad = pack_items(x, mask, G)
            mask_bias = packed_mask_bias(mask_p, L, self.dtype, causal=True)
        pooled = []
        m = mask.astype(self.dtype)[:, :, None]
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        for i in range(self.start, self.start + self.num_layers):
            x = LlamaDecoderLayer(
                self.num_heads, self.num_kv_heads, self.intermediate_size,
                self.lora_r, self.lora_alpha, self.lora_dropout,
                self.freeze_base, self.rope_theta,
                qkv_bias=self.qkv_bias,
                rotary_fraction=self.rotary_fraction,
                rotary_interleaved=self.rotary_interleaved,
                rotary_period=L if G > 1 else 0,
                fused_attention=self.fused_attention,
                fused_qkv=self.fused_qkv,
                lora_fold=self.lora_fold, norm_bf16=self.norm_bf16,
                dtype=self.dtype,
                name=f"layer_{i}")(x, mask_bias, training)
            if self.collect_pooled:
                xi = x.reshape(-1, L, D)[:B] if G > 1 else x
                pooled.append((xi * m).sum(axis=1) / denom)
        if G > 1:
            x = x.reshape(-1, L, D)[:B]
        if self.collect_pooled:
            return jnp.stack(pooled, axis=1)
        if self.final_norm:
            x = RMSNorm(freeze=self.freeze_base, bf16_apply=self.norm_bf16,
                        dtype=self.dtype, name="final_norm")(x)
        return x


# ---------------------------------------------------------------------------
# OPT (learned positions offset-2, pre-LN, causal)
# ---------------------------------------------------------------------------
class OPTDecoderLayer(nn.Module):
    num_heads: int
    ffn_dim: Optional[int] = None
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    # HF OPTConfig.dropout (default 0.1 there): applied to the attention
    # output and the fc2 output (modeling_opt residual sites)
    dropout: float = 0.0
    fused_attention: bool = False
    fused_qkv: bool = False
    lora_fold: bool = False
    norm_bf16: bool = False
    dropout_reuse: bool = False  # one bits draw feeds both residual sites
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias, training: bool = False):
        B, L, D = x.shape
        H, d = self.num_heads, D // self.num_heads
        ffn = self.ffn_dim or 4 * D
        shared = (SharedBitsDropout(self.dropout, name="shared_drop")
                  if self.dropout_reuse else None)
        bits = None
        h = FrozenableLayerNorm(epsilon=1e-5, freeze=self.freeze_base,
                                bf16_apply=self.norm_bf16,
                                dtype=self.dtype, name="attn_norm")(x)
        if self.fused_qkv:
            q, k, v = _fused_qkv_proj(
                h,
                [("q_proj", D, self.lora_r, True),
                 ("k_proj", D, 0, True),
                 ("v_proj", D, self.lora_r, True)],
                freeze_base=self.freeze_base, dtype=self.dtype,
                lora_alpha=self.lora_alpha, lora_dropout=self.lora_dropout,
                training=training, lora_fold=self.lora_fold)
        else:
            q = LoRADense(D, self.lora_r, self.lora_alpha, self.lora_dropout,
                          freeze_base=self.freeze_base, dtype=self.dtype,
                          lora_fold=self.lora_fold,
                          name="q_proj")(h, training)
            k = _frozen_dense(D, self.freeze_base, self.dtype,
                              "k_proj")(h, training)
            v = LoRADense(D, self.lora_r, self.lora_alpha, self.lora_dropout,
                          freeze_base=self.freeze_base, dtype=self.dtype,
                          lora_fold=self.lora_fold,
                          name="v_proj")(h, training)
        if self.fused_attention and L <= 128 and not self.is_initializing():
            # pass q unscaled: the kernel applies 1/sqrt(d) itself
            out = _fused_attention(self, q, k, v, mask_bias, H, 0.0,
                                   training)
        else:
            q = q.reshape(B, L, H, d) * (d ** -0.5)
            k = k.reshape(B, L, H, d)
            v = v.reshape(B, L, H, d)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) + mask_bias
            attn = nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(B, L, D)
        out = _frozen_dense(D, self.freeze_base, self.dtype,
                            "out_proj")(out, training)
        if shared is not None:
            out, bits = shared(out, 0, bits, training)
        else:
            out = nn.Dropout(self.dropout)(out, deterministic=not training)
        x = x + out
        h = FrozenableLayerNorm(epsilon=1e-5, freeze=self.freeze_base,
                                bf16_apply=self.norm_bf16,
                                dtype=self.dtype, name="ffn_norm")(x)
        h = nn.relu(_frozen_dense(ffn, self.freeze_base, self.dtype,
                                  "fc1")(h, training))
        h = checkpoint_name(
            _frozen_dense(D, self.freeze_base, self.dtype,
                          "fc2")(h, training), FFN_OUT_TAG)
        if shared is not None:
            h, bits = shared(h, 1, bits, training)
        else:
            h = nn.Dropout(self.dropout)(h, deterministic=not training)
        return x + h


class OPTDecoderSlice(nn.Module):
    num_layers: int
    collect_pooled: bool = False  # IISAN: per-layer masked-mean states
    num_heads: int = 12
    ffn_dim: Optional[int] = None
    start: int = 0
    embed_positions: bool = True
    final_norm: bool = True
    max_position: int = 2048
    lora_r: int = 0
    lora_alpha: int = 16
    lora_dropout: float = 0.0
    freeze_base: bool = False
    dropout: float = 0.0       # HF OPTConfig.dropout — see OPTDecoderLayer
    attention_pack: int = 0    # -1 auto: pack 128//L items per attn call
    fused_attention: bool = False
    fused_qkv: bool = False
    lora_fold: bool = False
    norm_bf16: bool = False
    dropout_reuse: bool = False
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, hidden_states, mask, training: bool = False):
        B, L, D = hidden_states.shape
        neg = jnp.finfo(self.dtype).min
        causal = jnp.tril(jnp.ones((L, L), bool))
        pad = mask.astype(bool)[:, None, None, :]
        mask_bias = jnp.where(causal[None, None] & pad, 0.0, neg
                              ).astype(self.dtype)
        x = hidden_states.astype(self.dtype)
        if self.embed_positions and self.start == 0:
            # OPT learned positions have a +2 offset and follow cumulative
            # positions of non-pad tokens
            pos_table = self.param("position_embeddings",
                                   nn.initializers.normal(0.02),
                                   (self.max_position + 2, D))
            if self.freeze_base:
                pos_table = jax.lax.stop_gradient(pos_table)
            positions = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
            positions = jnp.clip(positions, 0) + 2
            x = x + jnp.take(pos_table, positions, axis=0).astype(self.dtype)
        from legommenders_tpu.parallel.mesh import get_pp_mesh
        pp_mesh = get_pp_mesh()
        if (self.pipeline_stages > 1 and pp_mesh is not None
                and not self.is_initializing()):
            layer_mod = OPTDecoderLayer(self.num_heads, self.ffn_dim,
                                        self.lora_r, self.lora_alpha,
                                        self.lora_dropout, self.freeze_base,
                                        dropout=self.dropout,
                                        fused_attention=self.fused_attention,
                                        fused_qkv=self.fused_qkv,
                                        lora_fold=self.lora_fold,
                                        norm_bf16=self.norm_bf16,
                                        dropout_reuse=self.dropout_reuse,
                                        dtype=self.dtype)
            x = _pipelined_stack(self, layer_mod, x, mask_bias,
                                 training, pp_mesh)
            if self.final_norm:
                x = FrozenableLayerNorm(
                    epsilon=1e-5, freeze=self.freeze_base,
                    bf16_apply=self.norm_bf16, dtype=self.dtype,
                    name="final_norm")(x)
            return x
        G = pack_group_size(L, self.attention_pack) \
            if self.attention_pack else 1
        if G > 1:
            x, mask_p, _pad = pack_items(x, mask, G)
            mask_bias = packed_mask_bias(mask_p, L, self.dtype, causal=True)
        pooled = []
        m = mask.astype(self.dtype)[:, :, None]
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        for i in range(self.start, self.start + self.num_layers):
            x = OPTDecoderLayer(self.num_heads, self.ffn_dim, self.lora_r,
                                self.lora_alpha, self.lora_dropout,
                                self.freeze_base,
                                dropout=self.dropout,
                                fused_attention=self.fused_attention,
                                fused_qkv=self.fused_qkv,
                                lora_fold=self.lora_fold,
                                norm_bf16=self.norm_bf16,
                                dropout_reuse=self.dropout_reuse,
                                dtype=self.dtype,
                                name=f"layer_{i}")(x, mask_bias, training)
            if self.collect_pooled:
                xi = x.reshape(-1, L, D)[:B] if G > 1 else x
                pooled.append((xi * m).sum(axis=1) / denom)
        if G > 1:
            x = x.reshape(-1, L, D)[:B]
        if self.collect_pooled:
            return jnp.stack(pooled, axis=1)
        if self.final_norm:
            x = FrozenableLayerNorm(epsilon=1e-5, freeze=self.freeze_base, dtype=self.dtype, name="final_norm")(x)
        return x
