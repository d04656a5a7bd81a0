"""Shared nn blocks (flax.linen).

Parity: reference model/common/ — AdditiveAttention (attention.py:10-38),
ScaledDotProduct/MultiHeadSelfAttention (attention.py:41-114, FuxiCTR),
MLPLayer (mlp_layer.py:6-45), activation factory + Dice (activation.py).
"""
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from legommenders_tpu.ops.core import additive_attention_pool, masked_softmax


class AdditiveAttention(nn.Module):
    """exp-softmax additive pooling (..., L, D) -> (..., D).

    Runs through the fused Pallas kernel on TPU
    (ops/pallas_additive.py); jnp path elsewhere."""

    hidden_size: int = 256
    # opt-in sequence parallelism: under an active SP mesh
    # (parallel.mesh.sequence_parallel), pool via the two-psum decomposition
    # in ops/sp_additive.py — the sequence axis stays sharded end-to-end
    sequence_parallel: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        from legommenders_tpu.ops.pallas_additive import additive_attention_fused

        D, H = inputs.shape[-1], self.hidden_size
        w1 = self.param("proj_kernel", nn.initializers.lecun_normal(), (D, H))
        b1 = self.param("proj_bias", nn.initializers.zeros, (H,))
        w2 = self.param("query", nn.initializers.lecun_normal(), (H, 1))

        lead = inputs.shape[:-2]
        L = inputs.shape[-2]
        x = inputs.reshape((-1, L, D))
        if mask is None:
            m = jnp.ones(x.shape[:2], dtype=jnp.float32)
        else:
            m = mask.reshape((-1, L)).astype(jnp.float32)

        if self.sequence_parallel:
            from legommenders_tpu.parallel.mesh import get_sp_mesh
            sp_mesh = get_sp_mesh()
            if sp_mesh is not None:
                from legommenders_tpu.ops.sp_additive import (
                    sp_additive_attention,
                )
                xx = x.astype(self.dtype)
                scores = jnp.einsum(
                    "bld,dh->blh", xx, w1.astype(self.dtype))
                scores = jnp.tanh(scores + b1.astype(self.dtype))
                scores = jnp.einsum(
                    "blh,h->bl", scores, w2[:, 0].astype(self.dtype))
                out = sp_additive_attention(xx, scores, m, sp_mesh)
                return out.reshape(*lead, D)

        out = additive_attention_fused(
            x.astype(self.dtype), m,
            w1.astype(self.dtype), b1.astype(self.dtype),
            w2[:, 0].astype(self.dtype))
        return out.reshape(*lead, D)


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with key-padding mask -> (B, L, D) outputs.

    Used by the NRMS-style AttentionOperator (reference
    attention_operator.py:24-59, torch nn.MultiheadAttention) and — with the
    FuxiCTR residual/relu variant flags — by AutoInt
    (attention.py:64-114)."""

    num_heads: int = 8
    attention_dim: Optional[int] = None  # defaults to input dim
    dropout: float = 0.0
    use_residual: bool = False
    use_scale: bool = True
    layer_norm: bool = False
    relu_out: bool = False
    out_proj: bool = True  # torch MultiheadAttention has an output projection
    # opt-in sequence parallelism: under an active SP mesh, attention runs
    # sharded over the sequence. sp_impl picks the algorithm — "ulysses"
    # (ops/sp_attention.py, 2 all-to-alls, needs H % sp == 0) or "ring"
    # (ops/ring_attention.py, rotating K/V + online softmax, no head
    # constraint). The q/k/v/out params are IDENTICAL to the local path.
    sequence_parallel: bool = False
    sp_impl: str = "ulysses"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 training: bool = False):
        D_in = x.shape[-1]
        D = self.attention_dim or D_in
        H = self.num_heads
        assert D % H == 0, f"attention_dim {D} % heads {H} != 0"
        d = D // H

        q = nn.Dense(D, use_bias=self.out_proj, dtype=self.dtype, name="q")(x)
        k = nn.Dense(D, use_bias=self.out_proj, dtype=self.dtype, name="k")(x)
        v = nn.Dense(D, use_bias=self.out_proj, dtype=self.dtype, name="v")(x)

        if self.sequence_parallel and x.ndim == 3:
            from legommenders_tpu.parallel.mesh import get_sp_mesh
            sp_mesh = get_sp_mesh()
            if sp_mesh is not None:
                assert self.use_scale and self.dropout == 0.0, \
                    "sp path: scaled attention, no attention dropout"
                m = mask if mask is not None else \
                    jnp.ones(x.shape[:2], jnp.int32)
                if self.sp_impl == "ring":
                    from legommenders_tpu.ops.ring_attention import (
                        ring_attention,
                    )
                    out = ring_attention(q, k, v, m, sp_mesh, num_heads=H)
                else:
                    from legommenders_tpu.ops.sp_attention import (
                        ulysses_attention,
                    )
                    out = ulysses_attention(q, k, v, m, sp_mesh,
                                            num_heads=H)
                if self.out_proj:
                    out = nn.Dense(D, dtype=self.dtype, name="out")(out)
                if self.use_residual:
                    res = x if D_in == D else nn.Dense(
                        D, use_bias=False, dtype=self.dtype, name="res")(x)
                    out = out + res
                if self.layer_norm:
                    out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out)
                if self.relu_out:
                    out = nn.relu(out)
                return out

        B, L = x.shape[0], x.shape[-2]
        q = q.reshape(*x.shape[:-1], H, d)
        k = k.reshape(*x.shape[:-1], H, d)
        v = v.reshape(*x.shape[:-1], H, d)

        scores = jnp.einsum("...qhd,...khd->...hqk", q, k)
        if self.use_scale:
            scores = scores / jnp.sqrt(jnp.array(d, dtype=scores.dtype))
        if mask is not None:
            key_mask = mask[..., None, None, :]  # (..., 1, 1, L)
            key_mask = jnp.broadcast_to(key_mask, scores.shape)
            attn = masked_softmax(scores, key_mask)
        else:
            attn = nn.softmax(scores, axis=-1)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout)(attn, deterministic=not training)
        out = jnp.einsum("...hqk,...khd->...qhd", attn, v)
        out = out.reshape(*x.shape[:-1], D)
        if self.out_proj:
            out = nn.Dense(D, dtype=self.dtype, name="out")(out)

        if self.use_residual:
            res = x if D_in == D else nn.Dense(
                D, use_bias=False, dtype=self.dtype, name="res")(x)
            out = out + res
        if self.layer_norm:
            # torch nn.LayerNorm default eps (FuxiCTR parity)
            out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(out)
        if self.relu_out:
            out = nn.relu(out)
        return out


class StatelessBatchNorm(nn.Module):
    """Batch normalization by current-batch statistics (no running
    averages). Keeps every step function pure — no mutable batch_stats
    collection to thread through jit. Matches torch BatchNorm train-mode
    math; at eval it normalizes by the eval batch's own statistics (the
    reference's BN-using configs all default batch_norm=false, so this
    divergence is dormant)."""

    use_scale: bool = True
    use_bias: bool = True
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (x.shape[-1],))
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y


class Dice(nn.Module):
    """Dice activation (reference model/predictors/din_predictor.py:66-76)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        norm = StatelessBatchNorm(use_scale=False, use_bias=False,
                                  eps=1e-9, dtype=self.dtype)(x)
        p = nn.sigmoid(norm)
        alpha = self.param("alpha", nn.initializers.zeros, (x.shape[-1],))
        return p * x + (1.0 - p) * alpha * x


def get_activation(name: str):
    name = (name or "relu").lower()
    return {
        "relu": nn.relu,
        "tanh": jnp.tanh,
        "sigmoid": nn.sigmoid,
        # exact erf form — torch nn.GELU() default (FuxiCTR get_activation)
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "identity": lambda x: x,
        "none": lambda x: x,
    }[name]


class MLPLayer(nn.Module):
    """Configurable MLP stack (reference model/common/mlp_layer.py:6-45)."""

    hidden_units: Sequence[int] = ()
    output_dim: Optional[int] = None
    activation: str = "relu"
    dropout: float = 0.0
    batch_norm: bool = False
    use_bias: bool = True
    output_activation: Optional[str] = None
    use_dice: bool = False  # DIN attention MLP uses Dice activations
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        act = get_activation(self.activation)
        for i, width in enumerate(self.hidden_units):
            x = nn.Dense(width, use_bias=self.use_bias, dtype=self.dtype,
                         name=f"dense_{i}")(x)
            if self.batch_norm:
                x = StatelessBatchNorm(dtype=self.dtype)(x)
            if self.use_dice:
                x = Dice(dtype=self.dtype, name=f"dice_{i}")(x, training)
            else:
                x = act(x)
            if self.dropout > 0:
                x = nn.Dropout(self.dropout)(x, deterministic=not training)
        if self.output_dim is not None:
            x = nn.Dense(self.output_dim, use_bias=self.use_bias,
                         dtype=self.dtype, name="dense_out")(x)
            if self.output_activation:
                x = get_activation(self.output_activation)(x)
        return x


class LRLayer(nn.Module):
    """Logistic-regression sum layer (reference model/common/lr_layer.py)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Dense(1, dtype=self.dtype)(x).squeeze(-1)
