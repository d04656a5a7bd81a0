"""Core functional ops shared by operators/predictors.

Pure-jnp reference implementations; Pallas TPU kernels (ops/pallas_*.py)
override the hot paths and are tested for parity against these.
"""
import jax
import jax.numpy as jnp

EPS = 1e-8


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax over `axis` with 0/1 `mask`.

    Equivalent to the reference's `exp(s)*mask / (sum+eps)` formulation
    (model/common/attention.py:30-36) for any row with at least one valid
    position; all-masked rows return zeros (the reference's eps behavior).
    """
    mask = mask.astype(scores.dtype)
    neg = jnp.finfo(scores.dtype).min
    masked_scores = jnp.where(mask > 0, scores, neg)
    m = jnp.max(masked_scores, axis=axis, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)  # all-masked rows
    e = jnp.exp(masked_scores - m) * mask
    return e / (jnp.sum(e, axis=axis, keepdims=True) + EPS)


def additive_attention_pool(inputs: jnp.ndarray, scores: jnp.ndarray,
                            mask: jnp.ndarray) -> jnp.ndarray:
    """(…, L, D) × (…, L) score/mask → (…, D) attention-pooled output."""
    weights = masked_softmax(scores, mask)
    return jnp.einsum("...l,...ld->...d", weights, inputs)


def masked_mean(inputs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(…, L, D) masked mean over L."""
    mask = mask.astype(inputs.dtype)
    s = jnp.einsum("...l,...ld->...d", mask, inputs)
    n = jnp.sum(mask, axis=-1, keepdims=True)
    return s / jnp.maximum(n, 1.0)


def masked_max(inputs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(…, L, D) masked max over L (masked slots -> large negative)."""
    neg = jnp.finfo(inputs.dtype).min
    masked = jnp.where(mask[..., None] > 0, inputs, neg)
    out = jnp.max(masked, axis=-2)
    # rows with empty mask -> 0
    any_valid = jnp.any(mask > 0, axis=-1, keepdims=True)
    return jnp.where(any_valid, out, 0.0)
