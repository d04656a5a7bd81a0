"""Sequence-parallel additive attention (shard_map over an `sp` axis).

Long-context scaling for flatten-mode user encoders (BST-style histories:
L = S·per_click tokens, reference flatten_seq_inputer.py:34-44): the
sequence axis is sharded across devices; each shard computes its local
max/exp-sum/weighted-sum and two tiny `psum`s produce the exact global
softmax-pooled output — communication is O(D) per row instead of O(L·D)
(no reference counterpart; the reference is single-device).

Math: out = Σ_l softmax(s)_l · x_l decomposes over shards with the usual
max-shifted two-pass trick:
    m = psum-max of local maxima
    Z = psum of Σ_local exp(s - m)·mask
    W = psum of Σ_local exp(s - m)·mask·x
    out = W / (Z + eps)
"""
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from legommenders_tpu.ops.core import EPS

SP_AXIS = "sp"


def sp_additive_attention(x: jnp.ndarray, scores: jnp.ndarray,
                          mask: jnp.ndarray, mesh: Mesh,
                          axis: str = SP_AXIS) -> jnp.ndarray:
    """x (B, L, D), scores (B, L), mask (B, L); L sharded over `axis`.
    Returns (B, D) replicated over `axis`."""

    def f(xs, ss, ms):
        ms = ms.astype(ss.dtype)
        neg = jnp.finfo(ss.dtype).min
        local = jnp.where(ms > 0, ss, neg)
        local_max = jnp.max(local, axis=1)                      # (B,)
        # pmax has no VJP; max == psum of one-device maxima via all_gather
        gathered = jax.lax.all_gather(local_max, axis)          # (n, B)
        m = jax.lax.stop_gradient(jnp.max(gathered, axis=0))
        m = jnp.where(m > neg / 2, m, 0.0)
        e = jnp.exp(local - m[:, None]) * ms                    # (B, l)
        z = jax.lax.psum(jnp.sum(e, axis=1), axis)              # (B,)
        w = jax.lax.psum(jnp.einsum("bl,bld->bd", e, xs), axis)  # (B, D)
        return w / (z + EPS)[:, None]

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis), P(None, axis)),
        out_specs=P(),
        check_rep=False,
    )(x, scores, mask)
