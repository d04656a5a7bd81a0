"""Ulysses-style sequence-parallel self-attention (shard_map + all-to-all).

Long-context path for flatten-mode user encoders (histories of S·per_click
tokens): activations arrive sequence-sharded over the `sp` axis; an
all-to-all re-shards from sequence to HEADS, each device runs standard
softmax attention for its head group over the FULL sequence, and a second
all-to-all returns to sequence sharding. Communication is 2 all-to-alls of
the activation block per layer — the DeepSpeed-Ulysses recipe, expressed
with jax.lax.all_to_all inside shard_map. No reference counterpart (the
reference is single-device; its long-context answer is truncation,
SURVEY §5).

Requires num_heads % sp == 0 and L % sp == 0.
"""
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from legommenders_tpu.ops.core import masked_softmax

SP_AXIS = "sp"


def ulysses_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                      mask: jnp.ndarray, mesh: Mesh, num_heads: int,
                      axis: str = SP_AXIS) -> jnp.ndarray:
    """q/k/v (B, L, D) sequence-sharded over `axis`; mask (B, L) likewise.
    Returns (B, L, D) sequence-sharded attention output."""
    D = q.shape[-1]
    d = D // num_heads

    def f(q_s, k_s, v_s, m_s):
        n = jax.lax.psum(1, axis)
        B, l = q_s.shape[0], q_s.shape[1]           # l = L / n
        hpd = num_heads // n                        # heads per device

        def seq_to_heads(x):
            # (B, l, H, d) -> all_to_all over H -> (B, L, hpd, d)
            x = x.reshape(B, l, num_heads, d)
            x = jax.lax.all_to_all(x, axis, split_axis=2, concat_axis=1,
                                   tiled=True)
            return x                                 # (B, L, hpd, d)

        qh = seq_to_heads(q_s)
        kh = seq_to_heads(k_s)
        vh = seq_to_heads(v_s)
        m_full = jax.lax.all_gather(m_s, axis, axis=1, tiled=True)  # (B, L)

        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(
            jnp.array(d, qh.dtype))
        key_mask = jnp.broadcast_to(m_full[:, None, None, :], scores.shape)
        attn = masked_softmax(scores, key_mask)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)  # (B, L, hpd, d)

        # heads -> sequence: inverse all-to-all
        out = jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2,
                                 tiled=True)           # (B, l, H, d)
        return out.reshape(B, l, D)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )(q, k, v, mask)
