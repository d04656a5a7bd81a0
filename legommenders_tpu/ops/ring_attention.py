"""Ring attention: sequence-parallel attention with rotating K/V blocks.

Alternative to Ulysses (ops/sp_attention.py) for the long-context flatten
path: instead of re-sharding sequence->heads with two all-to-alls, each
device keeps its LOCAL query block and streams every K/V block around the
`sp` ring with `lax.ppermute`, maintaining a flash-style online softmax
(running row-max + row-sum in f32, exact to dense attention). Communication
per layer is (n-1) ppermute hops of one K/V block — point-to-point over
ICI neighbors, no all-to-all fan-in — which is the better fit when
sequence length per device is large and head count is small (Ulysses needs
num_heads % sp == 0; ring attention has no head constraint).

Masking matches ops/core.masked_softmax: all-masked query rows return
zeros. No reference counterpart (the reference is single-device;
SURVEY §5 long-context = truncation).
"""
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

SP_AXIS = "sp"


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mask: jnp.ndarray, mesh: Mesh, num_heads: int,
                   axis: str = SP_AXIS) -> jnp.ndarray:
    """q/k/v (B, L, D) sequence-sharded over `axis`; mask (B, L) likewise.
    Returns (B, L, D) sequence-sharded attention output, numerically equal
    to dense masked softmax attention over the full sequence."""
    D = q.shape[-1]
    H = num_heads
    d = D // H
    n = int(mesh.shape[axis])

    def f(q_s, k_s, v_s, m_s):
        B, l = q_s.shape[0], q_s.shape[1]
        qh = q_s.reshape(B, l, H, d).astype(jnp.float32)
        kh = k_s.reshape(B, l, H, d).astype(jnp.float32)
        vh = v_s.reshape(B, l, H, d).astype(jnp.float32)
        mb = m_s.astype(jnp.float32)                   # (B, l)
        scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))

        neg = jnp.finfo(jnp.float32).min
        o = jnp.zeros((B, H, l, d), jnp.float32)
        mx = jnp.full((B, H, l), neg, jnp.float32)     # running row max
        s = jnp.zeros((B, H, l), jnp.float32)          # running row sum

        perm = [(i, (i + 1) % n) for i in range(n)]
        kc, vc, mc = kh, vh, mb
        for _hop in range(n):
            scores = jnp.einsum("blhd,bkhd->bhlk", qh, kc) * scale
            scores = jnp.where(mc[:, None, None, :] > 0, scores, neg)
            blk_mx = jnp.max(scores, axis=-1)          # (B, H, l)
            new_mx = jnp.maximum(mx, blk_mx)
            # guard fully-masked-so-far rows (max still == neg)
            safe_mx = jnp.where(new_mx > neg / 2, new_mx, 0.0)
            e = jnp.exp(scores - safe_mx[..., None]) \
                * (mc[:, None, None, :] > 0)
            corr = jnp.where(mx > neg / 2,
                             jnp.exp(mx - safe_mx), 0.0)  # (B, H, l)
            o = o * corr[..., None] + jnp.einsum("bhlk,bkhd->bhld", e, vc)
            s = s * corr + e.sum(axis=-1)
            mx = new_mx
            if _hop != n - 1:
                kc = jax.lax.ppermute(kc, axis, perm)
                vc = jax.lax.ppermute(vc, axis, perm)
                mc = jax.lax.ppermute(mc, axis, perm)

        out = o / (s[..., None] + 1e-8)                # zeros if all-masked
        out = out.transpose(0, 2, 1, 3).reshape(B, l, D)
        return out.astype(q_s.dtype)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(None, axis, None), P(None, axis, None),
                  P(None, axis, None), P(None, axis)),
        out_specs=P(None, axis, None),
        check_rep=False,
    )(q, k, v, mask)
