"""Row-sharded embedding lookup with explicit collectives (shard_map).

BASELINE.json north star: "token/item embedding tables become row-sharded
across a TPU pod slice with all-to-all ID exchange for lookup". Two
implementations over a (dp, mp) mesh:

  * `sharded_lookup` — owner-computes + psum: every mp shard gathers the
    rows it owns (others contribute zeros) and one `psum` over mp combines
    them. IDs ride replicated over mp, sharded over dp; one ICI
    all-reduce of (B·L·D) per lookup. This is the XLA-SPMD-canonical
    pattern and is fully differentiable (the psum transposes to an
    identity on the cotangent, so gradients flow back to the owned rows
    only).

  * `sharded_lookup_gather` — all-gather of the table shard then local
    take; cheaper when B·L·D >> V·D/n (small vocab, huge batch).

Both verified bit-equal to a replicated `jnp.take` on the virtual CPU mesh
(tests/test_parallel.py).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from legommenders_tpu.parallel.mesh import DP_AXIS, MP_AXIS


def sharded_lookup(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh,
                   dp_sharded_ids: bool = True) -> jnp.ndarray:
    """table (V, D) row-sharded over mp; ids (B, ...) int -> (B, ..., D).

    V must divide evenly by the mp size (pad the table if not).
    """
    id_spec = P(DP_AXIS) if dp_sharded_ids else P()

    def f(local_table, local_ids):
        shard = jax.lax.axis_index(MP_AXIS)
        rows = local_table.shape[0]
        lo = shard * rows
        rel = local_ids - lo
        owned = (rel >= 0) & (rel < rows)
        safe = jnp.clip(rel, 0, rows - 1)
        out = jnp.take(local_table, safe, axis=0)
        out = jnp.where(owned[..., None], out, 0)
        return jax.lax.psum(out, MP_AXIS)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(MP_AXIS, None), id_spec),
        out_specs=id_spec,
        check_rep=False,
    )(table, ids)


def sharded_lookup_gather(table: jnp.ndarray, ids: jnp.ndarray, mesh: Mesh,
                          dp_sharded_ids: bool = True) -> jnp.ndarray:
    """All-gather the table over mp, then local take."""
    id_spec = P(DP_AXIS) if dp_sharded_ids else P()

    def f(local_table, local_ids):
        full = jax.lax.all_gather(local_table, MP_AXIS, axis=0, tiled=True)
        return jnp.take(full, jnp.clip(local_ids, 0, full.shape[0] - 1),
                        axis=0)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(MP_AXIS, None), id_spec),
        out_specs=id_spec,
        check_rep=False,
    )(table, ids)


def pad_rows_for_sharding(table: jnp.ndarray, n_shards: int) -> jnp.ndarray:
    v = table.shape[0]
    rem = (-v) % n_shards
    if rem:
        table = jnp.concatenate(
            [table, jnp.zeros((rem, table.shape[1]), table.dtype)], axis=0)
    return table


def sharded_catalog_scores(user_repr: jnp.ndarray, item_repr: jnp.ndarray,
                           mesh: Mesh) -> jnp.ndarray:
    """Sharded serving: item cache stays row-sharded over mp; each shard
    scores the (replicated) user batch against its local items and the
    score matrix comes back sharded on the item axis — zero item-repr
    movement (BASELINE north star: 'caches left sharded for sharded
    scoring'). user (B, D), items (N, D) -> (B, N)."""

    def f(u, local_items):
        return jnp.einsum("bd,nd->bn", u, local_items)

    return shard_map(
        f, mesh=mesh,
        in_specs=(P(), P(MP_AXIS, None)),
        out_specs=P(None, MP_AXIS),
        check_rep=False,
    )(user_repr, item_repr)
