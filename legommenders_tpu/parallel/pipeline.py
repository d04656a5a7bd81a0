"""Pipeline parallelism (GPipe-style) for homogeneous layer stacks.

No reference counterpart (the reference is single-device; its cost control
for deep LMs is the offline `tune_from` split, once_operator.py:101-134).
Here the runtime slice itself can be staged across a `pp` mesh axis: each
device owns a contiguous block of layers; microbatches stream through the
stages with `lax.ppermute` hand-offs inside one `shard_map`d `lax.scan`
(bubble fraction = (P-1)/(M+P-1)).

Differentiable end-to-end: ppermute/scan have exact VJPs, so the same
machinery backs training, not just inference.
"""
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

PP_AXIS = "pp"


def gpipe(stage_fn: Callable, stage_params, x: jnp.ndarray, mesh: Mesh,
          num_microbatches: int, axis: str = PP_AXIS, *stage_args):
    """Run `num_stages` sequential stages over `x` in pipeline.

    stage_fn(params_slice, x_mb, *stage_args) -> y_mb, applied by every
    device to its own stage's params. `stage_params` is a pytree whose
    leaves are stacked on a leading stage axis of size P = mesh.shape[axis]
    (see stack_layer_params). x (B, ...) with B % num_microbatches == 0;
    extra `stage_args` are broadcast unsharded (e.g. an attention mask is
    passed per-microbatch instead — fold it into x or close over it).

    Returns (B, ...) outputs, replicated over `axis`.
    """
    B = x.shape[0]
    M = num_microbatches
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"
    mb = B // M
    x_mb = x.reshape(M, mb, *x.shape[1:])

    def per_device(params_local, x_all):
        # params_local: this stage's params (leading axis stripped to 1)
        params_local = jax.tree_util.tree_map(
            lambda a: a[0], params_local)
        p_idx = jax.lax.axis_index(axis)
        n_stage = jax.lax.psum(1, axis)
        ticks = M + n_stage - 1

        act0 = jnp.zeros((mb,) + x.shape[1:], x.dtype)
        out0 = jnp.zeros_like(x_all)                  # (M, mb, ...)

        def tick(carry, t):
            act, out = carry
            # stage 0 injects microbatch t (static-shape dynamic slice)
            feed_idx = jnp.clip(t, 0, M - 1)
            fresh = jax.lax.dynamic_index_in_dim(
                x_all, feed_idx, axis=0, keepdims=False)
            act_in = jnp.where(p_idx == 0,
                               jnp.where(t < M, fresh, act), act)
            act_out = stage_fn(params_local, act_in)
            # last stage banks microbatch t - (P-1) when valid
            done_idx = t - (n_stage - 1)
            bank = (p_idx == n_stage - 1) & (done_idx >= 0)
            slot = jnp.clip(done_idx, 0, M - 1)
            banked = jax.lax.dynamic_update_index_in_dim(
                out, jnp.where(bank, act_out,
                               jax.lax.dynamic_index_in_dim(
                                   out, slot, axis=0, keepdims=False)),
                slot, axis=0)
            # hand activation to the next stage
            nxt = jax.lax.ppermute(
                act_out, axis,
                [(i, (i + 1) % n_stage) for i in range(n_stage)])
            return (nxt, banked), None

        (_, out), _ = jax.lax.scan(tick, (act0, out0), jnp.arange(ticks))
        # only the last stage holds real outputs; psum broadcasts them
        out = jnp.where(p_idx == n_stage - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, axis)

    # other mesh axes (if any) see the data replicated
    spec_params = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_params, P()),
        out_specs=P(),
        check_rep=False,
    )(stage_params, x_mb)
    return out.reshape(B, *x.shape[1:])


def gpipe_tree(stage_fn: Callable, stage_params, x, mesh: Mesh,
               num_microbatches: int, axis: str = PP_AXIS):
    """gpipe over a PYTREE of per-row tensors.

    `x` is a pytree whose leaves all have leading dim B — the hidden
    states plus whatever must ride along with each microbatch through the
    stages (attention bias, per-microbatch rng seeds). stage_fn(params,
    x_tree) -> x_tree (same structure). Returns the output pytree,
    replicated over `axis`."""
    leaves = jax.tree_util.tree_leaves(x)
    B = leaves[0].shape[0]
    M = num_microbatches
    assert B % M == 0, f"batch {B} % microbatches {M} != 0"
    mb = B // M
    x_mb = jax.tree_util.tree_map(
        lambda a: a.reshape(M, mb, *a.shape[1:]), x)

    def per_device(params_local, x_all):
        params_local = jax.tree_util.tree_map(lambda a: a[0], params_local)
        p_idx = jax.lax.axis_index(axis)
        n_stage = jax.lax.psum(1, axis)
        ticks = M + n_stage - 1

        act0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), x_all)
        out0 = jax.tree_util.tree_map(jnp.zeros_like, x_all)

        def tick(carry, t):
            act, out = carry
            feed_idx = jnp.clip(t, 0, M - 1)
            fresh = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, feed_idx, axis=0, keepdims=False), x_all)
            take_fresh = (p_idx == 0) & (t < M)
            act_in = jax.tree_util.tree_map(
                lambda f, a: jnp.where(take_fresh, f, a), fresh, act)
            act_out = stage_fn(params_local, act_in)
            done_idx = t - (n_stage - 1)
            bank = (p_idx == n_stage - 1) & (done_idx >= 0)
            slot = jnp.clip(done_idx, 0, M - 1)

            def bank_one(o, a):
                cur = jax.lax.dynamic_index_in_dim(o, slot, axis=0,
                                                   keepdims=False)
                return jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(bank, a, cur), slot, axis=0)
            banked = jax.tree_util.tree_map(bank_one, out, act_out)
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(
                    a, axis,
                    [(i, (i + 1) % n_stage) for i in range(n_stage)]),
                act_out)
            return (nxt, banked), None

        (_, out), _ = jax.lax.scan(tick, (act0, out0), jnp.arange(ticks))
        out = jax.tree_util.tree_map(
            lambda o: jax.lax.psum(
                jnp.where(p_idx == n_stage - 1, o, jnp.zeros_like(o)),
                axis), out)
        return out

    spec_params = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    # composition with data parallelism: when the mesh carries a dp axis,
    # the per-microbatch row dim is sharded over it — each (dp, pp)
    # device pipelines its own mb/n_dp rows; ppermute stays within the dp
    # slice. Without this, every dp replica would redundantly process the
    # full microbatch (P() = replicated).
    data_axis = None
    if "dp" in mesh.axis_names and mesh.shape["dp"] > 1 and \
            mb % mesh.shape["dp"] == 0:
        data_axis = "dp"
    spec_x = jax.tree_util.tree_map(lambda _: P(None, data_axis), x_mb)
    out = shard_map(
        per_device, mesh=mesh,
        in_specs=(spec_params, spec_x),
        out_specs=spec_x,
        check_rep=False,
    )(stage_params, x_mb)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(B, *a.shape[2:]), out)


def stack_layer_params(params: dict, layer_names, layers_per_stage: int,
                       apply_fn=None):
    """Helper: turn {layer_0: tree, layer_1: tree, ...} into a pytree of
    leaves stacked (P, layers_per_stage, ...) for gpipe stages of
    `layers_per_stage` sequential layers each."""
    n = len(layer_names)
    assert n % layers_per_stage == 0
    trees = [params[name] for name in layer_names]
    grouped = [
        jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0),
            *trees[i:i + layers_per_stage])
        for i in range(0, n, layers_per_stage)
    ]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0),
                                  *grouped)
