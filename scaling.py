"""Multi-chip scaling sweep on a virtual (or real) device mesh.

Sweeps data-parallel width (and an mp=2 tensor-sharded point + an sp
sequence-parallel point), asserting STEP-EQUIVALENCE — the sharded train
step must produce the same loss/params as the single-device step on the
same global batch — and recording per-collective communication volume
parsed from the compiled HLO, so scale-out claims are grounded in the
actual collectives XLA inserted (SURVEY §2.9: dp grads ride one
all-reduce over ICI; mp table lookups become collective gathers).

Run standalone on the 8-device virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORM_NAME=cpu python scaling.py

or via __graft_entry__.dryrun_multichip (driver) — MULTICHIP_r{N} then
carries scaling data, not just one step.
"""
import json
import re
import sys

import numpy as np

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "all-to-all",
                "collective-permute")
_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1}


def collective_volume(hlo_text: str):
    """{collective op: total result bytes} from compiled HLO text."""
    vol = {}
    for line in hlo_text.splitlines():
        for op in _COLLECTIVES:
            if f" {op}(" not in line and f" {op}-start(" not in line:
                continue
            # result type(s): everything between '=' and the op name,
            # e.g.  %ar = (f32[16,32]{1,0}, f32[8]{0}) all-reduce(...)
            head = line.split("=", 1)
            if len(head) != 2:
                continue
            rtype = head[1].split(op, 1)[0]
            nbytes = 0
            for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", rtype):
                if dt not in _DTYPE_BYTES:
                    continue
                n = 1
                for d in dims.split(","):
                    if d:
                        n *= int(d)
                nbytes += n * _DTYPE_BYTES[dt]
            vol[op] = vol.get(op, 0) + nbytes
            break
    return vol


def _build(batch):
    from __graft_entry__ import _build as build_model
    return build_model(batch=batch)


def run_point(n_dp, n_mp, batch_size, steps=3):
    """One (dp, mp) point: place, compile, run `steps` steps; returns
    (final_loss, collective volumes, params_tree)."""
    import jax
    import optax
    from legommenders_tpu.parallel.mesh import make_mesh
    from legommenders_tpu.parallel.train import make_sharded_train_step
    from legommenders_tpu.runtime.steps import init_params

    mesh = make_mesh(n_dp=n_dp, n_mp=n_mp,
                     devices=jax.devices()[: n_dp * n_mp])
    m, jbatch = _build(batch=batch_size)
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    step, place = make_sharded_train_step(
        m.model, m.contents.columns, optimizer, mesh,
        use_neg_sampling=True, min_rows_to_shard=n_mp)

    with mesh:
        params, opt_state, batch = place(params, opt_state, jbatch)
        rng = jax.random.PRNGKey(0)
        lowered = step.lower(params, opt_state, batch, rng)
        hlo = lowered.compile().as_text()
        loss = None
        for _ in range(steps):
            params, opt_state, loss = step(params, opt_state, batch, rng)
        loss = float(jax.block_until_ready(loss))
    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_leaves_with_path(params)}
    return loss, collective_volume(hlo), flat


def sweep(n_devices=8, steps=3, batch_size=16, rtol=2e-4):
    """dp scaling sweep + (dp, mp=2) + sp point; asserts step-equivalence
    against the dp=1 reference; returns the list of result records."""
    import jax

    dps = [d for d in (1, 2, 4, 8) if d <= n_devices]
    records = []
    ref_loss, ref_params = None, None
    points = [(d, 1) for d in dps]
    if n_devices >= 4:
        points.append((n_devices // 2, 2))

    for n_dp, n_mp in points:
        loss, vol, flat = run_point(n_dp, n_mp, batch_size, steps)
        if ref_loss is None:
            ref_loss, ref_params = loss, flat
            max_dev = 0.0
        else:
            max_dev = max(
                float(np.max(np.abs(flat[k] - ref_params[k])))
                for k in ref_params)
            assert abs(loss - ref_loss) <= rtol * max(1.0, abs(ref_loss)), \
                f"dp={n_dp} mp={n_mp}: loss {loss} != ref {ref_loss}"
            assert max_dev < 5e-3, \
                f"dp={n_dp} mp={n_mp}: params diverged by {max_dev}"
        records.append({
            "dp": n_dp, "mp": n_mp, "loss": round(loss, 6),
            "max_param_dev_vs_ref": float(max_dev),
            "collective_bytes": vol, "ok": True,
        })

    # sequence-parallel point: Ulysses additive pool fwd+grad parity
    # (ops/sp_additive.py) over the full device set
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.ops.sp_additive import sp_additive_attention

    sp_mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("sp",))
    B, L, D = 4, 8 * n_devices, 16
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (B, L, D))
    s = jax.random.normal(k2, (B, L))
    mask = jnp.ones((B, L))

    def pool_loss(x):
        return jnp.sum(sp_additive_attention(x, s, mask, sp_mesh) ** 2)

    with sp_mesh:
        sp_fn = jax.jit(jax.value_and_grad(pool_loss))
        hlo = sp_fn.lower(x).compile().as_text()
        sp_loss, sp_grad = sp_fn(x)
        jax.block_until_ready(sp_grad)
    records.append({
        "sp": n_devices, "loss": float(sp_loss),
        "collective_bytes": collective_volume(hlo),
        "ok": bool(np.isfinite(float(sp_loss))),
    })

    # pipeline-parallel point: first-class pipeline_stages knob on the LM
    # slice (lm/layers._pipelined_stack) — staged forward must equal the
    # serial slice
    from legommenders_tpu.models.lm.layers import BertEncoderSlice
    from legommenders_tpu.parallel.mesh import pipeline_parallel

    pp = 2 if n_devices >= 2 else 1
    if pp > 1:
        B, L, D = 8, 6, 16
        xr = np.random.default_rng(2)
        xh = jnp.asarray(xr.standard_normal((B, L, D)).astype(np.float32))
        xm = jnp.ones((B, L), jnp.int32)
        kw = dict(num_layers=2, num_heads=2, start=0, embed=False,
                  dropout=0.0)
        serial = BertEncoderSlice(**kw)
        piped = BertEncoderSlice(**kw, pipeline_stages=pp)
        p0 = serial.init(jax.random.PRNGKey(0), xh, xm, False)
        y0 = np.asarray(serial.apply(p0, xh, xm, False))
        pp_mesh = Mesh(np.asarray(jax.devices()[:pp]), ("pp",))
        with pipeline_parallel(pp_mesh):
            fn = jax.jit(lambda p: piped.apply(p, xh, xm, False))
            hlo = fn.lower(p0).compile().as_text()
            y1 = np.asarray(fn(p0))
        dev = float(np.max(np.abs(y1 - y0)))
        assert dev < 1e-4, f"pp={pp} staged slice diverged by {dev}"
        records.append({
            "pp": pp, "max_out_dev_vs_serial": dev,
            "collective_bytes": collective_volume(hlo), "ok": True,
        })

    # catalog-parallel point (parallel/catalog.py): the item catalog lives
    # row-sharded over ALL devices, each encodes only its local rows, and
    # one step must match the replicated single-device step
    import optax
    from legommenders_tpu.parallel.catalog import (
        make_catalog_parallel_step, place_catalog)
    from legommenders_tpu.parallel.mesh import make_mesh
    from legommenders_tpu.runtime.steps import init_params, make_train_step

    # dropout-free model: parity vs the single-device step must be exact
    # (the sharded encode folds device indices into the dropout keys, so
    # with dropout on the losses would differ by draw, not by math)
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    data = SyntheticProcessor(num_items=100, num_users=40, title_len=8,
                              history_len=6, inters_per_user=10
                              ).as_lego_data()
    m = Manager({}, {
        "meta": {"item": "CNN", "user": "Ada", "predictor": "Dot"},
        "config": {"use_item_content": True, "hidden_size": 16,
                   "use_neg_sampling": True, "neg_count": 2,
                   "full_catalog_encode": "on",
                   "item_config": {"dropout": 0.0}}},
        exp_cfg={"policy": {"batch_size": batch_size}}, data=data)
    tb = m.train_batcher(seed=0)
    import jax.numpy as _jnp
    jbatch = {k: _jnp.asarray(v)
              for k, v in next(tb.epoch(shuffle=False)).items()}
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)
    optimizer = optax.adam(1e-3)
    ref_step = make_train_step(m.model, m.contents.columns, optimizer,
                               donate=False)
    p1, _, loss1 = ref_step(params, optimizer.init(params), jbatch,
                            jax.random.PRNGKey(0))
    cat_mesh = make_mesh(n_dp=n_devices, n_mp=1,
                         devices=jax.devices()[:n_devices])
    contents, _n = place_catalog(dict(m.contents.columns), cat_mesh)
    shard_rows = {s.data.shape[0]
                  for s in next(iter(contents.values())).addressable_shards}
    cstep = make_catalog_parallel_step(m.model, optimizer, cat_mesh,
                                       rng_impl="threefry2x32")
    with cat_mesh:
        hlo = cstep.lower(params, optimizer.init(params), contents, jbatch,
                          0).compile().as_text()
        p8, _, loss8 = cstep(params, optimizer.init(params), contents,
                             jbatch, 0)
        loss8 = float(jax.block_until_ready(loss8))
    flat1 = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
             jax.tree_util.tree_leaves_with_path(p1)}
    flat8 = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
             jax.tree_util.tree_leaves_with_path(p8)}
    cat_dev = max(float(np.max(np.abs(flat8[k] - flat1[k])))
                  for k in flat1)
    assert abs(loss8 - float(loss1)) <= rtol * max(1.0, abs(float(loss1)))
    assert cat_dev < 5e-3, f"catalog-parallel params diverged by {cat_dev}"
    records.append({
        "catalog_parallel": n_devices,
        "rows_per_device": sorted(shard_rows),
        "loss": round(loss8, 6), "max_param_dev_vs_ref": cat_dev,
        "collective_bytes": collective_volume(hlo), "ok": True,
    })
    return records


def main():
    records = sweep()
    for r in records:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
