"""Catalog-parallel training (parallel/catalog.py): the item catalog —
token columns or the LM hidden cache — lives row-sharded over ALL mesh
devices, each device encodes only its local rows, and the updated params
match the replicated single-device step exactly (dropout off).

8-device virtual CPU mesh (conftest)."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

sys.path.insert(0, "/root/repo")

from legommenders_tpu.parallel.catalog import (
    catalog_axes, make_catalog_parallel_step, pad_catalog, place_catalog,
    sharded_catalog_encode,
)
from legommenders_tpu.parallel.mesh import make_mesh
from legommenders_tpu.runtime.steps import init_params, make_train_step


def _build(num_items=100, item_op="CNN", item_config=None, tmp=None):
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager

    data = SyntheticProcessor(
        num_items=num_items, num_users=40, title_len=8, history_len=6,
        inters_per_user=10).as_lego_data()
    cfg = {
        "meta": {"item": item_op, "user": "Ada", "predictor": "Dot"},
        "config": {"use_item_content": True, "hidden_size": 16,
                   "use_neg_sampling": True, "neg_count": 2,
                   "full_catalog_encode": "on",
                   "cache_page_size": 32,
                   "item_config": dict(item_config or {"dropout": 0.0})},
    }
    m = Manager({}, cfg, exp_cfg={"policy": {"batch_size": 16}}, data=data)
    tb = m.train_batcher(seed=0)
    jbatch = {k: jnp.asarray(v) for k, v in next(tb.epoch(shuffle=False)).items()}
    return m, jbatch


def test_pad_and_place_rowsharded():
    m, _ = _build(num_items=100)  # 100 % 8 != 0 -> padding exercised
    mesh = make_mesh(n_dp=4, n_mp=2)
    contents, n = place_catalog(dict(m.contents.columns), mesh)
    assert n == 100
    for c, a in contents.items():
        assert a.shape[0] == 104  # padded to 8 devices
        # each device holds exactly rows/8 — the memory claim
        shard_rows = {s.data.shape[0] for s in a.addressable_shards}
        assert shard_rows == {13}, (c, shard_rows)
    assert catalog_axes(mesh) == ("dp", "mp")


def test_sharded_encode_matches_dense():
    m, _ = _build(num_items=96)
    mesh = make_mesh(n_dp=4, n_mp=2)
    params = init_params(m.model, _build(num_items=96)[1],
                        m.contents.columns, seed=0)
    contents, n = place_catalog(dict(m.contents.columns), mesh)
    enc = sharded_catalog_encode(m.model, mesh)
    rng = jax.random.PRNGKey(0)
    out = enc(params, contents, rng, training=False)
    ref = m.model.apply(params, dict(m.contents.columns), training=False,
                        method=m.model.encode_item_content)
    np.testing.assert_allclose(np.asarray(out)[:n], np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("axes", [(8, 1), (4, 2)])
def test_catalog_parallel_step_matches_single_device(axes):
    """Updated params after one catalog-parallel step == the plain fused
    step (dropout 0 -> rng-independent; shard_map transpose must psum the
    replicated params' cotangents)."""
    m, jbatch = _build(num_items=100)
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)
    opt = optax.adam(1e-3)

    ref_step = make_train_step(m.model, m.contents.columns, opt,
                               donate=False)
    p1, _, loss1 = ref_step(params, opt.init(params), jbatch,
                            jax.random.PRNGKey(7))

    mesh = make_mesh(n_dp=axes[0], n_mp=axes[1])
    step = make_catalog_parallel_step(m.model, opt, mesh,
                                      rng_impl="threefry2x32")
    contents, _ = place_catalog(dict(m.contents.columns), mesh)
    with mesh:
        p8, _, loss8 = step(jax.tree.map(jnp.copy, params),
                            opt.init(params), contents, jbatch, 0)
    assert float(loss1) == pytest.approx(float(loss8), rel=2e-5)
    for (k1, a), (k8, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p1),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p8),
                   key=lambda kv: str(kv[0]))):
        assert str(k1) == str(k8)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(k1))


def test_catalog_parallel_lm_cache(tmp_path, monkeypatch):
    """The headline use: the LM hidden cache lives row-sharded. A
    tune_from BERT operator trains one catalog-parallel step from the
    sharded cache and matches the single-device step."""
    monkeypatch.chdir(tmp_path)  # cache/ written here
    m, jbatch = _build(
        num_items=96, item_op="Bert",
        item_config={"tune_from": 1, "num_hidden_layers": 2,
                     "num_attention_heads": 2, "hidden_size": 16,
                     "use_lora": True, "lora_r": 2, "lora_dropout": 0.0,
                     "dropout": 0.0, "attn_dropout": 0.0,
                     "lm_dtype": jnp.float32})
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)
    assert m.prepare_lm_cache(params)
    assert "__lm_hidden__" in m.contents.columns

    opt = optax.adam(1e-3)
    ref_step = make_train_step(m.model, m.contents.columns, opt,
                               donate=False)
    p1, _, loss1 = ref_step(params, opt.init(params), jbatch,
                            jax.random.PRNGKey(3))

    mesh = make_mesh(n_dp=8, n_mp=1)
    contents, _ = place_catalog(dict(m.contents.columns), mesh)
    # the sharded cache is the memory story: every shard holds N/8 rows
    hid = contents["__lm_hidden__"]
    assert {s.data.shape[0] for s in hid.addressable_shards} == {12}
    step = make_catalog_parallel_step(m.model, opt, mesh,
                                      rng_impl="threefry2x32")
    with mesh:
        p8, _, loss8 = step(jax.tree.map(jnp.copy, params),
                            opt.init(params), contents, jbatch, 0)
    assert float(loss1) == pytest.approx(float(loss8), rel=2e-5)
    for (k1, a), (k8, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(p1),
                   key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p8),
                   key=lambda kv: str(kv[0]))):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=str(k1))
