"""item_page_size paging: scan+remat over occurrence pages must be
numerically identical to the single-pass encode, for forward AND gradients
(reference legommender.py:174-190, lego_config.py:114-115).
"""
import jax
import jax.numpy as jnp
import numpy as np

from legommenders_tpu.data.pipeline import TrainBatcher
from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.models.lego_config import LegoConfig
from legommenders_tpu.runtime.steps import init_params


def _build(item_page_size, full_catalog="off", item_op="CNN",
           item_config=None, data=None):
    data = data or SyntheticProcessor(
        num_items=50, num_users=25, title_len=8, history_len=6,
        inters_per_user=10).as_lego_data()
    cfg = LegoConfig(
        data=data, item_operator=item_op, user_operator="Ada",
        predictor="Dot", hidden_size=16, neg_count=2,
        item_page_size=item_page_size, full_catalog_encode=full_catalog,
        item_config=item_config or {}, use_fast_eval=False)
    model, contents, _ = cfg.build()
    return model, contents, data


def _grads_and_scores(model, contents, data, seed=0):
    batch = {k: jnp.asarray(v) for k, v in
             next(TrainBatcher(data, 6, neg_count=2, seed=seed).epoch()).items()}
    params = init_params(model, batch, contents.columns, seed=seed)
    scores = model.apply(params, batch, contents.columns, training=False)

    # deterministic loss (training=False): paging splits dropout rngs per
    # page, so stochastic grads are expected to differ; path equivalence is
    # asserted on the deterministic graph
    def loss(p):
        s = model.apply(p, batch, contents.columns, training=False)
        return -jnp.mean(jax.nn.log_softmax(s, axis=-1)[..., 0])

    grads = jax.grad(loss)(params)
    return params, scores, grads


def _assert_tree_close(a, b, rtol=1e-5, atol=1e-6):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    for path, x in fa:
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(fb[path]), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(path))


def test_paged_equals_unpaged_per_occurrence():
    data = SyntheticProcessor(num_items=50, num_users=25, title_len=8,
                              history_len=6, inters_per_user=10
                              ).as_lego_data()
    m0, c0, _ = _build(0, data=data)
    m1, c1, _ = _build(16, data=data)  # 6*(3+6)=54 occurrences -> 4 pages
    p0, s0, g0 = _grads_and_scores(m0, c0, data)
    p1, s1, g1 = _grads_and_scores(m1, c1, data)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-5, atol=1e-6)
    _assert_tree_close(g0, g1)


def test_paged_equals_unpaged_catalog_mode():
    """Catalog path with paging: plans are shape-bound and silently skip
    under paging; values must still match the unpaged catalog encode."""
    data = SyntheticProcessor(num_items=50, num_users=25, title_len=8,
                              history_len=6, inters_per_user=10
                              ).as_lego_data()
    m0, c0, _ = _build(0, full_catalog="on", data=data)
    m1, c1, _ = _build(16, full_catalog="on", data=data)  # 50 items, 4 pages
    p0, s0, g0 = _grads_and_scores(m0, c0, data)
    p1, s1, g1 = _grads_and_scores(m1, c1, data)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-5, atol=1e-6)
    _assert_tree_close(g0, g1, rtol=1e-4, atol=1e-5)


def test_paged_lm_operator_trains():
    """A (tiny) BERT LM operator with paging: loss is finite and the page
    count doesn't change results."""
    data = SyntheticProcessor(num_items=30, num_users=15, title_len=6,
                              history_len=4, inters_per_user=8
                              ).as_lego_data()
    icfg = {"num_hidden_layers": 2, "num_attention_heads": 2,
            "use_lora": False,
            "inputer_config": {"use_cls_token": False,
                               "use_sep_token": False}}
    m0, c0, _ = _build(0, item_op="Bert", item_config=icfg, data=data)
    m1, c1, _ = _build(8, item_op="Bert", item_config=icfg, data=data)
    p0, s0, _ = _grads_and_scores(m0, c0, data)
    p1, s1, _ = _grads_and_scores(m1, c1, data)
    assert np.isfinite(np.asarray(s0)).all()
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=2e-4, atol=2e-5)


def test_remat_policies_grad_equivalent():
    """item_page_remat full/dots/none: identical scores and grads (the
    policy only changes what the backward saves vs recomputes)."""
    data = SyntheticProcessor(num_items=50, num_users=25, title_len=8,
                              history_len=6, inters_per_user=10
                              ).as_lego_data()
    results = []
    for remat in ("full", "dots", "none"):
        cfg = LegoConfig(
            data=data, item_operator="CNN", user_operator="Ada",
            predictor="Dot", hidden_size=16, neg_count=2,
            item_page_size=16, item_page_remat=remat,
            full_catalog_encode="off", use_fast_eval=False)
        model, contents, _ = cfg.build()
        results.append(_grads_and_scores(model, contents, data))
    _, s_full, g_full = results[0]
    for _, s, g in results[1:]:
        np.testing.assert_allclose(np.asarray(s_full), np.asarray(s),
                                   rtol=1e-5, atol=1e-6)
        _assert_tree_close(g_full, g)
