"""Device metric engine vs the numpy oracle (VERDICT r4 item 3).

The jitted engine (runtime/device_metrics.py) must reproduce the numpy
segment engine (runtime/metrics.py, itself golden against the reference's
pandas/Pool implementation semantics) at 1e-6 across adversarial group
structure: score ties, single-class groups, empty-positive groups,
singleton groups, non-dense group ids.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from legommenders_tpu.runtime.metrics import MetricPool

ALL = ["GAUC", "MRR", "MRR0", "LRAP", "NDCG@1", "NDCG@5", "NDCG@10",
       "HitRatio@5", "Recall@5"]


def _rand_case(rng, n_groups=400, max_size=40, ties=False):
    sizes = rng.integers(1, max_size, n_groups)
    groups = np.repeat(rng.permutation(n_groups * 3)[:n_groups], sizes)
    n = len(groups)
    scores = rng.normal(size=n).astype(np.float32)
    if ties:
        # quantize so (group, score) tie runs appear
        scores = np.round(scores * 4) / 4
    labels = (rng.random(n) < 0.3).astype(np.float32)
    return scores, labels, groups


@pytest.mark.parametrize("ties", [False, True])
def test_device_matches_numpy_random(ties):
    import jax.numpy as jnp

    rng = np.random.default_rng(7 + ties)
    scores, labels, groups = _rand_case(rng, ties=ties)
    pool = MetricPool.parse(ALL)
    assert pool.supports_device
    want = pool(scores, labels, groups)
    got = pool.calculate_device(jnp.asarray(scores), jnp.asarray(labels),
                                jnp.asarray(groups.astype(np.int32)))
    assert list(got) == list(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_device_matches_numpy_degenerate_groups():
    """all-positive, all-negative and singleton groups exercise every
    valid-mask branch (GAUC two-class filter, MRR/Recall pos>0, LRAP=1)."""
    import jax.numpy as jnp

    scores = np.array([0.9, 0.1, 0.5, 0.4, 0.3, 0.8, 0.2, 0.6, 0.7],
                      np.float32)
    labels = np.array([1, 1, 0, 0, 0, 1, 0, 1, 0], np.float32)
    groups = np.array([5, 5, 9, 9, 9, 2, 7, 7, 7], np.int32)
    pool = MetricPool.parse(ALL)
    want = pool(scores, labels, groups)
    got = pool.calculate_device(jnp.asarray(scores), jnp.asarray(labels),
                                jnp.asarray(groups))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_device_matches_numpy_large_prefix():
    """Accuracy stress for the scatter-free engine: at large n the global
    double-float prefix is ~1e5 while group totals are ~1 — a plain f32
    cumsum differenced at boundaries would be wrong in the SECOND decimal
    here. 400k rows, 20k groups, heavy ties."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    sizes = rng.integers(5, 35, 20_000)
    groups = np.repeat(np.arange(20_000), sizes)
    n = len(groups)
    scores = np.round(rng.standard_normal(n) * 8) / 8
    labels = (rng.random(n) < 0.25).astype(np.float32)
    pool = MetricPool.parse(ALL)
    want = pool(scores, labels, groups)
    got = pool.calculate_device(jnp.asarray(scores, jnp.float32),
                                jnp.asarray(labels),
                                jnp.asarray(groups.astype(np.int32)))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_device_fallback_for_pointwise():
    """AUC/LogLoss are host-only: calculate_device transparently falls
    back to the numpy engine (one D2H) with identical values."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    scores, labels, groups = _rand_case(rng, n_groups=50)
    scores = 1.0 / (1.0 + np.exp(-scores))
    pool = MetricPool.parse(["AUC", "GAUC"])
    assert not pool.supports_device
    want = pool(scores, labels, groups)
    got = pool.calculate_device(jnp.asarray(scores), jnp.asarray(labels),
                                jnp.asarray(groups.astype(np.int32)))
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])


def test_evaluator_device_pool_matches_host_pool():
    """End-to-end: the cached fast-eval hot path with the device pool must
    equal the same eval with a host-forced pool."""
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.trainer import Trainer

    data = SyntheticProcessor(
        num_items=60, num_users=30, title_len=8, history_len=6,
        inters_per_user=10).as_lego_data()
    model_cfg = {
        "meta": {"item": "CNN", "user": "Ada", "predictor": "Dot"},
        "config": {"use_item_content": True, "hidden_size": 16,
                   "cache_page_size": 32},
    }
    m = Manager({}, model_cfg,
                exp_cfg={"policy": {"batch_size": 16, "epoch": 1,
                                    "epoch_batch": 2, "lr": 1e-3}},
                data=data)
    t = Trainer(m, seed=5)
    t.init()
    ev = t.evaluator
    got = ev.evaluate(t.params, "test")
    # recompute via the host pool on the same device scores
    ph = ev._get_device_phase("test")
    scores = ev.score_phase_device(t.params, "test")
    want = ev.pool(scores, ph.labels, ph.groups)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6, (k, got[k], want[k])
