"""Metric parity tests: vectorized engine vs naive per-group formulas
(the reference's documented semantics) and sklearn."""
import numpy as np
import pytest

from legommenders_tpu.runtime.metrics import MetricPool, GroupedRanking


def naive_group_metric(scores, labels, groups, fn):
    out = []
    for g in np.unique(groups):
        m = groups == g
        out.append(fn(scores[m], labels[m]))
    vals = [v for v in out if v is not None]
    return float(np.mean(vals))


def naive_mrr(s, l):
    """Reference MRR semantics (utils/metrics.py:144-160)."""
    if l.sum() == 0:
        return None
    order = sorted(range(len(s)), key=lambda i: s[i], reverse=True)
    y = [l[i] for i in order]
    rr = [y[i] / (i + 1) for i in range(len(y))]
    return sum(rr) / sum(y)


def naive_mrr0(s, l):
    order = sorted(range(len(s)), key=lambda i: s[i], reverse=True)
    for rank, idx in enumerate(order, 1):
        if l[idx] == 1:
            return 1 / rank
    return 0.0


def naive_auc(s, l):
    from sklearn.metrics import roc_auc_score
    if l.sum() == 0 or l.sum() == len(l):
        return None
    return roc_auc_score(l, s)


def naive_ndcg(s, l, k):
    from sklearn.metrics import ndcg_score
    return ndcg_score([l], [s], k=k)


@pytest.fixture(scope="module")
def ranking_data(rng):
    n_groups, rows = 50, []
    scores, labels, groups = [], [], []
    for g in range(n_groups):
        size = int(rng.integers(3, 20))
        s = rng.normal(size=size)
        l = (rng.random(size) < 0.3).astype(np.float64)
        if l.sum() == 0:
            l[rng.integers(size)] = 1
        if l.sum() == size:
            l[rng.integers(size)] = 0
        scores.append(s), labels.append(l), groups.append(np.full(size, g))
    return (np.concatenate(scores), np.concatenate(labels),
            np.concatenate(groups))


def test_gauc_matches_sklearn(ranking_data):
    s, l, g = ranking_data
    pool = MetricPool.parse(["GAUC"])
    got = pool(s, l, g)["GAUC"]
    want = naive_group_metric(s, l, g, naive_auc)
    assert got == pytest.approx(want, abs=1e-10)


def test_mrr_nonstandard(ranking_data):
    s, l, g = ranking_data
    got = MetricPool.parse(["MRR"])(s, l, g)["MRR"]
    want = naive_group_metric(s, l, g, naive_mrr)
    assert got == pytest.approx(want, abs=1e-10)


def test_mrr0(ranking_data):
    s, l, g = ranking_data
    got = MetricPool.parse(["MRR0"])(s, l, g)["MRR0"]
    want = naive_group_metric(s, l, g, naive_mrr0)
    assert got == pytest.approx(want, abs=1e-10)


@pytest.mark.parametrize("k", [1, 5, 10])
def test_ndcg_matches_sklearn(ranking_data, k):
    s, l, g = ranking_data
    got = MetricPool.parse([f"NDCG@{k}"])(s, l, g)[f"NDCG@{k}"]
    want = naive_group_metric(s, l, g, lambda a, b: naive_ndcg(a, b, k))
    assert got == pytest.approx(want, abs=1e-10)


def test_hit_recall(ranking_data):
    s, l, g = ranking_data
    res = MetricPool.parse(["HitRatio@5", "Recall@5"])(s, l, g)

    def naive_hit(a, b):
        order = np.argsort(-a, kind="stable")
        return float(b[order][:5].sum() > 0)

    def naive_recall(a, b):
        order = np.argsort(-a, kind="stable")
        return b[order][:5].sum() / b.sum()

    assert res["HitRatio@5"] == pytest.approx(
        naive_group_metric(s, l, g, naive_hit))
    assert res["Recall@5"] == pytest.approx(
        naive_group_metric(s, l, g, naive_recall))


def test_pointwise_auc_logloss(ranking_data):
    from sklearn.metrics import roc_auc_score, log_loss
    s, l, g = ranking_data
    p = 1 / (1 + np.exp(-s))
    res = MetricPool.parse(["AUC", "LogLoss"])(p, l, g)
    assert res["AUC"] == pytest.approx(roc_auc_score(l, p))
    assert res["LogLoss"] == pytest.approx(log_loss(l, p))


def test_ties_average_rank():
    # tied scores inside a group: GAUC must use average ranks like sklearn
    from sklearn.metrics import roc_auc_score
    s = np.array([0.5, 0.5, 0.5, 0.2, 0.9])
    l = np.array([1.0, 0, 1, 0, 1])
    g = np.zeros(5)
    got = MetricPool.parse(["GAUC"])(s, l, g)["GAUC"]
    assert got == pytest.approx(roc_auc_score(l, s))


def test_is_minimize():
    assert MetricPool.is_minimize("LogLoss") is True
    assert MetricPool.is_minimize("GAUC") is False
    assert MetricPool.is_minimize("NDCG@10") is False
