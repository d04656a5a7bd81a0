"""Device-resident group-metric engine (TPU lax.sort + segment ops).

Parity: EXACT semantics of the numpy engine in runtime/metrics.py (itself
pinned to reference utils/metrics.py:39-391, incl. the repo's non-standard
MRR and sklearn-style average-rank tie handling in per-group AUC) — the
numpy engine stays the oracle in tests/test_device_metrics.py.

Why: on the cached fast-eval path the (n,) score vector is ALREADY in HBM
when metrics run; the host pool cost 0.53 s of the 1.54 s golden-run eval
(lexsort + reduceats at 1.75M rows) plus a 21 MB D2H. Here the whole pool
is ONE jitted program returning a handful of scalars.

Kernel-count discipline (measured on the v5e through the axon tunnel:
~27 ms fixed per-call overhead, ~9 ms for the 3-operand 2-key sort, but
~17 ms for EVERY n-segment scatter): the engine uses exactly ONE
segment_sum — all per-group sums ride as columns of a single (n, m)
stacked scatter — while group starts/ends come from cummax/cummin over
the sorted order, AUC tie-run totals from exact integer cumsums +
boundary gathers, and MRR0's first-positive-rank from the in-group
positive-count cumsum (positions/ranks/counts are all < 2^24, so f32
integer arithmetic is exact; no f32 cumsum of REAL values is ever
differenced, which would cancel catastrophically at 1.75M rows).

Accuracy: per-group values carry ~1e-7 relative error vs the f64 oracle;
the final group means use a two-pass (mean + correction) reduction so the
f32 mean over ~50k groups stays at oracle precision.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# metric names the engine can compute; anything else falls back to host
DEVICE_SUPPORTED = {"GAUC", "MRR", "MRR0", "LRAP", "NDCG", "HitRatio",
                    "Recall"}


def _gmean(vals, valid):
    """Masked mean with a first-order correction pass (f32-safe)."""
    cnt = valid.sum().astype(jnp.float32)
    v = jnp.where(valid, vals, 0.0)
    m0 = jnp.where(cnt > 0, v.sum() / jnp.maximum(cnt, 1.0), 0.0)
    corr = jnp.where(valid, vals - m0, 0.0).sum()
    return jnp.where(cnt > 0, m0 + corr / jnp.maximum(cnt, 1.0), 0.0)


@functools.partial(jax.jit, static_argnames=("specs", "max_groups"))
def _compute(scores, labels, groups, specs: Tuple[Tuple[str, int, str], ...],
             max_groups: int = 0):
    """specs: ((metric_name, k, output_key), ...) — static per phase.
    max_groups: static upper bound on the DISTINCT group count (0 = use
    n). The stacked scatter's cost is OUTPUT-size bound on the v5e
    (126 ms at width n vs 28 ms at width 65k for the same 1.75M updates),
    so callers that know the group count host-side (the evaluator does,
    once per phase) shrink the dominant kernel ~4x. A bound that is too
    SMALL would silently drop updates — callers must pass an exact
    distinct-count or a true upper bound."""
    n = scores.shape[0]
    scores = scores.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    groups = groups.astype(jnp.int32)

    # group-major, score-descending lexicographic sort (stable — matches
    # the host engine's np.lexsort tie order)
    gid, neg_s, lab = jax.lax.sort((groups, -scores, labels), num_keys=2)
    s = -neg_s
    idx = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate(
        [jnp.ones((1,), bool), gid[1:] != gid[:-1]])

    # per-element group start/end offsets WITHOUT scatters: starts are a
    # running max of boundary positions, ends the reverse running min
    start = jax.lax.cummax(jnp.where(change, idx, 0))
    change_end = jnp.concatenate([change[1:], jnp.ones((1,), bool)])
    end = jax.lax.cummin(jnp.where(change_end, idx, n - 1), reverse=True)

    pos = (idx - start).astype(jnp.float32)
    rank = pos + 1.0
    size = (end - start + 1).astype(jnp.float32)

    # in-group inclusive positive count (exact: f32 cumsum of 0/1 stays
    # integral below 2^24) — LRAP precision and MRR0 first-positive marker
    inc_lab = jnp.cumsum(lab)
    ex_lab = inc_lab - lab
    cum_in = inc_lab - ex_lab[start]

    names = {name for name, _, _ in specs}
    cols = {}  # name -> per-element summand for the ONE stacked segsum

    cols["lab"] = lab
    if "MRR" in names:
        cols["mrr"] = lab / rank
    if "MRR0" in names:
        # exactly one element per group has (positive AND cum_in == 1):
        # the first positive in score order — its 1/rank IS the group MRR0
        cols["mrr0"] = jnp.where((lab > 0) & (cum_in == 1.0),
                                 1.0 / rank, 0.0)
    if "LRAP" in names:
        cols["lrap"] = jnp.where(lab > 0, cum_in / rank, 0.0)
    if "NDCG" in names:
        disc = 1.0 / jnp.log2(rank + 1.0)
    for name, k, _key in specs:
        if name == "NDCG":
            cols[f"dcg{k}"] = lab * disc * (rank <= k)
        elif name in ("HitRatio", "Recall"):
            cols.setdefault(f"hits{k}", lab * (rank <= k))

    # per-element group positive total, exact and scatter-free:
    # inclusive cumsum gathered at the group end minus the exclusive
    # cumsum at the group start
    pos_cnt = inc_lab[end] - ex_lab[start]
    neg_cnt = size - pos_cnt
    safe_pos = jnp.maximum(pos_cnt, 1.0)

    if "NDCG" in names:
        for name, k, _key in specs:
            if name == "NDCG":
                cols[f"idcg{k}"] = disc * (rank <= jnp.minimum(
                    pos_cnt, float(k)))

    if "GAUC" in names:
        # average ascending rank over (group, score) tie runs == sklearn.
        # Run totals via INT32 cumsums + run-boundary gathers: the global
        # cumsum of ascending positions reaches ~n*avg_group_size/2 which
        # overflows f32's exact-integer range (2^24) at MIND scale, but
        # int32 keeps it exact. asc = size-1-pos simplifies to end - idx.
        asc_i = end - idx
        same = jnp.concatenate(
            [jnp.zeros((1,), bool),
             (gid[1:] == gid[:-1]) & (s[1:] == s[:-1])])
        rstart = jax.lax.cummax(jnp.where(~same, idx, 0))
        rchange_end = jnp.concatenate([~same[1:], jnp.ones((1,), bool)])
        rend = jax.lax.cummin(jnp.where(rchange_end, idx, n - 1),
                              reverse=True)
        inc_asc = jnp.cumsum(asc_i)
        ex_asc = inc_asc - asc_i
        run_sum = (inc_asc[rend] - ex_asc[rstart]).astype(jnp.float32)
        run_cnt = (rend - rstart + 1).astype(jnp.float32)
        avg_rank = run_sum / run_cnt + 1.0
        cols["spr"] = avg_rank * lab
        cols["ones"] = jnp.ones_like(lab)   # group sizes for neg counts

    # ---- the ONE stacked segment scatter --------------------------------
    seg = jnp.cumsum(change.astype(jnp.int32)) - 1        # dense 0..G-1
    num_groups = change.sum(dtype=jnp.int32)
    ns = int(max_groups) if max_groups else n
    gvalid = jnp.arange(ns, dtype=jnp.int32) < num_groups  # per-group mask
    keys = list(cols)
    stacked = jnp.stack([cols[c] for c in keys], axis=1)   # (n, m)
    seg_tot = jax.ops.segment_sum(stacked, seg, num_segments=ns)
    tot = {c: seg_tot[:, i] for i, c in enumerate(keys)}

    # all per-group values below are indexed by dense segment id (the
    # scatter output), NOT by sorted-element position
    pos_g = tot["lab"]
    out = {}

    for name, k, key in specs:
        if name == "GAUC":
            size_g = tot["ones"]
            neg_g = size_g - pos_g
            auc_g = (tot["spr"] - pos_g * (pos_g + 1.0) / 2.0) \
                / jnp.maximum(pos_g * neg_g, 1.0)
            out[key] = _gmean(auc_g, gvalid & (pos_g > 0) & (neg_g > 0))
        elif name == "MRR":
            out[key] = _gmean(tot["mrr"] / jnp.maximum(pos_g, 1.0),
                              gvalid & (pos_g > 0))
        elif name == "MRR0":
            out[key] = _gmean(tot["mrr0"], gvalid)
        elif name == "LRAP":
            out[key] = _gmean(
                jnp.where(pos_g > 0,
                          tot["lrap"] / jnp.maximum(pos_g, 1.0), 1.0),
                gvalid)
        elif name == "NDCG":
            idcg = tot[f"idcg{k}"]
            val = jnp.where(idcg > 0,
                            tot[f"dcg{k}"] / jnp.maximum(idcg, 1e-30), 0.0)
            out[key] = _gmean(val, gvalid)
        elif name == "HitRatio":
            out[key] = _gmean((tot[f"hits{k}"] > 0).astype(jnp.float32),
                              gvalid)
        elif name == "Recall":
            out[key] = _gmean(tot[f"hits{k}"] / jnp.maximum(pos_g, 1.0),
                              gvalid & (pos_g > 0))
        else:  # pragma: no cover — guarded by DEVICE_SUPPORTED
            raise ValueError(f"unsupported device metric {name}")
    return out


def compute_device(metrics, scores, labels, groups, max_groups: int = 0):
    """Run the engine for MetricPool `metrics` on device arrays; returns
    {str(metric): float} after ONE host sync of scalar outputs."""
    specs = tuple((m.name, int(getattr(m, "n", 0) or 0), str(m))
                  for m in metrics)
    vals = jax.device_get(_compute(scores, labels, groups, specs,
                                   max_groups))
    return {key: float(vals[key]) for _, _, key in specs}
