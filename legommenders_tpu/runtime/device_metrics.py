"""Device-resident group-metric engine (TPU lax.sort + segment ops).

Parity: EXACT semantics of the numpy engine in runtime/metrics.py (itself
pinned to reference utils/metrics.py:39-391, incl. the repo's non-standard
MRR and sklearn-style average-rank tie handling in per-group AUC) — the
numpy engine stays the oracle in tests/test_device_metrics.py.

Why: on the cached fast-eval path the (n,) score vector is ALREADY in HBM
when metrics run; the host pool cost 0.53 s of the 1.54 s golden-run eval
(lexsort + reduceats at 1.75M rows). Here the whole pool is ONE jitted
program — a 2-key lexicographic `lax.sort` (group-major, score-desc),
`segment_sum/min` keyed by the dense group index, and scalar outputs — so
the host transfer is a handful of floats instead of the 21 MB
scores+labels+groups round trip.

Accuracy: ranks/counts are exact in f32 (all < 2^24); per-group values
carry ~1e-7 relative error vs the f64 oracle; the final group means use a
two-pass (mean + correction) reduction so the f32 mean over ~50k groups
stays at oracle precision instead of drifting sqrt(G)*eps.
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


@functools.partial(jax.jit, static_argnames=("specs",))
def _compute(scores, labels, groups, specs: Tuple[Tuple[str, int, str], ...]):
    """specs: ((metric_name, k, output_key), ...) — static per phase."""
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
    seg = jnp.cumsum(change.astype(jnp.int32)) - 1        # dense 0..G-1
    num_groups = change.sum(dtype=jnp.int32)
    gvalid = idx < num_groups                             # per-group mask

    def segsum(v):
        return jax.ops.segment_sum(v, seg, num_segments=n)

    starts = jax.ops.segment_min(idx, seg, num_segments=n)[seg]
    pos = (idx - starts).astype(jnp.float32)
    rank = pos + 1.0
    ones = jnp.ones_like(lab)
    size_g = segsum(ones)
    pos_g = segsum(lab)
    neg_g = size_g - pos_g
    safe_pos = jnp.maximum(pos_g, 1.0)

    names = {name for name, _, _ in specs}
    out = {}

    if "GAUC" in names:
        # average ascending rank over (group, score) tie runs == sklearn
        asc = (size_g[seg] - 1.0) - pos
        same = jnp.concatenate(
            [jnp.zeros((1,), bool),
             (gid[1:] == gid[:-1]) & (s[1:] == s[:-1])])
        run = jnp.cumsum((~same).astype(jnp.int32)) - 1
        run_sum = jax.ops.segment_sum(asc, run, num_segments=n)[run]
        run_cnt = jax.ops.segment_sum(ones, run, num_segments=n)[run]
        avg_rank = run_sum / run_cnt + 1.0
        spr = segsum(avg_rank * lab)
        auc_g = (spr - pos_g * (pos_g + 1.0) / 2.0) \
            / jnp.maximum(pos_g * neg_g, 1.0)

    if "MRR0" in names:
        masked_rank = jnp.where(lab > 0, rank, jnp.inf)
        first = jax.ops.segment_min(masked_rank, seg, num_segments=n)
        mrr0_g = jnp.where(jnp.isfinite(first), 1.0 / first, 0.0)

    if "LRAP" in names:
        cum = jnp.cumsum(lab)
        cum_shift = jnp.concatenate([jnp.zeros((1,), jnp.float32), cum[:-1]])
        cum_in = cum - cum_shift[starts]
        prec = jnp.where(lab > 0, cum_in / rank, 0.0)
        lrap_g = jnp.where(pos_g > 0, segsum(prec) / safe_pos, 1.0)

    for name, k, key in specs:
        if name == "GAUC":
            out[key] = _gmean(auc_g, gvalid & (pos_g > 0) & (neg_g > 0))
        elif name == "MRR":
            out[key] = _gmean(segsum(lab / rank) / safe_pos,
                              gvalid & (pos_g > 0))
        elif name == "MRR0":
            out[key] = _gmean(mrr0_g, gvalid)
        elif name == "LRAP":
            out[key] = _gmean(lrap_g, gvalid)
        elif name == "NDCG":
            disc = 1.0 / jnp.log2(rank + 1.0)
            take = rank <= k
            dcg = segsum(lab * disc * take)
            ideal_take = rank <= jnp.minimum(pos_g[seg], float(k))
            idcg = segsum(disc * ideal_take)
            val = jnp.where(idcg > 0, dcg / jnp.maximum(idcg, 1e-30), 0.0)
            out[key] = _gmean(val, gvalid)
        elif name == "HitRatio":
            hits = segsum(lab * (rank <= k))
            out[key] = _gmean((hits > 0).astype(jnp.float32), gvalid)
        elif name == "Recall":
            hits = segsum(lab * (rank <= k))
            out[key] = _gmean(hits / safe_pos, gvalid & (pos_g > 0))
        else:  # pragma: no cover — guarded by DEVICE_SUPPORTED
            raise ValueError(f"unsupported device metric {name}")
    return out


def compute_device(metrics, scores, labels, groups):
    """Run the engine for MetricPool `metrics` on device arrays; returns
    {str(metric): float} after ONE host sync of scalar outputs."""
    specs = tuple((m.name, int(getattr(m, "n", 0) or 0), str(m))
                  for m in metrics)
    vals = jax.device_get(_compute(scores, labels, groups, specs))
    return {key: float(vals[key]) for _, _, key in specs}
