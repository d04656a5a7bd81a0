"""Shared evaluation driver: full-forward or cached fast-eval scoring.

Parity: reference base_lego.py:349-427 (base_evaluate/evaluate) + the
fast-eval cache flow of §3.3 (tester.py:54-77). Scores for padded tail rows
are dropped via the batch validity mask before metric computation.
"""
from typing import Dict, Optional

import jax
import numpy as np

from legommenders_tpu.data.pipeline import EvalBatcher, Prefetcher
from legommenders_tpu.runtime.metrics import MetricPool
from legommenders_tpu.runtime.steps import make_eval_step
from legommenders_tpu.utils.timer import Timer


def collect_scores(step_fn, params, batcher: EvalBatcher,
                   to_device=None, latency_timer: Optional[Timer] = None,
                   max_batches: int = 0, needed_keys=None):
    """Run `step_fn(params, batch) -> (B, 1) scores` over a batcher; returns
    (scores, labels, groups) for valid rows. `needed_keys` limits what is
    shipped to the device (the cached fast-eval path only reads
    user_id/candidates — skipping the history matrix halves eval H2D)."""
    import jax.numpy as jnp

    device_scores, valids, labels_all, groups_all = [], [], [], []
    n = 0
    prefetcher = Prefetcher(batcher.epoch())
    for batch in prefetcher:
        jb = {k: jnp.asarray(v) for k, v in batch.items()
              if k not in ("label", "group", "valid")
              and (needed_keys is None or k in needed_keys)}
        if latency_timer is not None:
            latency_timer.start("forward")
            out = jax.block_until_ready(step_fn(params, jb))
            latency_timer.stop("forward")
        else:
            out = step_fn(params, jb)
        # keep scores on device; one host transfer at the end (the
        # per-batch np.asarray sync dominated large eval sweeps)
        device_scores.append(out.reshape(len(batch["valid"]), -1)[:, 0])
        valids.append(batch["valid"] > 0)
        labels_all.append(batch["label"])
        groups_all.append(batch["group"])
        n += 1
        if max_batches and n >= max_batches:
            prefetcher.close()
            break
    scores = np.asarray(jnp.concatenate(device_scores))
    valid = np.concatenate(valids)
    return (scores[valid],
            np.concatenate(labels_all)[valid],
            np.concatenate(groups_all)[valid])


class Evaluator:
    def __init__(self, model, item_contents, data, batch_size: int,
                 metrics, cache=None):
        self.model = model
        self.item_contents = item_contents
        self.data = data
        self.batch_size = batch_size
        self.pool = MetricPool.parse(list(metrics))
        self.cache = cache
        self._full_step = None
        self._cached_step = None

    def _get_full_step(self):
        if self._full_step is None:
            self._full_step = make_eval_step(self.model, self.item_contents)
        return self._full_step

    def _get_cached_step(self):
        if self._cached_step is None:
            self._cached_step = self.cache.make_cached_eval_step()
        return self._cached_step

    def evaluate(self, params, phase: str,
                 latency_timer: Optional[Timer] = None,
                 use_cache: Optional[bool] = None,
                 max_batches: int = 0) -> Dict[str, float]:
        batcher = EvalBatcher(self.data, phase, self.batch_size)
        use_cache = (self.cache is not None) if use_cache is None else use_cache
        needed_keys = None
        if use_cache:
            self.cache.cache(params)
            cached = self._get_cached_step()
            item_repr, user_repr = self.cache.item_repr, self.cache.user_repr
            step = lambda p, b: cached(p, item_repr, user_repr, b)
            needed_keys = ("user_id", "candidates")
        else:
            step = self._get_full_step()
        scores, labels, groups = collect_scores(
            step, params, batcher, latency_timer=latency_timer,
            max_batches=max_batches, needed_keys=needed_keys)
        return self.pool(scores, labels, groups)
