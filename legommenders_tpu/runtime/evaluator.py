"""Shared evaluation driver: device-resident cached scoring or full-forward.

Parity: reference base_lego.py:349-427 (base_evaluate/evaluate) + the
fast-eval cache flow of §3.3 (tester.py:54-77). Scores for padded tail rows
are dropped before metric computation.

TPU redesign of the hot loop: the reference iterates host mini-batches and
round-trips scores per batch (base_lego.py:349-398). Here the WHOLE phase's
(user, candidate) index columns live in HBM and one jitted lax.scan scores
every interaction page on device — via repr-cache gathers when the model
caches (score_phase_device), or full forwards with in-jit history gathers
when it cannot (score_phase_device_full, round 5). When every metric is
device-supported the scores never leave HBM (runtime/device_metrics.py);
otherwise a single (n,) transfer feeds the numpy pool. The host-batched
`collect_scores` path remains only for per-batch latency measurement
(tester.py --latency) and max_batches-truncated sweeps.
"""
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from legommenders_tpu.data.pipeline import EvalBatcher, Prefetcher
from legommenders_tpu.runtime.metrics import MetricPool
from legommenders_tpu.runtime.steps import make_eval_step
from legommenders_tpu.utils.timer import Timer


def collect_scores(step_fn, params, batcher: EvalBatcher,
                   to_device=None, latency_timer: Optional[Timer] = None,
                   max_batches: int = 0, needed_keys=None, mesh=None):
    """Run `step_fn(params, batch) -> (B, 1) scores` over a batcher; returns
    (scores, labels, groups) for valid rows. `needed_keys` limits what is
    shipped to the device (the cached fast-eval path only reads
    user_id/candidates — skipping the history matrix halves eval H2D).
    With a mesh, batch rows are placed dp-SHARDED (each device computes
    1/n_dp of every forward; GSPMD all-gathers only the tiny score
    column); non-dp-divisible batches fall back to replicated."""
    place = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from legommenders_tpu.parallel.mesh import DP_AXIS
        n_dp = mesh.shape.get("dp", 1)
        bs = batcher.batch_size
        spec = P(DP_AXIS) if n_dp > 1 and bs % n_dp == 0 else P()
        sh = NamedSharding(mesh, spec)
        place = lambda v: jax.device_put(jnp.asarray(v), sh)

    device_scores, valids, labels_all, groups_all = [], [], [], []
    n = 0
    prefetcher = Prefetcher(batcher.epoch())
    for batch in prefetcher:
        jb = {k: place(v) for k, v in batch.items()
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
    scores = np.concatenate([np.asarray(s) for s in device_scores])
    valid = np.concatenate(valids)
    return (scores[valid],
            np.concatenate(labels_all)[valid],
            np.concatenate(groups_all)[valid])


class _DevicePhase:
    """One eval phase's interaction columns, device-resident and paged:
    (k, page) index matrices for the scan, labels/groups on host for the
    metric pool."""

    def __init__(self, data, phase: str, page: int, mesh=None):
        cm = data.cm
        store = data.inters[phase]
        users = store[cm.user_col].astype(np.int64)
        items = store[cm.item_col].astype(np.int64)
        self.labels = store[cm.label_col].astype(np.float32)
        self.groups = (store[cm.group_col].astype(np.int64)
                       if cm.group_col in store else users)
        self.n = len(users)
        # device copies for the on-device metric pool (placed once; group
        # ids are processor-assigned row-scale ints — guard the int32 cast
        # anyway so an exotic hash-id dataset fails loudly, not wrongly)
        assert self.groups.size == 0 or (
            self.groups.min() >= np.iinfo(np.int32).min
            and self.groups.max() <= np.iinfo(np.int32).max), \
            "group ids exceed int32 — device metric pool needs dense ids"
        place = jnp.asarray
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            place = lambda v: jax.device_put(jnp.asarray(v), repl)
        self.labels_d = place(self.labels)
        self.groups_d = place(self.groups.astype(np.int32))
        # exact distinct-group count (one host pass at phase setup): the
        # device metric engine's scatter is output-size bound, so this
        # shrinks its dominant kernel ~4x at MIND scale
        self.num_groups = int(len(np.unique(self.groups)))
        page = min(page, max(8, self.n))
        if mesh is not None:
            # page rows shard over dp — width must divide evenly
            n_dp = mesh.shape.get("dp", 1)
            page = -(-page // n_dp) * n_dp
        k = -(-self.n // page)
        pad = k * page - self.n
        u = np.pad(users, (0, pad)).astype(np.int32).reshape(k, page)
        i = np.pad(items, (0, pad)).astype(np.int32).reshape(k, page)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from legommenders_tpu.parallel.mesh import DP_AXIS
            sh = NamedSharding(mesh, P(None, DP_AXIS))
            self.u_pages = jax.device_put(jnp.asarray(u), sh)
            self.i_pages = jax.device_put(jnp.asarray(i), sh)
        else:
            self.u_pages = jnp.asarray(u)
            self.i_pages = jnp.asarray(i)


class Evaluator:
    # rows scored per scan step of the device-resident path; one compile,
    # ~7 steps for the 1.75M-row MIND test sweep
    DEVICE_EVAL_PAGE = 1 << 18

    def __init__(self, model, item_contents, data, batch_size: int,
                 metrics, cache=None, mesh=None):
        self.model = model
        self.item_contents = item_contents
        self.data = data
        self.batch_size = batch_size
        self.pool = MetricPool.parse(list(metrics))
        self.cache = cache
        self.mesh = mesh
        self._full_step = None
        self._cached_step = None
        self._device_phases: Dict[str, _DevicePhase] = {}
        self._scorer = None
        self._full_phases: Dict[str, _DevicePhase] = {}
        self._full_scorer = None
        self._full_substrate = None
        self._fused_pool_fns: Dict = {}

    def _get_full_step(self):
        if self._full_step is None:
            self._full_step = make_eval_step(self.model, self.item_contents)
        return self._full_step

    def _get_cached_step(self):
        if self._cached_step is None:
            self._cached_step = self.cache.make_cached_eval_step()
        return self._cached_step

    # ------------------------------------------------------------------ #
    # device-resident cached scoring                                     #
    # ------------------------------------------------------------------ #
    def _get_device_phase(self, phase: str) -> _DevicePhase:
        if phase not in self._device_phases:
            self._device_phases[phase] = _DevicePhase(
                self.data, phase, self.DEVICE_EVAL_PAGE, self.mesh)
        return self._device_phases[phase]

    def _get_scorer(self):
        if self._scorer is None:
            model = self.model

            def score_all(params, item_repr, user_repr, u_pages, i_pages):
                nu = user_repr.shape[0]
                ni = item_repr.shape[0]

                def body(carry, uv):
                    u_ids, i_ids = uv
                    u = jnp.take(user_repr,
                                 jnp.clip(u_ids, 0, nu - 1), axis=0)
                    i = jnp.take(item_repr,
                                 jnp.clip(i_ids, 0, ni - 1),
                                 axis=0)[:, None, :]
                    s = model.apply(params, u, i,
                                    method=model.score_cached)
                    return carry, s.reshape(-1)

                _, scores = jax.lax.scan(body, 0, (u_pages, i_pages))
                return scores.reshape(-1)

            if self.mesh is not None:
                # replicate the score vector so np.asarray works on every
                # process of a multi-host mesh (and the single D2H below
                # stays one transfer)
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._scorer = jax.jit(
                    score_all,
                    out_shardings=NamedSharding(self.mesh, P()))
            else:
                self._scorer = jax.jit(score_all)
        return self._scorer

    def _metric_specs(self):
        return tuple((m.name, int(getattr(m, "n", 0) or 0), str(m))
                     for m in self.pool.metrics)

    def _pooled(self, kind: str, phase: str, scorer, n: int,
                max_groups: int = 0):
        """Score-then-metrics as ONE jitted dispatch (the axon tunnel
        charges ~27 ms fixed per call; two calls were a fifth of the
        steady-state eval). `scorer` is the already-jitted phase scorer —
        calling it inside jit inlines the scan. `max_groups` bounds the
        metric engine's scatter width (exact distinct count from the
        phase setup)."""
        key = (kind, phase)
        if key not in self._fused_pool_fns:
            from legommenders_tpu.runtime.device_metrics import _compute
            specs = self._metric_specs()

            def fused(params, *args):
                labels, groups = args[-2], args[-1]
                scores = scorer(params, *args[:-2])[:n]
                return _compute(scores, labels, groups, specs, max_groups)

            self._fused_pool_fns[key] = jax.jit(fused)
        return self._fused_pool_fns[key]

    def score_phase_device(self, params, phase: str) -> np.ndarray:
        """Cached fast-eval over a whole phase with zero per-batch host
        traffic; returns the (n,) score vector (one D2H transfer)."""
        assert self.cache is not None and self.cache.active
        ph = self._get_device_phase(phase)
        scorer = self._get_scorer()
        scores = scorer(params, self.cache.item_repr, self.cache.user_repr,
                        ph.u_pages, ph.i_pages)
        return np.asarray(scores)[:ph.n]

    # ------------------------------------------------------------------ #
    # device-resident FULL-FORWARD scoring (uncached models)             #
    # ------------------------------------------------------------------ #
    def _get_full_phase(self, phase: str) -> _DevicePhase:
        # full forwards run the item op per row — page at the eval batch
        # size (same per-step compute as the host-batched path), not the
        # gather-only DEVICE_EVAL_PAGE
        if phase not in self._full_phases:
            self._full_phases[phase] = _DevicePhase(
                self.data, phase, self.batch_size, self.mesh)
        return self._full_phases[phase]

    def _get_full_scorer(self):
        """jitted whole-phase scorer for models WITHOUT repr caches
        (allow_caching=False — MINER/Poly/DIN — or use_fast_eval off):
        one lax.scan whose body synthesizes the standard batch schema by
        device gathers (history/mask/user-extra rows) and runs the full
        model forward. Replaces the reference's host mini-batch loop
        (base_lego.py:349-398) that round-tripped every batch; under a
        mesh the page rows ride dp-sharded (_DevicePhase pads pages to the
        dp multiple)."""
        if self._full_scorer is None:
            from legommenders_tpu.data.pipeline import _user_extra_cols
            from legommenders_tpu.data.token_store import UNSET

            place = jnp.asarray
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                repl = NamedSharding(self.mesh, P())
                place = lambda v: jax.device_put(jnp.asarray(v), repl)
            hist = self.data.history_matrix()
            substrate = {
                "hist": place(np.where(hist == UNSET, 0,
                                       hist).astype(np.int32)),
                "mask": place((hist != UNSET).astype(np.int32)),
                "extra": {c: place(np.where(m == UNSET, 0,
                                            m).astype(np.int32))
                          for c, m in _user_extra_cols(self.data).items()},
                "contents": {c: place(np.asarray(a))
                             for c, a in self.item_contents.items()},
            }
            self._full_substrate = substrate
            model = self.model

            def score_all(params, sub, u_pages, i_pages):
                def body(carry, uv):
                    u, i = uv
                    batch = {"history": jnp.take(sub["hist"], u, axis=0),
                             "mask": jnp.take(sub["mask"], u, axis=0),
                             "candidates": i[:, None],
                             "user_id": u}
                    for c, m in sub["extra"].items():
                        batch[c] = jnp.take(m, u, axis=0)
                    s = model.apply(params, batch, sub["contents"],
                                    training=False)
                    return carry, s.reshape(-1)

                _, scores = jax.lax.scan(body, 0, (u_pages, i_pages))
                return scores.reshape(-1)

            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self._full_scorer = jax.jit(
                    score_all,
                    out_shardings=NamedSharding(self.mesh, P()))
            else:
                self._full_scorer = jax.jit(score_all)
        return self._full_scorer

    def score_phase_device_full(self, params, phase: str):
        """(n,) DEVICE scores for a whole phase via full forwards."""
        ph = self._get_full_phase(phase)
        scorer = self._get_full_scorer()
        scores = scorer(params, self._full_substrate,
                        ph.u_pages, ph.i_pages)
        return scores[:ph.n]

    # ------------------------------------------------------------------ #
    def evaluate(self, params, phase: str,
                 latency_timer: Optional[Timer] = None,
                 use_cache: Optional[bool] = None,
                 max_batches: int = 0) -> Dict[str, float]:
        # pipeline staging is a training feature: eval batch/page sizes are
        # arbitrary and the sharded cache builds run inside their own
        # shard_map, so the ambient PP mesh is deactivated for the whole
        # eval trace (same params, serial layer stack — exact math)
        from legommenders_tpu.parallel.mesh import no_pipeline
        with no_pipeline():
            return self._evaluate(params, phase, latency_timer,
                                  use_cache, max_batches)

    def _evaluate(self, params, phase: str,
                  latency_timer: Optional[Timer] = None,
                  use_cache: Optional[bool] = None,
                  max_batches: int = 0) -> Dict[str, float]:
        use_cache = (self.cache is not None) if use_cache is None else use_cache
        if use_cache:
            self.cache.cache(params)
            if latency_timer is None and not max_batches:
                # hot path: whole-phase device scoring; when every metric
                # is device-supported the scores NEVER leave HBM — the
                # jitted metric pool returns a handful of scalars
                ph = self._get_device_phase(phase)
                if self.pool.supports_device:
                    fused = self._pooled("cached", phase,
                                         self._get_scorer(), ph.n,
                                         ph.num_groups)
                    vals = jax.device_get(fused(
                        params, self.cache.item_repr, self.cache.user_repr,
                        ph.u_pages, ph.i_pages, ph.labels_d, ph.groups_d))
                    return {str(m): float(vals[str(m)])
                            for m in self.pool.metrics}
                scores = self.score_phase_device(params, phase)
                return self.pool(scores, ph.labels, ph.groups)
            cached = self._get_cached_step()
            item_repr, user_repr = self.cache.item_repr, self.cache.user_repr
            step = lambda p, b: cached(p, item_repr, user_repr, b)
            needed_keys = ("user_id", "candidates")
        else:
            if latency_timer is None and not max_batches:
                # uncached hot path: whole-phase full-forward scan on
                # device — no host batch loop, one D2H (or none, when the
                # metric pool is device-supported too)
                ph = self._get_full_phase(phase)
                if self.pool.supports_device:
                    fused = self._pooled("full", phase,
                                         self._get_full_scorer(), ph.n,
                                         ph.num_groups)
                    vals = jax.device_get(fused(
                        params, self._full_substrate, ph.u_pages,
                        ph.i_pages, ph.labels_d, ph.groups_d))
                    return {str(m): float(vals[str(m)])
                            for m in self.pool.metrics}
                scores_dev = self.score_phase_device_full(params, phase)
                return self.pool(np.asarray(scores_dev), ph.labels,
                                 ph.groups)
            step = self._get_full_step()
            needed_keys = None
        batcher = EvalBatcher(self.data, phase, self.batch_size)
        scores, labels, groups = collect_scores(
            step, params, batcher, latency_timer=latency_timer,
            max_batches=max_batches, needed_keys=needed_keys,
            mesh=self.mesh)
        return self.pool(scores, labels, groups)
