"""Trainer — full train→dev→test loop.

Parity: reference trainer.py:74-322 — epoch loop with gradient
accumulation, check_interval loss logging, `epoch_batch` truncation, dev
eval per epoch (full metric or `simple_dev` loss-only), early stopping via
Monitor, save-best / reload-best, final test; two-LR-group optimizer (lower
LR for pretrained item encoder params, base_lego.py:175-209) and linear
warmup scheduler (:211-223).
"""
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from legommenders_tpu.data.pipeline import Prefetcher
from legommenders_tpu.runtime.checkpoint import load_auto, save_auto
from legommenders_tpu.runtime.manager import Manager
from legommenders_tpu.runtime.metrics import MetricPool
from legommenders_tpu.runtime.steps import (
    init_params, make_loss_fn, make_train_step,
)
from legommenders_tpu.utils.logging import get_logger
from legommenders_tpu.utils.meaner import Meaner
from legommenders_tpu.utils.monitor import Monitor, Signal


def linear_warmup(lr: float, n_warmup: int) -> optax.Schedule:
    if n_warmup <= 0:
        return optax.constant_schedule(lr)
    return optax.linear_schedule(0.0, lr, n_warmup)


class Trainer:
    def __init__(self, manager: Manager, seed: int = 2023,
                 ckpt_path: Optional[str] = None, log=None,
                 session: Optional[str] = None, command: str = "",
                 signature: Optional[str] = None):
        self.m = manager
        self.seed = seed
        self.ckpt_path = ckpt_path
        self.log = log or get_logger("trainer")
        # live experiment sync (reference trainer.py:88-121, 260-274):
        # --session connects to a lego-server record, sanity-checks
        # signature/seed/duplicate-run, then registers this pid
        self.server = None
        self.session = session
        if session:
            from legommenders_tpu.utils.server import (
                ExperimentBody, Server,
            )
            self.server = Server.auto_auth()
            if self.server.active:
                resp = self.server.get_experiment_info(session)
                if resp.ok:
                    exp = ExperimentBody(resp.body)
                    if signature and exp.signature != signature:
                        raise SystemExit(
                            f"signature mismatch: local {signature} != "
                            f"server {exp.signature}")
                    if exp.seed is not None and int(exp.seed) != seed:
                        raise SystemExit(
                            f"seed mismatch: local {seed} != "
                            f"server {exp.seed}")
                    if exp.is_completed:
                        raise SystemExit(
                            f"experiment {session} is already completed")
                    self.server.register_experiment(session)
                else:
                    self.log.warning(
                        f"lego-server lookup for session {session} failed "
                        f"({resp.msg}); continuing offline")
                    self.server = None

        policy = self.m.policy
        lr = float(policy["lr"])
        schedule = linear_warmup(lr, int(policy["n_warmup"] or 0))
        base_opt = optax.adam(schedule)
        item_lr = policy.get("item_lr")
        if item_lr:
            # dual LR: PRETRAINED item-op params at item_lr — the operator
            # declares its pretrained subtrees (LM ops: ["lm"]), matching
            # the reference's get_pretrained_parameter_names signal
            # (base_lego.py:175-209, once_operator.py:153-154)
            item_sched = linear_warmup(float(item_lr),
                                       int(policy["n_warmup"] or 0))
            signals = []
            item_op = self.m.model.item_op
            if item_op is not None:
                getter = getattr(item_op, "get_pretrained_parameter_names",
                                 None)
                signals = list(getter()) if getter else []

            def label_fn(params):
                def label(path, _):
                    keys = [str(getattr(p, "key", "")) for p in path]
                    if "item_op" in keys and any(s in keys for s in signals):
                        return "item"
                    return "other"
                return jax.tree_util.tree_map_with_path(label, params)

            self.optimizer = optax.multi_transform(
                {"item": optax.adam(item_sched), "other": base_opt}, label_fn)
        else:
            self.optimizer = base_opt
        accum = int(policy.get("accumulate_batch") or 1)
        if accum > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, accum)

        self.params = None
        self.opt_state = None
        self.evaluator = self.m.evaluator()
        # simple_dev monitors the raw dev loss (minimize), otherwise the
        # dev metric's own direction (reference trainer.py:164)
        self.monitor = Monitor(
            patience=self.m.patience,
            minimize=bool(policy.get("simple_dev"))
            or MetricPool.is_minimize(self.m.dev_metric))

    # ------------------------------------------------------------------ #
    def init(self, batch=None):
        if batch is None:
            batch = next(self.m.train_batcher(self.seed).epoch(shuffle=False))
        self.params = init_params(self.m.model, batch,
                                  self.m.contents.columns, seed=self.seed)
        self.params, _ = self.m.load_lm_weights(self.params, log=self.log)
        if self.m.prepare_lm_cache(self.params):
            self.log.info("LM layer-split cache prepared")
        self.opt_state = self.optimizer.init(self.params)
        if self.m.mesh is not None:
            self._place_on_mesh()
        n_params = sum(int(np.prod(p.shape))
                       for p in jax.tree_util.tree_leaves(self.params))
        self.log.info(f"initialized {n_params/1e6:.2f}M params")
        return self.params

    def _place_on_mesh(self):
        """Distribute params + optimizer state on the policy mesh: tables
        row-sharded / LM slices TP-sharded over mp with the Adam moments
        following the param shardings; catalog-parallel keeps params
        replicated (the shard_map enters them with P() specs)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from legommenders_tpu.parallel.mesh import params_shardings
        from legommenders_tpu.parallel.train import place_opt_state

        mesh = self.m.mesh
        if self.m.catalog_parallel:
            repl = NamedSharding(mesh, P())
            p_sh = jax.tree_util.tree_map(lambda _: repl, self.params)
        else:
            p_sh = params_shardings(self.params, mesh,
                                    self.m.mesh_min_rows)
        self.params = jax.tree_util.tree_map(
            jax.device_put, self.params, p_sh)
        self.opt_state = place_opt_state(
            self.optimizer, self.opt_state, p_sh, mesh)
        if mesh.shape.get("sp", 1) > 1:
            # ambient SP mesh: operators flagged `sequence_parallel: true`
            # in their YAML config shard their attention/pooling over the
            # sp axis at trace time (parallel/mesh.sequence_parallel)
            from legommenders_tpu.parallel.mesh import set_sp_mesh
            set_sp_mesh(mesh)
        if mesh.shape.get("pp", 1) > 1:
            # ambient PP mesh: LM slices with pipeline_stages (injected by
            # the Manager from mesh.pp) gpipe their layer stack over the pp
            # axis at trace time. Eval paths deactivate it (no_pipeline):
            # staging is a training-throughput feature and the fast-eval
            # cache builds run inside their own shard_map.
            from legommenders_tpu.parallel.mesh import set_pp_mesh
            set_pp_mesh(mesh)
        self.log.info(
            f"mesh policy active: {dict(mesh.shape)}"
            + (" (catalog-parallel)" if self.m.catalog_parallel else ""))

    # ------------------------------------------------------------------ #
    def dev(self) -> float:
        policy = self.m.policy
        if policy.get("simple_dev"):
            return self._simple_dev_loss()
        res = self.evaluator.evaluate(self.params, "dev")
        return res[self.m.dev_metric]

    def _simple_dev_loss(self) -> float:
        """Loss-only dev (reference trainer.py:126-153, simple_dev).

        simple_dev exists precisely for big dev sets, so the batcher is
        built once and the host->device conversion runs in a prefetch
        thread overlapping the jitted loss (like the train loop)."""
        from legommenders_tpu.parallel.mesh import no_pipeline

        if not hasattr(self, "_dev_loss_fn"):
            loss_fn = make_loss_fn(self.m.model, self.m.contents.columns,
                                   self.m.lego_cfg.use_neg_sampling)
            self._dev_loss_fn = jax.jit(loss_fn)
            from legommenders_tpu.data.pipeline import TrainBatcher
            self._dev_batcher = TrainBatcher(
                self.m.data, int(self.m.policy["batch_size"]),
                neg_count=self.m.lego_cfg.neg_count,
                use_neg_sampling=self.m.lego_cfg.use_neg_sampling,
                seed=self.seed, phase="dev")
        jitted = self._dev_loss_fn
        rng = jax.random.PRNGKey(0)
        meaner = Meaner()
        conv = jnp.asarray
        if self.m.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(self.m.mesh, P())
            conv = lambda v: jax.device_put(jnp.asarray(v), repl)

        def device_batches():
            for b in self._dev_batcher.epoch(shuffle=False):
                yield {k: conv(v) for k, v in b.items()}

        # device-side losses; one float() sync per batch is unavoidable
        # for the running mean, but the NEXT batch is already in flight
        with no_pipeline():
            for jb in Prefetcher(device_batches(), depth=4):
                meaner.add(float(jitted(self.params, jb, rng)))
        return meaner.mean

    # ------------------------------------------------------------------ #
    def train(self) -> Dict[str, float]:
        policy = self.m.policy
        if self.params is None:
            self.init()
        mesh = self.m.mesh
        device_batching = bool(policy.get("device_batching"))
        place_batch = None
        if mesh is not None:
            bs = int(policy["batch_size"])
            n_dp = mesh.shape.get("dp", 1)
            if bs % n_dp:
                raise SystemExit(
                    f"policy.batch_size {bs} must divide by mesh dp={n_dp}")
        if mesh is not None and self.m.catalog_parallel:
            # catalog-parallel: item catalog / LM cache row-sharded over
            # every mesh device, encode cost and cache memory scale 1/n_dev
            # (parallel/catalog.py; the 7B-cache-won't-fit answer)
            from legommenders_tpu.parallel.catalog import (
                make_catalog_parallel_step, place_catalog,
            )
            from legommenders_tpu.parallel.mesh import shard_batch
            placed_contents, _ = place_catalog(
                dict(self.m.contents.columns), mesh)
            if device_batching:
                # fused composition: the device pipeline's substrate rides
                # mesh-replicated, the (B,) idx dp-sharded, and in-jit
                # assembly feeds the catalog-sharded encode — per-step
                # host traffic is the idx slice, same as plain dp
                from jax.sharding import NamedSharding, PartitionSpec as P
                from legommenders_tpu.data.device_pipeline import (
                    DeviceTrainPipeline,
                )
                from legommenders_tpu.parallel.mesh import DP_AXIS
                from legommenders_tpu.runtime.steps import default_rng_impl
                dpipe = DeviceTrainPipeline(
                    self.m.data, int(policy["batch_size"]),
                    neg_count=self.m.lego_cfg.neg_count,
                    use_neg_sampling=self.m.lego_cfg.use_neg_sampling,
                    seed=self.seed)
                dpipe._replicate_substrate(NamedSharding(mesh, P()))
                raw_step = make_catalog_parallel_step(
                    self.m.model, self.optimizer, mesh,
                    use_neg_sampling=self.m.lego_cfg.use_neg_sampling,
                    seed=self.seed,
                    rng_impl=str(policy.get("rng_impl")
                                 or default_rng_impl()),
                    assemble=dpipe.assemble)
                dp_sh = NamedSharding(mesh, P(DP_AXIS))
                step_fn = (lambda p, o, idx, i: raw_step(
                    p, o, placed_contents,
                    jax.device_put(jnp.asarray(idx), dp_sh), i))
            else:
                raw_step = make_catalog_parallel_step(
                    self.m.model, self.optimizer, mesh,
                    use_neg_sampling=self.m.lego_cfg.use_neg_sampling,
                    seed=self.seed, rng_impl=policy.get("rng_impl"))
                step_fn = (lambda p, o, jb, i:
                           raw_step(p, o, placed_contents, jb, i))
                place_batch = lambda b: shard_batch(b, mesh)
        elif device_batching:
            # device-resident substrate: per-step host traffic is just the
            # permuted row indices (data/device_pipeline.py); composes with
            # the mesh policy (idx dp-sharded, substrate replicated)
            from legommenders_tpu.data.device_pipeline import (
                DeviceTrainPipeline,
            )
            dpipe = DeviceTrainPipeline(
                self.m.data, int(policy["batch_size"]),
                neg_count=self.m.lego_cfg.neg_count,
                use_neg_sampling=self.m.lego_cfg.use_neg_sampling,
                seed=self.seed)
            from legommenders_tpu.runtime.steps import default_rng_impl
            step_fn = dpipe.make_fused_train_step(
                self.m.model, self.m.contents.columns, self.optimizer,
                seed=self.seed,
                rng_impl=str(policy.get("rng_impl") or default_rng_impl()),
                mesh=mesh)
        elif mesh is not None:
            from legommenders_tpu.parallel.train import (
                make_sharded_train_step_folded,
            )
            step_fn, _pp, place_batch = make_sharded_train_step_folded(
                self.m.model, self.m.contents.columns, self.optimizer,
                mesh, self.m.lego_cfg.use_neg_sampling, seed=self.seed,
                rng_impl=policy.get("rng_impl"),
                min_rows_to_shard=self.m.mesh_min_rows)
        else:
            from legommenders_tpu.runtime.steps import make_train_step_folded
            step_fn = make_train_step_folded(
                self.m.model, self.m.contents.columns, self.optimizer,
                self.m.lego_cfg.use_neg_sampling, seed=self.seed,
                rng_impl=policy.get("rng_impl"))
        global_step = 0
        epoch_batch = int(policy.get("epoch_batch") or 0)
        check_interval = int(policy.get("check_interval") or -2)

        best_dev = None
        best_params = None  # in-memory best when no checkpoint dir
        for epoch in range(int(policy["epoch"])):
            if self.m.cache is not None:
                self.m.cache.clean()
            meaner = Meaner()
            t0 = time.time()
            if device_batching:
                num_batches = len(dpipe)
                step_inputs = (jnp.asarray(idx)
                               for idx in dpipe.epoch_indices())
            else:
                batcher = self.m.train_batcher(self.seed + epoch)
                num_batches = len(batcher)

                def device_batches():
                    # convert to device arrays inside the prefetch thread
                    # so the H2D transfer overlaps the train step; under a
                    # mesh policy this places rows dp-sharded
                    conv = place_batch or (
                        lambda b: {k: jnp.asarray(v) for k, v in b.items()})
                    for b in batcher.epoch():
                        yield conv(b)

                step_inputs = Prefetcher(device_batches(), depth=4)
            if epoch_batch:
                num_batches = min(num_batches, epoch_batch)
            interval = (num_batches // (-check_interval)
                        if check_interval < 0 else check_interval) or 1
            pending = []  # device-side losses; synced once per interval

            for i, jb in enumerate(step_inputs):
                if epoch_batch and i >= epoch_batch:
                    if isinstance(step_inputs, Prefetcher):
                        step_inputs.close()
                    break
                global_step += 1
                self.params, self.opt_state, loss = step_fn(
                    self.params, self.opt_state, jb, global_step)
                pending.append(loss)
                if (i + 1) % interval == 0:
                    for l in pending:
                        meaner.add(float(l))
                    pending.clear()
                    self.log.info(
                        f"epoch {epoch} [{i+1}/{num_batches}] "
                        f"loss {meaner.mean:.4f}")
            for l in pending:
                meaner.add(float(l))
            dt = time.time() - t0
            dev_value = self.dev()
            self.log.info(
                f"epoch {epoch}: loss {meaner.mean:.4f}, "
                f"dev {self.m.dev_metric} {dev_value:.4f}, {dt:.1f}s")

            signal = self.monitor.push(dev_value)
            if signal == Signal.BEST:
                best_dev = dev_value
                if self.ckpt_path:
                    # mesh-sharded params -> orbax shards; else msgpack
                    save_auto(self.ckpt_path, self.params,
                              self.opt_state,
                              meta={"epoch": epoch,
                                    "dev": float(dev_value)})
                else:
                    # no checkpoint dir: hold the best params in memory so
                    # the final test still sees best-dev params, matching
                    # the reference's unconditional reload-best
                    # (trainer.py:292). Must be a device COPY: the train
                    # step donates its params buffers, so a bare reference
                    # would be invalidated by the next step
                    best_params = jax.tree_util.tree_map(
                        jnp.copy, self.params)
            elif signal == Signal.STOP:
                self.log.info(f"early stop at epoch {epoch}")
                break

        if best_dev is not None:
            if self.ckpt_path:
                self.params, _, _ = load_auto(
                    self.ckpt_path, self.params, model_only=True)
            elif best_params is not None:
                self.params = best_params
        return {"best_dev": best_dev if best_dev is not None else float("nan")}

    # ------------------------------------------------------------------ #
    def test(self) -> Dict[str, float]:
        res = self.evaluator.evaluate(self.params, "test")
        self.log.info("test: " + ", ".join(
            f"{k} {v:.4f}" for k, v in res.items()))
        if self.server is not None and self.session:
            import json as _json
            log_text = ""
            for h in self.log.handlers:
                path = getattr(h, "baseFilename", None)
                if path:
                    try:
                        with open(path) as f:
                            log_text = f.read()
                    except OSError:
                        pass
            # performance rides as a JSON string (reference trainer.py:269-273)
            self.server.complete_experiment(
                self.session, log_text, _json.dumps(res))
        return res

    def run(self) -> Dict[str, float]:
        self.train()
        return self.test()
