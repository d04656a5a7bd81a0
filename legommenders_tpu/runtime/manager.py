"""Manager — glue between configs, data, model and the runtime.

Parity: reference loader/manager.py:121-431 — builds the dataset stores,
resolves operator/predictor classes, constructs the model and hands out
batchers; `setup(phase)` phase switching is replaced by explicit
train/eval entry points (no global mutable Env).
"""
from typing import Dict, Optional

import jax.numpy as jnp

from legommenders_tpu.data.dataset import LegoData
from legommenders_tpu.data.pipeline import EvalBatcher, TrainBatcher
from legommenders_tpu.models.lego_config import LegoConfig
from legommenders_tpu.runtime.cacher import ReprCache
from legommenders_tpu.runtime.evaluator import Evaluator


DEFAULT_POLICY = dict(
    epoch=50, lr=1e-3, item_lr=None, batch_size=64, n_warmup=0,
    check_interval=-2, simple_dev=False, epoch_batch=0, accumulate_batch=1,
)
DEFAULT_METRICS = ["GAUC", "MRR", "NDCG@1", "NDCG@5", "NDCG@10"]


class Manager:
    def __init__(self, data_cfg: dict, model_cfg: dict,
                 embed_cfg: Optional[dict] = None,
                 exp_cfg: Optional[dict] = None,
                 data: Optional[LegoData] = None,
                 dtype=jnp.float32):
        self.exp_cfg = dict(exp_cfg or {})
        self.policy = {**DEFAULT_POLICY, **(self.exp_cfg.get("policy") or {})}
        store = self.exp_cfg.get("store") or {}
        self.dev_metric = store.get("metric", "GAUC")
        self.patience = int(store.get("patience", 5))
        self.metrics = list(self.exp_cfg.get("metrics") or DEFAULT_METRICS)

        policy_dtype = str(self.policy.get("dtype") or "").lower()
        if policy_dtype in ("bf16", "bfloat16"):
            dtype = jnp.bfloat16
        elif policy_dtype in ("f32", "float32"):
            dtype = jnp.float32

        self.data = data if data is not None else LegoData.from_config(data_cfg)

        # first-class multi-device policy (exp.policy.mesh — config-only
        # composition like everything else, reference trainer.py:299-313;
        # the mesh itself has no reference counterpart, SURVEY §2.9).
        # Parsed BEFORE the model build: pp > 1 must reach the LM slice's
        # pipeline_stages knob at construction time.
        self.mesh = None
        self.catalog_parallel = False
        model_cfg = dict(model_cfg or {})
        mesh_cfg = self.policy.get("mesh")
        if mesh_cfg:
            from legommenders_tpu.parallel.mesh import mesh_from_policy
            self.mesh = mesh_from_policy(mesh_cfg)
            if isinstance(mesh_cfg, dict):
                self.catalog_parallel = bool(
                    mesh_cfg.get("catalog_parallel"))
                self.mesh_min_rows = int(
                    mesh_cfg.get("min_rows_to_shard") or 0)
            else:
                self.mesh_min_rows = 0
            n_pp = self.mesh.shape.get("pp", 1)
            if n_pp > 1:
                model_cfg = self._apply_pp_policy(model_cfg, n_pp)

        self.lego_cfg = LegoConfig.from_configs(
            self.data, model_cfg, embed_cfg, dtype=dtype)
        self.model, self.contents, self.hub = self.lego_cfg.build()

        self.cache = None
        if self.lego_cfg.use_fast_eval and self._caching_allowed():
            self.cache = ReprCache(
                self.model, self.contents.columns,
                self.data.history_matrix(),
                page_size=self.lego_cfg.cache_page_size,
                mesh=self.mesh)

    def _apply_pp_policy(self, model_cfg: dict, n_pp: int) -> dict:
        """Route `exp.policy.mesh.pp` to the LM slice: default the item
        operator's `pipeline_stages` to the mesh pp width (an explicit
        item_config.pipeline_stages wins, but must equal pp). Pipeline
        staging only exists for LM layer stacks — any other operator, or
        catalog_parallel (whose shard_map cannot nest the gpipe shard_map),
        is a loud config error, not a silent no-op."""
        from legommenders_tpu.utils.registry import OPERATORS

        if self.catalog_parallel:
            raise SystemExit(
                "exp.policy.mesh: pp > 1 cannot combine with "
                "catalog_parallel (the catalog shard_map cannot nest the "
                "pipeline shard_map) — pick one")
        meta = dict(model_cfg.get("meta") or {})
        item_name = meta.get("item")
        item_cls = OPERATORS[item_name] if item_name in OPERATORS else None
        if (item_cls is None or
                "pipeline_stages" not in getattr(
                    item_cls, "__dataclass_fields__", {})):
            raise SystemExit(
                f"exp.policy.mesh.pp={n_pp} requires an LM item operator "
                f"with a pipeline_stages knob; meta.item={item_name!r} "
                f"has none")
        cfg = dict(model_cfg.get("config") or {})
        icfg = dict(cfg.get("item_config") or {})
        stages = int(icfg.get("pipeline_stages") or 0)
        if stages and stages != n_pp:
            raise SystemExit(
                f"item_config.pipeline_stages={stages} != mesh pp={n_pp}")
        icfg["pipeline_stages"] = n_pp
        cfg["item_config"] = icfg
        return {**model_cfg, "config": cfg}

    def prepare_lm_cache(self, params, regenerate: bool = False) -> bool:
        """Layer-split LM caching: if the item operator is an LMOperator
        with `tune_from`, build/load the lower-layer hidden states and
        register them as device-resident content arrays
        (reference once_operator.py:101-134)."""
        from legommenders_tpu.models.operators.lm_ops import LMOperator
        from legommenders_tpu.runtime.lm_cache import load_or_build_lm_cache

        op = self.model.item_op
        if not isinstance(op, LMOperator) or not op.use_lm_cache:
            return False
        if getattr(op, "is_iisan", False):
            from legommenders_tpu.runtime.lm_cache import (
                load_or_build_iisan_cache)
            extra = load_or_build_iisan_cache(
                self.model, params, dict(self.contents.columns),
                data_name=self.data.name, operator_name=op.transformer_key,
                selected_layers=op.get_selected_layers(),
                page_size=self.lego_cfg.cache_page_size,
                regenerate=regenerate)
        else:
            extra = load_or_build_lm_cache(
                self.model, params, dict(self.contents.columns),
                data_name=self.data.name, operator_name=op.transformer_key,
                layer=op.resolved_tune_from,
                page_size=self.lego_cfg.cache_page_size,
                regenerate=regenerate, device_dtype=op.lm_dtype)
        self.contents.columns.update(extra)
        return True

    def _caching_allowed(self) -> bool:
        item_ok = (self.model.item_op is None or
                   type(self.model.item_op).allow_caching)
        user_ok = type(self.model.user_op).allow_caching
        return bool(item_ok and user_ok and self.model.use_item_content
                    and not self.model.flatten_mode)

    # ------------------------------------------------------------------ #
    def train_batcher(self, seed: int = 2023) -> TrainBatcher:
        return TrainBatcher(
            self.data, batch_size=int(self.policy["batch_size"]),
            neg_count=self.lego_cfg.neg_count,
            use_neg_sampling=self.lego_cfg.use_neg_sampling, seed=seed)

    @property
    def eval_batch_size(self) -> int:
        """Eval batches are pure gathers+predictor on the cached path, so
        default to 4x the train batch (policy `eval_batch_size` overrides)."""
        return int(self.policy.get("eval_batch_size")
                   or 4 * int(self.policy["batch_size"]))

    def eval_batcher(self, phase: str) -> EvalBatcher:
        return EvalBatcher(self.data, phase, self.eval_batch_size)

    def evaluator(self) -> Evaluator:
        return Evaluator(self.model, self.contents.columns, self.data,
                         self.eval_batch_size, self.metrics,
                         cache=self.cache, mesh=self.mesh)

    def load_lm_weights(self, params, log=None):
        """Port HF checkpoint weights into the LM slices (reference:
        AutoModel.from_pretrained at component build, once_operator.py:51).
        The checkpoint path comes from the `.model` dotfile keyed by the
        operator's transformer_key. Returns (params, loaded: bool); missing
        checkpoints are a loud no-op (training continues from random init,
        which is only meaningful for tests/benchmarks)."""
        import os
        from legommenders_tpu.config.dotfiles import ModelInit
        from legommenders_tpu.models.operators.lm_ops import LMOperator
        from legommenders_tpu.models.lm import hf_loader
        from legommenders_tpu.utils.logging import get_logger

        log = log or get_logger("manager")
        op = self.model.item_op
        if not isinstance(op, LMOperator):
            return params, False
        path = ModelInit.get(op.transformer_key)
        if not path or not os.path.isdir(path):
            log.warning(
                f"no local HF checkpoint for '{op.transformer_key}' "
                f"(.model dotfile) — LM runs from RANDOM init")
            return params, False
        sd = hf_loader.load_torch_state_dict(path)
        start = op.resolved_tune_from
        n = op.num_hidden_layers
        fam = op.hf_family
        if fam == "bert":
            upper = hf_loader.bert_slice_params(
                sd, start, n - start, embed=(start == 0))
            lower = (hf_loader.bert_slice_params(sd, 0, start, embed=True)
                     if start > 0 else None)
        elif fam == "llama":
            upper = hf_loader.llama_slice_params(sd, start, n - start,
                                                 final_norm=True)
            lower = (hf_loader.llama_slice_params(sd, 0, start,
                                                  final_norm=False)
                     if start > 0 else None)
        elif fam == "opt":
            upper = hf_loader.opt_slice_params(
                sd, start, n - start, embed_positions=(start == 0),
                final_norm=True)
            lower = (hf_loader.opt_slice_params(sd, 0, start,
                                                embed_positions=True,
                                                final_norm=False)
                     if start > 0 else None)
        elif fam == "glm":
            kv = op.num_kv_heads or op.num_attention_heads
            upper = hf_loader.glm_slice_params(
                sd, start, n - start, op.num_attention_heads, kv,
                final_norm=True)
            lower = (hf_loader.glm_slice_params(
                sd, 0, start, op.num_attention_heads, kv, final_norm=False)
                if start > 0 else None)
        else:
            log.warning(f"no HF mapping for family {type(op).__name__}")
            return params, False
        params = hf_loader.merge_lm_params(
            params, upper, ("params", "item_op", "lm"))
        if lower is not None:
            params = hf_loader.merge_lm_params(
                params, lower, ("params", "item_op", "lm_lower"))
        log.info(f"loaded HF weights for {op.transformer_key} from {path}")
        return params, True
