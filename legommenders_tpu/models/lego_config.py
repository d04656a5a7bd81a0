"""LegoConfig — component wiring: configs -> a ready Legommender module.

Parity: reference model/lego_config.py:57-256 — holds the hyper-params
(hidden_size, item_hidden_size, neg_count=4, use_neg_sampling,
use_item_content, use_fast_eval, item_page_size, cache_page_size=512),
instantiates operator/predictor classes with merged configs, runs the
matching/ranking compatibility checks (:217-224) and registers inputer
vocabs into the embedding hub (:241-256).
"""
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from legommenders_tpu.data.dataset import LegoData
from legommenders_tpu.models.embedding import EmbeddingHub
from legommenders_tpu.models.item_table import ItemContentTable
from legommenders_tpu.models.legommender import Legommender
from legommenders_tpu.utils.function import combine_config
from legommenders_tpu.utils.logging import get_logger
from legommenders_tpu.utils.registry import OPERATORS, PREDICTORS

# keys combine_config injects; their absence from a class is expected
_INJECTED_KEYS = ("hidden_size", "input_dim", "num_cols", "lm_dtype")


def _filter_fields(cfg: dict, cls, what: str) -> dict:
    """Keep the keys `cls` declares; WARN about the rest — a silently
    dropped YAML key (e.g. item_config.dropout on an operator that never
    declared it) is a config no-op the user can't see otherwise."""
    known = cls.__dataclass_fields__
    dropped = [k for k in cfg
               if k not in known and k not in _INJECTED_KEYS]
    if dropped:
        get_logger().warning(
            "%s (%s): ignoring unknown config keys %s — declared fields "
            "are %s", what, cls.__name__, dropped,
            sorted(k for k in known if not k.startswith("_")))
    return {k: v for k, v in cfg.items() if k in known}

_DTYPE_NAMES = {
    "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
    "f32": jnp.float32, "float32": jnp.float32,
    "f16": jnp.float16, "float16": jnp.float16,
}
# populate the registries (decorator side effects)
import legommenders_tpu.models.operators  # noqa: F401
import legommenders_tpu.models.predictors  # noqa: F401


@dataclass
class LegoConfig:
    data: LegoData
    item_operator: Optional[str] = None       # meta.item, e.g. "CNN"
    user_operator: str = "Ada"                # meta.user
    predictor: str = "Dot"                    # meta.predictor
    hidden_size: int = 64
    item_hidden_size: Optional[int] = None
    embedding_dim: Optional[int] = None
    neg_count: int = 4
    use_neg_sampling: bool = True
    use_item_content: bool = True
    use_fast_eval: bool = True
    item_page_size: int = 0
    item_page_remat: str = "full"   # "full" | "dots" | "ffn" | "none"
    full_catalog_encode: str = "auto"
    cache_page_size: int = 512
    item_config: dict = field(default_factory=dict)
    user_config: dict = field(default_factory=dict)
    predictor_config: dict = field(default_factory=dict)
    embed_config: dict = field(default_factory=dict)   # resolved embed yaml
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def from_configs(cls, data: LegoData, model_cfg: dict,
                     embed_cfg: Optional[dict] = None,
                     dtype=jnp.float32) -> "LegoConfig":
        meta = model_cfg.get("meta") or {}
        cfg = model_cfg.get("config") or {}
        return cls(
            data=data,
            item_operator=meta.get("item"),
            user_operator=meta.get("user", "Ada"),
            predictor=meta.get("predictor", "Dot"),
            hidden_size=int(cfg.get("hidden_size", 64)),
            item_hidden_size=cfg.get("item_hidden_size"),
            embedding_dim=cfg.get("embedding_dim"),
            neg_count=int(cfg.get("neg_count", 4)),
            use_neg_sampling=bool(cfg.get("use_neg_sampling", True)),
            use_item_content=bool(cfg.get("use_item_content", True)),
            use_fast_eval=bool(cfg.get("use_fast_eval", True)),
            item_page_size=int(cfg.get("item_page_size") or 0),
            item_page_remat=str(cfg.get("item_page_remat", "full")),
            full_catalog_encode=str(cfg.get("full_catalog_encode", "auto")),
            cache_page_size=int(cfg.get("cache_page_size", 512)),
            item_config=dict(cfg.get("item_config") or {}),
            user_config=dict(cfg.get("user_config") or {}),
            predictor_config=dict(cfg.get("predictor_config") or {}),
            embed_config=dict(embed_cfg or {}),
            dtype=dtype,
        )

    # ------------------------------------------------------------------ #
    def build(self) -> Tuple[Legommender, ItemContentTable, EmbeddingHub]:
        data = self.data
        item_hidden = int(self.item_hidden_size or self.hidden_size)
        emb_dim = int(self.embedding_dim or self.hidden_size)

        hub = EmbeddingHub(
            embedding_dim=emb_dim,
            transformation=self.embed_config.get("transformation", "auto"),
            transformation_dropout=float(
                self.embed_config.get("transformation_dropout", 0.0) or 0.0),
        )

        # pretrained embeddings from the embed config
        for entry in self.embed_config.get("embeddings") or []:
            path = entry["path"]
            arr = np.load(path) if isinstance(path, str) else np.asarray(path)
            hub.load_pretrained(
                arr,
                vocab_name=entry.get("vocab_name"),
                col_name=entry.get("col_name"),
                frozen=bool(entry.get("frozen", True)),
            )

        contents = ItemContentTable.from_data(data)
        item_cols = tuple(
            (col, contents.col_vocabs[col], contents.seq_lens()[col])
            for col, _ in data.item_inputs
        )
        for col, vocab, _ in item_cols:
            v = data.items.vocab_of(col)
            fitted_size = len(v) if v else int(data.items[col].max()) + 1
            if not hub.has(vocab):
                hub.register_vocab(vocab, fitted_size)
            elif hub.size_of(vocab) < fitted_size:
                # reference raises on vocab-size conflicts
                # (embedding_hub.py:346-360) — a pretrained table smaller
                # than the fitted vocab would silently clip token ids
                raise ValueError(
                    f"pretrained embedding for vocab '{vocab}' has "
                    f"{hub.size_of(vocab)} rows but the fitted vocab has "
                    f"{fitted_size} tokens; re-export the embedding")

        item_id_vocab = data.cm.col_vocabs.get(data.cm.history_col, "item_id")
        if not self.use_item_content and not hub.has(item_id_vocab):
            hub.register_vocab(item_id_vocab, data.num_items)

        # ---------------- operators ----------------
        item_op = None
        item_inputer = None
        flatten = False
        user_op_cls = OPERATORS[self.user_operator]
        pred_cls = PREDICTORS[self.predictor]

        if self.use_item_content:
            assert self.item_operator, "use_item_content requires meta.item"
            item_op_cls = OPERATORS[self.item_operator]
            icfg = combine_config(
                {k: v for k, v in self.item_config.items()
                 if k != "inputer_config"},
                hidden_size=item_hidden, input_dim=emb_dim)
            icfg = _filter_fields(icfg, item_op_cls, "item_config")
            if "num_cols" in item_op_cls.__dataclass_fields__:
                icfg["num_cols"] = len(item_cols)
            # YAML configs express dtypes as strings ("bf16"); flax module
            # fields want jnp dtypes
            if isinstance(icfg.get("lm_dtype"), str):
                icfg["lm_dtype"] = _DTYPE_NAMES[icfg["lm_dtype"].lower()]
            item_op = item_op_cls(dtype=self.dtype, **icfg)
            inputer_cfg = dict(self.item_config.get("inputer_config") or {})
            inputer_cfg = _filter_fields(inputer_cfg,
                                         item_op_cls.inputer_class,
                                         "item_config.inputer_config")
            item_inputer = item_op_cls.inputer_class(
                cols=item_cols, dtype=self.dtype, **inputer_cfg)
            user_input_dim = item_op.output_dim
        else:
            user_input_dim = emb_dim

        flatten = bool(user_op_cls.flatten_mode)
        user_from_user_cols = flatten and bool(
            getattr(user_op_cls.inputer_class, "consumes_user_cols", False))
        if user_from_user_cols:
            # the user op consumes raw embeddings of user-store columns
            # (SemanticMix), not click vectors from the item operator
            user_input_dim = emb_dim
        ucfg = combine_config(
            {k: v for k, v in self.user_config.items()
             if k != "inputer_config"},
            hidden_size=self.hidden_size, input_dim=user_input_dim)
        ucfg = _filter_fields(ucfg, user_op_cls, "user_config")
        if ("num_semantic_layers" in user_op_cls.__dataclass_fields__
                and "num_semantic_layers" not in ucfg and item_cols):
            # semantic operator: layer count = semantic-code width
            ucfg["num_semantic_layers"] = item_cols[0][2]
        user_op = user_op_cls(dtype=self.dtype, **ucfg)

        user_inputer = None
        user_batch_cols: Tuple[str, ...] = ()
        if flatten:
            # flatten-mode user inputers consume item content columns,
            # unless the inputer reads user-store columns from the batch
            # (SemanticMixInputer)
            u_inputer_cfg = dict(self.user_config.get("inputer_config") or {})
            u_inputer_cfg = _filter_fields(u_inputer_cfg,
                                           user_op_cls.inputer_class,
                                           "user_config.inputer_config")
            u_cols = item_cols
            if user_from_user_cols:
                assert data.user_inputs, (
                    f"{self.user_operator} needs user-side input columns "
                    f"(data config user.inputs)")
                u_cols = []
                for col, _ in data.user_inputs:
                    v = data.users.vocab_of(col)
                    vocab = v.name if v else col
                    arr = data.users[col]
                    seq_len = arr.shape[1] if arr.ndim > 1 else 1
                    u_cols.append((col, vocab, seq_len))
                    if not hub.has(vocab):
                        size = len(v) if v else int(arr.max()) + 1
                        hub.register_vocab(vocab, size)
                u_cols = tuple(u_cols)
                user_batch_cols = tuple(c for c, _, _ in u_cols)
            user_inputer = user_op_cls.inputer_class(
                cols=u_cols, dtype=self.dtype, **u_inputer_cfg)

        pcfg = combine_config(dict(self.predictor_config),
                              hidden_size=self.hidden_size)
        pcfg = _filter_fields(pcfg, pred_cls, "predictor_config")
        predictor = pred_cls(dtype=self.dtype, **pcfg)

        # compatibility checks (reference lego_config.py:217-224)
        if self.use_neg_sampling and not predictor.allow_matching:
            raise ValueError(
                f"{self.predictor} does not support matching "
                f"(neg-sampling) mode")
        if not self.use_neg_sampling and not predictor.allow_ranking:
            raise ValueError(f"{self.predictor} does not support ranking mode")

        specs = tuple(sorted(hub._specs.values(), key=lambda s: s.param_name))

        # scatter-free gather-reduce embedding-grad plans for the static
        # catalog lookup (only meaningful when the full-catalog encode
        # path can be taken)
        catalog_plans = None
        if self.use_item_content and self.full_catalog_encode != "off":
            from legommenders_tpu.ops.catalog_grad import build_catalog_plans
            catalog_plans = build_catalog_plans(
                {c: contents.columns[c] for c, _, _ in item_cols},
                contents.col_vocabs, specs) or None

        # scatter-light backward for the history-repr gather on the same
        # catalog branch (useful even with frozen embeddings, so built
        # independently of catalog_plans)
        history_plan = None
        if (self.use_item_content and self.full_catalog_encode != "off"
                and not flatten and item_cols):
            hm = data.history_matrix()
            if hm is not None and getattr(hm, "ndim", 0) == 2:
                from legommenders_tpu.ops.catalog_grad import HistoryGradPlan
                n_items = int(np.asarray(
                    contents.columns[item_cols[0][0]]).shape[0])
                history_plan = HistoryGradPlan(np.asarray(hm), n_items)

        model = Legommender(
            embed_specs=specs,
            pretrained=dict(hub.pretrained),
            item_op=item_op,
            user_op=user_op,
            predictor=predictor,
            item_inputer=item_inputer,
            user_inputer=user_inputer,
            # batch-schema keys are fixed by the pipeline (pipeline.py
            # emits "history"/"mask"/"candidates" regardless of the
            # data-side column names in ColumnMap)
            candidate_col="candidates",
            history_col="history",
            mask_col="mask",
            user_col=data.cm.user_col,
            use_item_content=self.use_item_content,
            use_neg_sampling=self.use_neg_sampling,
            neg_count=self.neg_count,
            flatten_mode=flatten,
            user_batch_cols=user_batch_cols,
            item_id_vocab=item_id_vocab,
            item_page_size=int(self.item_page_size or 0),
            item_page_remat=self.item_page_remat,
            full_catalog_encode=self.full_catalog_encode,
            catalog_plans=catalog_plans,
            catalog_history_plan=history_plan,
            dtype=self.dtype,
        )
        return model, contents, hub
