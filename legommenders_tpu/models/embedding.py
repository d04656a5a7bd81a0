"""Embedding hub: unified vocab/feature-keyed embedding tables.

Parity: reference loader/embedding_hub.py:121-385 —
  * tables keyed by vocab name AND by feature (column) name, lookup
    precedence feature > vocab (:378-385);
  * pretrained `.npy` matrices, frozen or trainable (:239-281);
  * a `Transformation` (Linear + Dropout after lookup) inserted when the
    table dim mismatches the model dim or policy == 'linear' (:73-96);
  * random `nn.Embedding` otherwise (:326-335).

TPU-first differences: tables are flax params in one module so they live in
the jitted train state; "frozen" is implemented with stop_gradient at lookup
(plus optax masking hooks via `frozen_paths`); row-sharding over the mesh is
annotated with nn.with_partitioning when a mesh axis is configured.
"""
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EmbedSpec:
    name: str                       # vocab or feature (column) name
    kind: str                       # 'vocab' | 'feature'
    size: int                       # rows
    dim: int                        # table dim (pretrained dim if loaded)
    frozen: bool = False
    has_pretrained: bool = False
    transform: bool = False         # project dim -> target_dim after lookup
    target_dim: int = 0
    transform_dropout: float = 0.0

    @property
    def param_name(self) -> str:
        return f"{self.kind}__{self.name}"


class EmbeddingTables(nn.Module):
    """The linen module holding every table. `pretrained` maps param_name ->
    np.ndarray used at init time (closed over, not traced)."""

    specs: Tuple[EmbedSpec, ...]
    pretrained: Dict[str, np.ndarray] = field(default_factory=dict)
    dtype: jnp.dtype = jnp.float32
    shard_axis: Optional[str] = None  # mesh axis for row-sharding (e.g. 'mp')

    def setup(self):
        tables = {}
        transforms = {}
        dropouts = {}
        for spec in self.specs:
            if spec.has_pretrained:
                arr = np.asarray(self.pretrained[spec.param_name], np.float32)
                assert arr.shape == (spec.size, spec.dim), (
                    f"pretrained {spec.param_name}: {arr.shape} != "
                    f"({spec.size}, {spec.dim})")
                init = lambda key, shape, a=arr: jnp.asarray(a)
            else:
                init = nn.initializers.normal(stddev=0.02)
            if self.shard_axis:
                init = nn.with_partitioning(init, (self.shard_axis, None))
            tables[spec.param_name] = self.param(
                f"emb_{spec.param_name}", init, (spec.size, spec.dim))
            if spec.transform:
                transforms[spec.param_name] = nn.Dense(
                    spec.target_dim, dtype=self.dtype,
                    name=f"tr_{spec.param_name}")
                if spec.transform_dropout > 0:
                    dropouts[spec.param_name] = nn.Dropout(
                        spec.transform_dropout)
        self.tables = tables
        self.transforms = transforms
        self.dropouts = dropouts
        self._by_name = {(s.kind, s.name): s for s in self.specs}

    def _spec(self, vocab_name: str, col_name: Optional[str]) -> EmbedSpec:
        if col_name is not None and ("feature", col_name) in self._by_name:
            return self._by_name[("feature", col_name)]
        if ("vocab", vocab_name) in self._by_name:
            return self._by_name[("vocab", vocab_name)]
        raise KeyError(f"no embedding table for vocab={vocab_name} col={col_name}")

    def embed(self, ids: jnp.ndarray, vocab_name: str,
              col_name: Optional[str] = None, training: bool = False,
              plan=None):
        """Lookup with UNSET-safe clipping; caller masks pad positions.

        `plan` (ops/catalog_grad.CatalogGradPlan) reroutes the backward of a
        static full-catalog lookup through scatter-free gather-reduce
        segment-sums instead of a row-granular scatter-add; forward is
        bit-identical. Only applied when the plan was built for exactly
        this shape and table (content verified upstream by
        CatalogGradPlan.matches_source)."""
        spec = self._spec(vocab_name, col_name)
        table = self.tables[spec.param_name]
        if isinstance(table, nn.meta.AxisMetadata):  # partitioned param box
            table = table.unbox()
        if spec.frozen:
            table = jax.lax.stop_gradient(table)
        if (plan is not None and not spec.frozen
                and plan.matches(ids.shape, spec.size)):
            out = plan.take(table).astype(self.dtype)
        else:
            safe = jnp.clip(ids, 0, spec.size - 1)
            out = jnp.take(table, safe, axis=0).astype(self.dtype)
        if spec.transform:
            out = self.transforms[spec.param_name](out)
            if spec.param_name in self.dropouts:
                out = self.dropouts[spec.param_name](
                    out, deterministic=not training)
        return out

    def dim_of(self, vocab_name: str, col_name: Optional[str] = None) -> int:
        spec = self._spec(vocab_name, col_name)
        return spec.target_dim if spec.transform else spec.dim

    def __call__(self, ids, vocab_name, col_name=None, training=False):
        return self.embed(ids, vocab_name, col_name, training)


class PlannedTables:
    """Thin view over EmbeddingTables that injects per-column catalog
    gradient plans (ops/catalog_grad.py) into `embed` calls — inputers stay
    plan-agnostic; Legommender substitutes this view on the full-catalog
    encode path only."""

    def __init__(self, eh: EmbeddingTables, plans: Dict[str, object]):
        self._eh = eh
        self._plans = plans or {}

    def embed(self, ids, vocab_name, col_name=None, training=False):
        return self._eh.embed(ids, vocab_name, col_name, training,
                              plan=self._plans.get(col_name))

    def dim_of(self, vocab_name, col_name=None):
        return self._eh.dim_of(vocab_name, col_name)

    def __call__(self, ids, vocab_name, col_name=None, training=False):
        return self.embed(ids, vocab_name, col_name, training)


class EmbeddingHub:
    """Python-side builder collecting registrations before module creation
    (mirrors the reference's registration flow: register_vocab /
    load_pretrained_embedding, embedding_hub.py:239-360)."""

    def __init__(self, embedding_dim: int, transformation: str = "auto",
                 transformation_dropout: float = 0.0):
        self.embedding_dim = embedding_dim
        self.transformation = transformation
        self.transformation_dropout = transformation_dropout
        self._specs: Dict[Tuple[str, str], EmbedSpec] = {}
        self.pretrained: Dict[str, np.ndarray] = {}

    def register_vocab(self, name: str, size: int, dim: Optional[int] = None):
        key = ("vocab", name)
        if key in self._specs:
            if self._specs[key].size != size:
                raise ValueError(
                    f"vocab size conflict for '{name}': "
                    f"{self._specs[key].size} vs {size}")
            return
        self._specs[key] = EmbedSpec(
            name=name, kind="vocab", size=size,
            dim=dim or self.embedding_dim)
        self._apply_transform_policy(key)

    def load_pretrained(self, array: np.ndarray, vocab_name: str = None,
                        col_name: str = None, frozen: bool = True):
        assert (vocab_name is None) != (col_name is None), \
            "exactly one of vocab_name/col_name"
        kind = "vocab" if vocab_name else "feature"
        name = vocab_name or col_name
        arr = np.asarray(array, np.float32)
        spec = EmbedSpec(name=name, kind=kind, size=arr.shape[0],
                         dim=arr.shape[1], frozen=frozen, has_pretrained=True)
        self._specs[(kind, name)] = spec
        self.pretrained[spec.param_name] = arr
        self._apply_transform_policy((kind, name))

    def _apply_transform_policy(self, key):
        spec = self._specs[key]
        needs = (self.transformation == "linear") or (
            self.transformation == "auto" and spec.dim != self.embedding_dim)
        if needs:
            self._specs[key] = EmbedSpec(
                **{**spec.__dict__, "transform": True,
                   "target_dim": self.embedding_dim,
                   "transform_dropout": self.transformation_dropout})

    def has(self, vocab_name: str) -> bool:
        return ("vocab", vocab_name) in self._specs

    def size_of(self, vocab_name: str) -> int:
        return self._specs[("vocab", vocab_name)].size

    def build(self, dtype=jnp.float32, shard_axis: Optional[str] = None
              ) -> EmbeddingTables:
        specs = tuple(sorted(self._specs.values(), key=lambda s: s.param_name))
        return EmbeddingTables(specs=specs, pretrained=dict(self.pretrained),
                               dtype=dtype, shard_axis=shard_axis)

    def frozen_paths(self) -> List[str]:
        return [f"emb_{s.param_name}" for s in self._specs.values() if s.frozen]
