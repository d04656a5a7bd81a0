"""Gather-routed embedding gradient for static catalog token ids.

In full-catalog-encode mode (models/legommender.py:194-204) every train step
embeds the SAME (N, L) catalog token matrix. Autodiff turns that lookup's
backward into a scatter-add of N*L gradient rows into the vocab table —
row-granular scatter-add runs at ~15 GB/s on a v5e (read-modify-write
serialization) and dominated the fused NAML step (~22 ms of 57 ms,
ROADMAP.md perf item 2).

Because the ids are static, the backward is a *fixed* segment-sum whose
layout we precompute on the host once, then evaluate as a hierarchical
gather-reduce — scatter-free until one final write of the unique rows:

  1. stable-sort the flattened ids on the host; group occurrences by unique
     id.
  2. level 1: a static (m1, F) index matrix maps each unique id's
     occurrences into consecutive F-wide blocks (padded with a sentinel row
     that reads zeros). `take(grad, idx).sum(axis=1)` collapses every block
     — one big XLA gather + reshape-sum, no scan, no scatter.
  3. repeat with blocks-per-id until every id holds one row (log_F levels;
     level sizes shrink F-fold so total traffic ~= (1 + 1/F + ...) * |grad|).
  4. one final `.at[unique].set` of the U unique sorted rows into the (V, D)
     cotangent — ~60x fewer scattered rows than the naive backward at MIND
     scale.

Gathers stream at HBM bandwidth (same pattern as the forward lookup);
accumulation stays in the gradient dtype, and per-level sums are exact
f32 adds, so results match the scatter-add backward to ULP-level.

An earlier variant expressed the segment-sum as one-hot matmuls inside a
`lax.scan` (MXU-routed); measured on the v5e it LOST to the scatter-add
(125k vs 160k impressions/s end to end) — ~2k serialized scan iterations
plus one-hot materialization traffic. The gather-reduce needs no MXU and no
sequential loop. No reference counterpart — the reference's torch backward
is a CUDA scatter-add (torch embedding backward).

Fanout choice (tools/segsum_bench.py on the v5e, M=1.95M D=64 V=30k):
level-1 reads every cotangent row exactly once regardless of F, and that
random 256B-row traffic IS the floor — F=8 hits it (13.7 ms bwd, equal to
the bare g[order] permutation) while F=16 pessimizes the gather pattern
(25.5 ms); raw scatter-add 17.3 ms; a sorted block-diagonal one-hot MXU
variant and bf16 cotangents both lose. Hence default fanout=8.
"""
import hashlib
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legommenders_tpu.data.token_store import UNSET


# Trace-time activation report (VERDICT r3 weak #7 guard): every jit trace
# of the catalog branch records which plan columns were LIVE (gather-reduce
# backward active) vs DEAD (fell back to the plain lookup transpose).
# Written by Legommender._encode_flat; read by tests/benches to assert the
# fast embedding backward is actually engaged in their configuration.
last_trace = {"live": (), "dead": (), "history": False}


def record_trace(live, dead):
    last_trace["live"] = tuple(live)
    last_trace["dead"] = tuple(dead)


def record_history(active: bool):
    """Trace-time flag: True when the last traced catalog forward routed
    the history-repr backward through a HistoryGradPlan."""
    last_trace["history"] = bool(active)


def _ids_md5(ids) -> bytes:
    return hashlib.md5(
        np.ascontiguousarray(np.asarray(ids), dtype=np.int64)).digest()


def _level_indices(counts: np.ndarray, starts: np.ndarray, n_rows: int,
                   fanout: int, source: np.ndarray = None) -> np.ndarray:
    """(m2, F) gather matrix collapsing each id's `counts` consecutive rows
    (at `starts`, optionally indirected through `source`) into
    ceil(counts/F) blocks; pad slots point at row `n_rows` (a zero row)."""
    blocks = -(-counts // fanout)                      # ceil
    m2 = int(blocks.sum())
    owner = np.repeat(np.arange(counts.size), blocks)  # (m2,) id per block
    excl = np.concatenate([[0], np.cumsum(blocks)[:-1]])
    rank = np.arange(m2) - excl[owner]                 # block rank within id
    slot = rank[:, None] * fanout + np.arange(fanout)[None, :]
    valid = slot < counts[owner][:, None]
    pos = starts[owner][:, None] + slot
    pos = np.where(valid, pos, 0)
    if source is not None:
        pos = source[pos]
    return np.where(valid, pos, n_rows).astype(np.int32)


class CatalogGradPlan:
    """Precomputed gather-reduce layout for one (catalog column, table).

    `take(table)` is a drop-in for `jnp.take(table, safe_ids, axis=0)` with
    a custom VJP; forward results are bit-identical, backward is the
    scatter-free segment-sum above (mathematically identical: duplicate
    occurrences accumulate, untouched rows get zero cotangent).
    """

    def __init__(self, ids: np.ndarray, num_rows: int, fanout: int = 8,
                 name: str = ""):
        self.source = ids                  # original array object
        ids = np.asarray(ids)
        self.source_md5 = _ids_md5(ids)    # content fingerprint
        self.name = name
        self.num_rows = int(num_rows)
        self.fanout = F = max(2, int(fanout))
        self.ids_shape = tuple(ids.shape)

        safe = np.where(ids == UNSET, 0, ids)
        safe = np.clip(safe, 0, num_rows - 1).astype(np.int32)
        flat = safe.reshape(-1)
        n = flat.size

        order = np.argsort(flat, kind="stable").astype(np.int64)
        uniq, counts = np.unique(flat, return_counts=True)
        self.num_unique = U = int(uniq.size)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])

        # level 1 gathers straight from the flat cotangent through `order`
        # (sort-permute and block-padding in one indexing pass)
        levels: List[np.ndarray] = [
            _level_indices(counts, starts, n, F, source=order)]
        counts = -(-counts // F)
        while counts.max(initial=0) > 1:
            starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
            m = int(counts.sum())
            levels.append(_level_indices(counts, starts, m, F))
            counts = -(-counts // F)

        self._levels = [jnp.asarray(l) for l in levels]
        self._uniq = jnp.asarray(uniq.astype(np.int32))
        self._safe_dev = jnp.asarray(safe)
        num_rows_ = self.num_rows
        U_ = U

        @jax.custom_vjp
        def take(table):
            return jnp.take(table, self._safe_dev, axis=0)

        def take_fwd(table):
            return take(table), None

        def take_bwd(_, g):
            D = g.shape[-1]
            cur = g.reshape(-1, D)
            for idx in self._levels:
                ext = jnp.concatenate(
                    [cur, jnp.zeros((1, D), cur.dtype)], axis=0)
                cur = jnp.take(ext, idx, axis=0).sum(axis=1)
            grad = jnp.zeros((num_rows_, D), g.dtype)
            grad = grad.at[self._uniq].set(
                cur.astype(g.dtype),
                unique_indices=True, indices_are_sorted=True)
            return (grad,)

        take.defvjp(take_fwd, take_bwd)
        self.take = take
        # public alias for composed plans (HistoryGradPlan): the bare
        # gather-reduce segment-sum, (\*ids_shape, D) cotangent -> (V, D)
        self.segment_reduce = lambda g: take_bwd(None, g)[0]

    # plans are compared/hashed by identity: they are static per (model,
    # catalog) and may sit in flax module fields
    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def matches(self, ids_shape: Tuple[int, ...], num_rows: int) -> bool:
        return (tuple(ids_shape) == self.ids_shape
                and int(num_rows) == self.num_rows)

    def matches_source(self, ids) -> bool:
        """True iff `ids` is verifiably the catalog matrix this plan was
        built from — same object, or same shape AND same content hash.

        Guards against the column dict being swapped after model build
        (e.g. Manager.prepare_lm_cache mutates contents.columns): a
        same-shape replacement must NOT silently embed the stale baked
        ids. Traced values (jit arguments) can't be verified — fall back.
        """
        if ids is self.source:
            return True
        if isinstance(ids, jax.core.Tracer):
            return False
        if tuple(ids.shape) != self.ids_shape:
            return False
        return _ids_md5(ids) == self.source_md5


class HistoryGradPlan:
    """Scatter-light backward for the HISTORY-repr gather in full-catalog
    mode (models/legommender.py `use_catalog` branch).

    Forward: `take(all_reprs, u) == jnp.take(all_reprs, H_safe[u], axis=0)`
    — identical ids to the plain gather (H_safe is the UNSET->0 clipped
    history matrix, exactly what both pipelines put in batch["history"]).
    Backward: the autodiff transpose is a scatter-add of B*S dynamic
    128-byte rows into the (N, D) catalog cotangent — measured 24 ms of
    the 89 ms NAML step at B=32k on a v5e (tools/naml_profile.py), the
    single largest op in the HBM-bound backward. Because each user's
    history row is STATIC, the cotangent factors through the user axis:

      1. segment-sum the (B, S, D) cotangent by user id — B scattered
         rows of S*D contiguous elements (6.4 KB at NAML geometry),
         ~50x fewer and ~50x larger rows than the naive scatter;
      2. a precomputed CatalogGradPlan over the flattened (U*S,) history
         ids gather-reduces into (N, D) with no dynamic scatter at all
         (the by-user partial sums of step 1 distribute over the static
         segment-sum: d_cat[i] = sum_{(u,s): H[u,s]=i} gu[u,s]).

    ONLY valid when batch history rows are verbatim H[user_id]; the gate
    in Legommender.__call__ additionally requires training mode, a
    "user_id" batch column, and matching (S, N). Both shipped pipelines
    (data/pipeline.py TrainBatcher, data/device_pipeline.py assemble)
    satisfy it by construction. No reference counterpart — the torch
    backward is a CUDA scatter-add (reference legommender.py:174-190
    per-occurrence loop never had a catalog-level gather to transpose).
    """

    def __init__(self, hist: np.ndarray, num_items: int, fanout: int = 8):
        hist = np.asarray(hist)
        self.num_users, self.seq_len = (int(hist.shape[0]),
                                        int(hist.shape[1]))
        self.num_rows = int(num_items)
        self.inner = CatalogGradPlan(hist, num_items, fanout=fanout,
                                     name="history")
        # the UNSET->0 clipped matrix the inner plan already baked
        self._hist_dev = self.inner._safe_dev
        U, S = self.num_users, self.seq_len
        inner_reduce = self.inner.segment_reduce

        @jax.custom_vjp
        def take(table, u):
            ids = jnp.take(self._hist_dev, jnp.clip(u, 0, U - 1), axis=0)
            return jnp.take(table, ids, axis=0)

        def take_fwd(table, u):
            return take(table, u), u

        def take_bwd(u, g):
            D = g.shape[-1]
            uc = jnp.clip(u, 0, U - 1)
            # 2-D operand: one scattered row per batch element (S*D
            # contiguous) — measured 6.95 ms vs 8.09 ms for the 3-D form
            # at B=32k on the v5e (tools/histgrad_bench.py)
            gu = jnp.zeros((U, S * D), g.dtype).at[uc].add(
                g.reshape(-1, S * D))
            return (inner_reduce(gu.reshape(U, S, D)),
                    np.zeros(np.shape(u), jax.dtypes.float0))

        take.defvjp(take_fwd, take_bwd)
        self.take = take

    def matches(self, hist_shape, num_items: int) -> bool:
        """Shape gate: (B, S) batch history against this plan's (S, N)."""
        return (len(hist_shape) == 2 and int(hist_shape[1]) == self.seq_len
                and int(num_items) == self.num_rows)

    # identity semantics (may sit in flax module fields), like CatalogGradPlan
    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)


def build_catalog_plans(columns, col_vocabs, specs, fanout: int = 8):
    """Plans for every trainable item-content column.

    columns: {col: (N, L) token ids (np or jnp)}; col_vocabs: {col: vocab
    name}; specs: iterable of EmbedSpec. Frozen tables are skipped (their
    lookup sits under stop_gradient). Mirrors EmbeddingTables._spec
    precedence: feature-keyed table first, then vocab-keyed.
    """
    by_key = {(s.kind, s.name): s for s in specs}
    plans = {}
    for col, arr in columns.items():
        spec = by_key.get(("feature", col)) or by_key.get(
            ("vocab", col_vocabs.get(col)))
        if spec is None or spec.frozen:
            continue
        a = np.asarray(arr)
        if a.ndim != 2:
            continue
        plans[col] = CatalogGradPlan(a, spec.size, fanout=fanout, name=col)
    return plans
