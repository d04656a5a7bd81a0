"""Legommender — the end-to-end composed model.

Parity: reference model/legommender.py:55-263 — composes an optional item
(content) operator, a user (behavior) operator and a click predictor;
supports matching with negative samples (scores B×(K+1), CE against label
0) and pointwise ranking (B×1, BCE); item content may come from content
encoding, from an ID embedding table (`use_item_content=false`), or from
fast-eval caches.

TPU-first redesign:
  * `__call__(batch, item_contents)` is a pure function — batch is a dict
    of fixed-shape int arrays, item_contents the device token matrices;
    candidate+history content is gathered and encoded in ONE fused item-op
    pass (the reference pages through python loops, legommender.py:174-190);
  * cached-eval paths are separate methods (`encode_item_page`,
    `encode_user`, `score_cached`) jitted by the runtime cacher;
  * loss lives in the runtime train step, the module returns scores.
"""
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from legommenders_tpu.models.embedding import EmbeddingTables, EmbedSpec
from legommenders_tpu.models.inputers.base import BaseInputer
from legommenders_tpu.models.operators.base import BaseOperator
from legommenders_tpu.models.predictors.base import BasePredictor


class Legommender(nn.Module):
    # embedding hub construction args
    embed_specs: Tuple[EmbedSpec, ...] = ()
    pretrained: dict = None
    # components (unbound module templates)
    item_op: Optional[BaseOperator] = None
    user_op: BaseOperator = None
    predictor: BasePredictor = None
    item_inputer: Optional[BaseInputer] = None
    user_inputer: Optional[BaseInputer] = None  # flatten / non-content path
    # column names (static)
    candidate_col: str = "candidates"
    history_col: str = "history"
    mask_col: str = "mask"
    user_col: str = "user_id"
    # flags
    use_item_content: bool = True
    use_neg_sampling: bool = True
    neg_count: int = 4
    flatten_mode: bool = False
    # flatten-mode user inputers that read user-store columns straight from
    # the batch (SemanticMix) list those batch keys here
    user_batch_cols: Tuple[str, ...] = ()
    item_id_vocab: str = "item_id"   # ID-embedding path vocab
    # bound on flattened occurrences per item-op pass; 0 = no paging
    # (reference lego_config.py:114-115, legommender.py:174-190)
    item_page_size: int = 0
    # backward policy for the paged scan: "full" rematerializes each page
    # (lowest memory, ~33% recompute), "dots" saves matmul outputs and
    # recomputes only elementwise ops (jax dots_saveable), "none" saves
    # every page's activations (fastest, highest memory). NB: the scan
    # stacks saved residuals across ALL pages, so "dots"/"none" memory is
    # independent of page size — at bench_lm scale (16 pages x 4096x31
    # BERT-base tokens) "dots" wants 78GB HBM; they are small-model knobs
    item_page_remat: str = "full"
    # "auto": encode the WHOLE catalog once per step and gather when that
    # is cheaper than encoding B·(K+S) occurrences — a TPU-first win with
    # no reference counterpart (identical gradients: unused rows get zero
    # cotangent; duplicate occurrences accumulate through the gather
    # transpose exactly as per-occurrence encoding would).
    full_catalog_encode: str = "auto"   # "auto" | "on" | "off"
    # col -> ops/catalog_grad.CatalogGradPlan: scatter-free gather-reduce
    # embedding-grad segment-sum for the static catalog lookup (built by
    # LegoConfig from the device token matrices; None disables the rewrite)
    catalog_plans: Optional[dict] = None
    # ops/catalog_grad.HistoryGradPlan: scatter-light backward for the
    # history-repr gather in full-catalog mode (the largest single op of
    # the NAML backward — see the class docstring). Engaged only when the
    # batch verifiably carries verbatim history-matrix rows: training
    # mode + a user_id column + matching (S, N); forward is identical
    catalog_history_plan: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.eh = EmbeddingTables(
            specs=self.embed_specs, pretrained=self.pretrained or {},
            dtype=self.dtype)

    # ------------------------------------------------------------------ #
    # item side                                                          #
    # ------------------------------------------------------------------ #
    def _encode_flat(self, flat: Dict[str, jnp.ndarray],
                     training: bool = False,
                     catalog: bool = False) -> jnp.ndarray:
        """One inputer+item_op pass over already-flattened (M, ...) inputs."""
        from legommenders_tpu.models.operators.lm_ops import (
            LM_HIDDEN_KEY, LM_MASK_KEY,
        )
        if LM_HIDDEN_KEY in flat:
            return self.item_op(flat[LM_HIDDEN_KEY], flat[LM_MASK_KEY],
                                training=training)
        eh = self.eh
        if catalog and self.catalog_plans:
            # static catalog tokens: reroute the lookup backward through
            # gather-reduce segment-sums (forward identical). A plan only
            # applies if the runtime column is verifiably the matrix it was
            # baked from (same object or same content hash) — a post-build
            # column swap falls back to the plain lookup
            from legommenders_tpu.models.embedding import PlannedTables
            from legommenders_tpu.ops import catalog_grad
            live = {c: p for c, p in self.catalog_plans.items()
                    if c in flat and p.matches_source(flat[c])}
            dead = [c for c in self.catalog_plans
                    if c in flat and c not in live]
            catalog_grad.record_trace(live, dead)  # trace-time, not per-step
            if dead:
                from legommenders_tpu.utils.logging import get_logger
                get_logger("legommender").warning(
                    f"catalog-grad plan INACTIVE for columns {dead}: "
                    f"runtime column is not the baked matrix — embedding "
                    f"backward falls back to the plain lookup transpose")
            if live:
                eh = PlannedTables(self.eh, live)
        emb, mask = self.item_inputer.get_embeddings(eh, flat, training)
        return self.item_op(emb, mask, training=training)

    def encode_item_content(self, contents: Dict[str, jnp.ndarray],
                            training: bool = False,
                            catalog: bool = False) -> jnp.ndarray:
        """contents: {col: (..., L)} token ids -> (..., D) item vectors.

        Leading dims are flattened for the operator pass and restored
        (the reference's Shaper 3D<->2D, utils/shaper.py). In lm-cache
        mode contents carry precomputed hidden states instead of token ids
        (reference legommender.py:160-171).

        `item_page_size` bounds encoder activation memory by paging the
        flattened occurrences through a lax.scan with per-page remat
        (reference legommender.py:174-190, lego_config.py:114-115 — but
        the torch loop only bounds FORWARD memory; the scan+remat here
        bounds the backward too, so full-LM training can't OOM on the
        item pass)."""
        from legommenders_tpu.models.operators.lm_ops import LM_HIDDEN_KEY

        lm_mode = LM_HIDDEN_KEY in contents
        first = (contents[LM_HIDDEN_KEY] if lm_mode
                 else next(iter(contents.values())))
        lead = first.shape[:-2] if lm_mode else first.shape[:-1]
        flat = {}
        for c, a in contents.items():
            tail = a.shape[len(lead):]
            flat[c] = a.reshape((-1,) + tail)
        M = first.reshape((-1,) + first.shape[len(lead):]).shape[0]

        P = int(self.item_page_size or 0)
        if P > 0 and M > P:
            out = self._encode_paged(flat, M, P, training, catalog)
        else:
            out = self._encode_flat(flat, training, catalog)
        # rank-preserving restore: per-item outputs may be vectors (D) or
        # stacks (Si, D) — semantic-code operators keep their trailing rank
        return out.reshape(*lead, *out.shape[1:])

    def _encode_paged(self, flat: Dict[str, jnp.ndarray], M: int, P: int,
                      training: bool, catalog: bool) -> jnp.ndarray:
        """lax.scan over fixed-size pages of the flattened occurrences.

        Static shapes, params broadcast across pages, per-page dropout
        rngs, and nn.remat so only one page's activations are live in the
        backward. Pages are GATHERED inside the scan body (clipped ids,
        tail rows re-encode the last row and are sliced off) instead of
        reshaping the contents into a (n_pages, P, ...) xs array — the
        reshape materialized a full HLO-temp COPY of the contents (+2.9 GB
        at the 65k-item LM cache geometry, the difference between the
        "ffn" remat policy fitting HBM or not). Catalog gradient plans are
        shape-bound to the full matrix, so they do not apply under paging
        (each page does its own lookup)."""
        n_pages = -(-M // P)

        def body(mdl, carry, pidx):
            ids = jnp.clip(pidx * P + jnp.arange(P), 0, M - 1)
            page = {c: jnp.take(a, ids, axis=0) for c, a in flat.items()}
            return carry, mdl._encode_flat(page, training=training,
                                           catalog=False)

        import jax
        if self.item_page_remat == "none":
            wrapped = body
        elif self.item_page_remat == "dots":
            wrapped = nn.remat(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.dots_saveable)
        elif self.item_page_remat == "ffn":
            # selective residual saving (round-5 MFU lever): keep ONLY the
            # per-layer FFN second-GEMM outputs (lm/layers.FFN_OUT_TAG) as
            # residuals — tokens x D x n_layers bf16 total, page-count
            # invariant — and rematerialize everything else. Cuts the
            # widest GEMM out of the backward recompute where "dots"
            # (all GEMM outputs, 72.7 GB at bench_lm geometry) cannot fit.
            from legommenders_tpu.models.lm.layers import FFN_OUT_TAG
            wrapped = nn.remat(
                body, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    FFN_OUT_TAG))
        else:
            wrapped = nn.remat(body, prevent_cse=False)
        _, ys = nn.scan(
            wrapped,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0,
        )(self, (), jnp.arange(n_pages))
        out = ys.reshape((n_pages * P,) + ys.shape[2:])
        return out[:M]

    def encode_item_lower(self, contents: Dict[str, jnp.ndarray],
                          training: bool = False):
        """Offline LM split: inputer embeddings -> lower-layer hidden
        states (splitter path, reference once_operator.py:211-234).
        Returns (hidden (N, L, D), mask (N, L))."""
        emb, mask = self.item_inputer.get_embeddings(self.eh, contents,
                                                     training)
        hidden = self.item_op.encode_lower(emb, mask, training=training)
        return hidden, mask

    def encode_item_page(self, contents: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        """Cache-building entry: one page of items -> (P, D), eval mode."""
        return self.encode_item_content(contents, training=False)

    def item_id_embedding(self, item_ids: jnp.ndarray,
                          training: bool = False) -> jnp.ndarray:
        return self.eh.embed(item_ids, self.item_id_vocab,
                             col_name=self.history_col, training=training)

    # ------------------------------------------------------------------ #
    # user side                                                          #
    # ------------------------------------------------------------------ #
    def encode_user(self, clicks: jnp.ndarray, mask: jnp.ndarray,
                    training: bool = False) -> jnp.ndarray:
        """clicks (B, S, D) click vectors + mask (B, S) -> user repr."""
        return self.user_op(clicks, mask, training=training)

    def encode_user_flatten(self, contents: Dict[str, jnp.ndarray],
                            training: bool = False) -> jnp.ndarray:
        """Flatten-mode: user op consumes the raw flattened history
        sequence through its own inputer."""
        emb, mask = self.user_inputer.get_embeddings(self.eh, contents, training)
        return self.user_op(emb, mask, training=training)

    # ------------------------------------------------------------------ #
    # initialization                                                     #
    # ------------------------------------------------------------------ #
    def warmup(self, batch, item_contents, training: bool = False):
        """Param-creation trace covering every runtime path: the standard
        forward plus (for layer-split LMs) the offline lower slice, so a
        single init produces the complete param tree."""
        out = self(batch, item_contents, training=training)
        if (self.item_op is not None
                and getattr(self.item_op, "use_lm_cache", False)):
            small = {c: a[:1] for c, a in item_contents.items()}
            self.encode_item_lower(small, training=training)
        return out

    # ------------------------------------------------------------------ #
    # scoring                                                            #
    # ------------------------------------------------------------------ #
    def score_cached(self, user_repr: jnp.ndarray,
                     item_repr: jnp.ndarray) -> jnp.ndarray:
        """Fast-eval path: precomputed reprs -> scores (B, K)."""
        return self.predictor(user_repr, item_repr, training=False)

    def score(self, user_repr: jnp.ndarray, item_repr: jnp.ndarray,
              training: bool = False) -> jnp.ndarray:
        """Predictor pass with an explicit training flag — the composable
        entry for externally-orchestrated forwards (parallel/catalog.py
        rebuilds the catalog branch of __call__ around a sharded encode)."""
        return self.predictor(user_repr, item_repr, training=training)

    # ------------------------------------------------------------------ #
    # full forward                                                       #
    # ------------------------------------------------------------------ #
    def __call__(self, batch: Dict[str, jnp.ndarray],
                 item_contents: Optional[Dict[str, jnp.ndarray]] = None,
                 training: bool = False) -> jnp.ndarray:
        """Returns raw scores (B, K); K=1+neg_count (matching) or 1
        (ranking)."""
        cand_ids = batch[self.candidate_col]            # (B, K)
        B, K = cand_ids.shape
        hist_ids = batch[self.history_col]              # (B, S)
        S = hist_ids.shape[1]
        click_mask = batch[self.mask_col]               # (B, S)

        if self.use_item_content:
            num_items = next(iter(item_contents.values())).shape[0]
            safe_cand = jnp.clip(cand_ids, 0, num_items - 1)
            if self.flatten_mode:
                cand = {c: jnp.take(a, safe_cand, axis=0)
                        for c, a in item_contents.items()}
                item_repr = self.encode_item_content(cand, training)
                if self.user_batch_cols:
                    # user side reads its own batch columns (SemanticMix)
                    u_contents = {c: batch[c] for c in self.user_batch_cols}
                    user_repr = self.encode_user_flatten(u_contents, training)
                else:
                    hist_contents = {c: jnp.take(a, jnp.clip(hist_ids, 0, num_items - 1), axis=0)
                                     for c, a in item_contents.items()}
                    # mask out padded clicks at the token level
                    hist_contents = {
                        c: jnp.where(click_mask[..., None] > 0, a, -1)
                        for c, a in hist_contents.items()}
                    user_repr = self.encode_user_flatten(hist_contents, training)
            else:
                # auto prefers the catalog pass up to 2x the occurrence
                # count: each encoded row costs the same, catalog encodes
                # every item exactly once (occurrences are gathers), and
                # the catalog lookup backward can use the precomputed
                # gather-reduce plan. (The former "per-occurrence compiler
                # hang" was root-caused to threefry dropout keys folded in
                # a donated step — see runtime/steps.default_rng_impl.)
                use_catalog = self.full_catalog_encode == "on" or (
                    self.full_catalog_encode == "auto"
                    and num_items <= 2 * B * (K + S))
                if use_catalog:
                    # encode every item once, then gather occurrences
                    all_reprs = self.encode_item_content(
                        item_contents, training, catalog=True)  # (N, D)
                    item_repr = jnp.take(all_reprs, safe_cand, axis=0)
                    hp = self.catalog_history_plan
                    uid = batch.get("user_id")
                    use_hp = (hp is not None and training
                              and uid is not None
                              and hp.matches(hist_ids.shape, num_items))
                    from legommenders_tpu.ops import catalog_grad
                    catalog_grad.record_history(use_hp)  # trace-time
                    if use_hp:
                        # identical ids (plan bakes the same UNSET->0
                        # clipped matrix the pipelines gather from);
                        # backward avoids the B*S-row dynamic scatter
                        clicks = hp.take(all_reprs, uid)
                    else:
                        clicks = jnp.take(
                            all_reprs,
                            jnp.clip(hist_ids, 0, num_items - 1), axis=0)
                else:
                    # one fused item-op pass over candidates + clicks
                    safe_hist = jnp.clip(hist_ids, 0, num_items - 1)
                    all_ids = jnp.concatenate(
                        [safe_cand.reshape(-1), safe_hist.reshape(-1)])
                    contents = {c: jnp.take(a, all_ids, axis=0)
                                for c, a in item_contents.items()}
                    reprs = self.encode_item_content(contents, training)
                    item_repr = reprs[: B * K].reshape(B, K, -1)
                    clicks = reprs[B * K:].reshape(B, S, -1)
                user_repr = self.encode_user(clicks, click_mask, training)
        else:
            item_repr = self.item_id_embedding(cand_ids, training)   # (B, K, D)
            clicks = self.item_id_embedding(hist_ids, training)      # (B, S, D)
            user_repr = self.encode_user(clicks, click_mask, training)

        return self.predictor(user_repr, item_repr, training=training)
