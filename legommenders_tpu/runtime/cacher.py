"""Fast-eval representation caches, jit-paged.

Parity: reference loader/cacher/* + loader/pager/* — before evaluation, all
item representations (num_items, D) and all user representations
(num_users, D) are precomputed so each eval forward is a pair of gathers +
the predictor (base_lego.py:349-398 hot loop).

TPU redesign: pages are fixed-size jitted calls (one compile), the tail page
is padded; outputs land in device arrays. The reference pages through python
dict stacking on host (base_pager.py:130-189).
"""
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _pad_ids(n: int, page: int) -> int:
    return ((n + page - 1) // page) * page


class ReprCache:
    """Holds item/user representation caches for one model+params."""

    def __init__(self, model, item_contents: Dict[str, jnp.ndarray],
                 history: np.ndarray, page_size: int = 512):
        self.model = model
        self.item_contents = item_contents
        self.history = history  # (num_users, S) UNSET-padded
        self.page_size = page_size
        self.item_repr: Optional[jnp.ndarray] = None
        self.user_repr: Optional[jnp.ndarray] = None

        self._item_page_fn = jax.jit(
            lambda params, contents: model.apply(
                params, contents, method=model.encode_item_page))
        self._user_page_fn = jax.jit(
            lambda params, clicks, mask: model.apply(
                params, clicks, mask, method=model.encode_user))
        self._score_fn = jax.jit(
            lambda params, u, i: model.apply(
                params, u, i, method=model.score_cached))

    @property
    def active(self) -> bool:
        return self.item_repr is not None and self.user_repr is not None

    # ------------------------------------------------------------------ #
    def build_item_cache(self, params) -> jnp.ndarray:
        num_items = next(iter(self.item_contents.values())).shape[0]
        P = min(self.page_size, _pad_ids(num_items, 8))
        total = _pad_ids(num_items, P)
        pages = []
        for start in range(0, total, P):
            ids = np.clip(np.arange(start, start + P), 0, num_items - 1)
            contents = {c: jnp.take(a, jnp.asarray(ids), axis=0)
                        for c, a in self.item_contents.items()}
            pages.append(self._item_page_fn(params, contents))
        self.item_repr = jnp.concatenate(pages, axis=0)[:num_items]
        return self.item_repr

    def build_user_cache(self, params) -> jnp.ndarray:
        assert self.item_repr is not None, "build_item_cache first"
        from legommenders_tpu.data.token_store import UNSET

        num_users = self.history.shape[0]
        P = min(self.page_size, _pad_ids(num_users, 8))
        total = _pad_ids(num_users, P)
        pages = []
        for start in range(0, total, P):
            rows = np.clip(np.arange(start, start + P), 0, num_users - 1)
            hist = self.history[rows]
            mask = (hist != UNSET).astype(np.int32)
            safe = np.where(hist == UNSET, 0, hist)
            clicks = jnp.take(self.item_repr, jnp.asarray(safe), axis=0)
            pages.append(self._user_page_fn(params, clicks,
                                            jnp.asarray(mask)))
        self.user_repr = jnp.concatenate(pages, axis=0)[:num_users]
        return self.user_repr

    def cache(self, params):
        self.build_item_cache(params)
        self.build_user_cache(params)
        return self

    def clean(self):
        """Drop caches at train-phase entry (reference repr_cacher.py:90-101)."""
        self.item_repr = None
        self.user_repr = None

    # ------------------------------------------------------------------ #
    def make_cached_eval_step(self) -> Callable:
        """jitted step(params, item_repr, user_repr, batch) -> (B, K) scores."""

        def step(params, item_repr, user_repr, batch):
            u = jnp.take(user_repr, batch["user_id"], axis=0)       # (B, D)
            i = jnp.take(item_repr,
                         jnp.clip(batch["candidates"], 0,
                                  item_repr.shape[0] - 1), axis=0)  # (B, K, D)
            return self._score_fn(params, u, i)

        return jax.jit(step)
