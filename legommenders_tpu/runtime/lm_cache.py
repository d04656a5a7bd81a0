"""LM layer-split caching: offline lower-layer hidden states for all items.

Parity: reference once_operator.py:101-134 + loader/pager/lm_layer_pager.py
(§3.5 splitter flow) — the frozen lower `tune_from` layers of the LM run
once over every item; the resulting `(N, L, D)` hidden states + `(N, L)`
masks are saved to `cache/<data>/<op>/layer_<k>.npy` / `mask.npy` and, at
train time, live as device arrays gathered by item id inside jit.

NaN scrubbing parity (once_operator.py:118-123): NaN rows are replaced by
random values and their mask reduced to the first position.
"""
import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legommenders_tpu.models.operators.lm_ops import (
    LM_HIDDEN_KEY, LM_MASK_KEY,
)


def cache_dir(data_name: str, operator_name: str, root: str = "cache") -> str:
    return os.path.join(root, data_name, operator_name)


def cache_paths(data_name: str, operator_name: str, layer: int,
                root: str = "cache") -> Tuple[str, str]:
    d = cache_dir(data_name, operator_name, root)
    return (os.path.join(d, f"layer_{layer}.npy"),
            os.path.join(d, "mask.npy"))


def scrub_nans(hidden: np.ndarray, mask: np.ndarray, seed: int = 0):
    """Replace NaN positions with random values; collapse masks of NaN
    items to [1, 0, ...] (reference once_operator.py:118-123)."""
    nan_pos = np.isnan(hidden).any(axis=-1)                 # (N, L)
    if nan_pos.any():
        rng = np.random.default_rng(seed)
        hidden[nan_pos] = rng.random(
            (int(nan_pos.sum()), hidden.shape[-1])).astype(hidden.dtype)
        nan_item = nan_pos.any(axis=-1)
        template = np.zeros_like(mask[0])
        template[0] = 1
        mask[nan_item] = template
    return hidden, mask


def build_lm_hidden(model, params, contents: Dict[str, jnp.ndarray],
                    page_size: int = 256, dtype=np.float32
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the LM lower slice over all items, paged+jitted once."""
    num_items = next(iter(contents.values())).shape[0]

    page_fn = jax.jit(
        lambda p, c: model.apply(p, c, method=model.encode_item_lower))

    P = min(page_size, num_items)
    hiddens, masks = [], []
    for start in range(0, num_items, P):
        ids = np.clip(np.arange(start, start + P), 0, num_items - 1)
        page = {c: jnp.take(a, jnp.asarray(ids), axis=0)
                for c, a in contents.items()}
        h, m = page_fn(params, page)
        hiddens.append(np.asarray(h, dtype))
        masks.append(np.asarray(m, np.int32))
    hidden = np.concatenate(hiddens, axis=0)[:num_items]
    mask = np.concatenate(masks, axis=0)[:num_items]
    return scrub_nans(hidden, mask)


def load_or_build_iisan_cache(model, params, contents, data_name: str,
                              operator_name: str, selected_layers,
                              page_size: int = 256, root: str = "cache",
                              regenerate: bool = False
                              ) -> Dict[str, jnp.ndarray]:
    """IISAN: per-layer mean-pooled states (N, all_layers, D) cached to
    states.npy (reference iisan_operator.py:115-151); the selected-layer
    subset is registered under the lm-hidden content key with a dummy
    length-1 mask."""
    d = cache_dir(data_name, f"{operator_name}iisan", root)
    spath = os.path.join(d, "states.npy")
    if not regenerate and os.path.isfile(spath):
        states = np.load(spath)
    else:
        num_items = next(iter(contents.values())).shape[0]
        page_fn = jax.jit(
            lambda p, c: model.apply(p, c, method=model.encode_item_lower))
        P = min(page_size, num_items)
        pages = []
        for start in range(0, num_items, P):
            ids = np.clip(np.arange(start, start + P), 0, num_items - 1)
            page = {c: jnp.take(a, jnp.asarray(ids), axis=0)
                    for c, a in contents.items()}
            pooled, _mask = page_fn(params, page)
            pages.append(np.asarray(pooled, np.float32))
        states = np.concatenate(pages, axis=0)[:num_items]
        nan_pos = np.isnan(states).any(axis=-1)
        if nan_pos.any():
            rng = np.random.default_rng(0)
            states[nan_pos] = rng.random(
                (int(nan_pos.sum()), states.shape[-1])).astype(states.dtype)
        os.makedirs(d, exist_ok=True)
        np.save(spath, states)
    sel = states[:, selected_layers, :]                 # (N, H_sel, D)
    ones = np.ones((sel.shape[0], 1), np.int32)
    return {LM_HIDDEN_KEY: jnp.asarray(sel),
            LM_MASK_KEY: jnp.asarray(ones)}


def load_or_build_lm_cache(model, params, contents, data_name: str,
                           operator_name: str, layer: int,
                           page_size: int = 256, root: str = "cache",
                           regenerate: bool = False
                           ) -> Dict[str, jnp.ndarray]:
    """Returns the extra content entries {LM_HIDDEN_KEY, LM_MASK_KEY}."""
    hpath, mpath = cache_paths(data_name, operator_name, layer, root)
    if not regenerate and os.path.isfile(hpath) and os.path.isfile(mpath):
        hidden = np.load(hpath)
        mask = np.load(mpath)
        hidden, mask = scrub_nans(hidden, mask)
    else:
        hidden, mask = build_lm_hidden(model, params, contents, page_size)
        os.makedirs(os.path.dirname(hpath), exist_ok=True)
        np.save(hpath, hidden)
        np.save(mpath, mask)
    return {LM_HIDDEN_KEY: jnp.asarray(hidden),
            LM_MASK_KEY: jnp.asarray(mask)}
