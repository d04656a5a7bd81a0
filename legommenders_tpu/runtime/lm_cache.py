"""LM layer-split caching: offline lower-layer hidden states for all items.

Parity: reference once_operator.py:101-134 + loader/pager/lm_layer_pager.py
(§3.5 splitter flow) — the frozen lower `tune_from` layers of the LM run
once over every item; the resulting `(N, L, D)` hidden states + `(N, L)`
masks are saved under `cache/<data>/<op>/` and, at train time, live as
device arrays gathered by item id inside jit.

Cache files are additionally keyed by a fingerprint of the lower-slice
weights, so re-initialized / differently-loaded LMs never silently reuse
stale states (the reference keys only by layer and can go stale the same
way).

NaN scrubbing parity (once_operator.py:118-123): NaN rows are replaced by
random values and their mask reduced to the first position.
"""
import hashlib
import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from legommenders_tpu.models.operators.lm_ops import (
    LM_HIDDEN_KEY, LM_MASK_KEY,
)


def cache_dir(data_name: str, operator_name: str, root: str = "cache") -> str:
    return os.path.join(root, data_name, operator_name)


def weights_fingerprint(params, subtree=("params", "item_op"),
                        extra: str = "") -> str:
    """Short digest of the item operator's param values (samples each leaf's
    first bytes — enough to distinguish inits/checkpoints cheaply).
    `extra` folds in arch knobs that change the lower slice's OUTPUT with
    identical weights (e.g. gelu_approximate)."""
    node = params
    for key in subtree:
        if isinstance(node, dict) and key in node:
            node = node[key]
    h = hashlib.md5()
    h.update(extra.encode())
    for path, leaf in sorted(
            jax.tree_util.tree_leaves_with_path(node),
            key=lambda kv: str(kv[0])):
        arr = np.asarray(leaf).ravel()
        h.update(str(path).encode())
        h.update(arr[:8].tobytes())
    return h.hexdigest()[:10]


def arch_key(op) -> str:
    """Output-affecting arch knobs of the item operator not captured by its
    weights. lm_dtype matters: the lower slice computes in it, so toggling
    f32<->bf16 between runs changes the cached values at ~rounding scale —
    without it in the key the fingerprint would silently reuse the other
    precision's cache."""
    dt = jnp.dtype(getattr(op, "lm_dtype", jnp.float32)).name
    # fused_qkv is exact math but XLA tiles the concatenated GEMM
    # differently — bf16 rounding can differ at epsilon scale; keep the
    # caches separate so toggling it never mixes precisions of truth
    return (f"gelu_approx={bool(getattr(op, 'gelu_approximate', False))},"
            f"lm_dtype={dt},"
            f"fused_qkv={bool(getattr(op, 'fused_qkv', False))}")


def scrub_nans(hidden: np.ndarray, mask: Optional[np.ndarray] = None,
               seed: int = 0):
    """Replace NaN positions with random values; collapse masks of NaN
    items to [1, 0, ...] (reference once_operator.py:118-123)."""
    nan_pos = np.isnan(hidden).any(axis=-1)
    if nan_pos.any():
        rng = np.random.default_rng(seed)
        hidden[nan_pos] = rng.random(
            (int(nan_pos.sum()), hidden.shape[-1])).astype(hidden.dtype)
        if mask is not None:
            nan_item = nan_pos.reshape(mask.shape[0], -1).any(axis=-1)
            template = np.zeros_like(mask[0])
            template[0] = 1
            mask[nan_item] = template
    return hidden, mask


def _paged_apply(page_fn: Callable, contents: Dict[str, jnp.ndarray],
                 page_size: int):
    """Run `page_fn(page_contents)` over fixed-size item pages; returns the
    list of (np arrays) page outputs trimmed to num_items by the caller."""
    num_items = next(iter(contents.values())).shape[0]
    P = min(page_size, num_items)
    pages = []
    for start in range(0, num_items, P):
        ids = np.clip(np.arange(start, start + P), 0, num_items - 1)
        page = {c: jnp.take(a, jnp.asarray(ids), axis=0)
                for c, a in contents.items()}
        pages.append(page_fn(page))
    return pages, num_items


def build_lm_hidden(model, params, contents: Dict[str, jnp.ndarray],
                    page_size: int = 256, dtype=np.float32
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """Run the LM lower slice over all items, paged+jitted once."""
    page_fn = jax.jit(
        lambda p, c: model.apply(p, c, method=model.encode_item_lower))
    pages, n = _paged_apply(lambda c: page_fn(params, c), contents,
                            page_size)
    hidden = np.concatenate([np.asarray(h, dtype) for h, _ in pages])[:n]
    mask = np.concatenate([np.asarray(m, np.int32) for _, m in pages])[:n]
    return scrub_nans(hidden, mask)


def load_or_build_lm_cache(model, params, contents, data_name: str,
                           operator_name: str, layer: int,
                           page_size: int = 256, root: str = "cache",
                           regenerate: bool = False, device_dtype=None
                           ) -> Dict[str, jnp.ndarray]:
    """Returns the extra content entries {LM_HIDDEN_KEY, LM_MASK_KEY}.

    `device_dtype` sets the dtype of the device-resident hidden states
    (the on-disk cache stays f32): bf16 halves HBM for the (N, L, D)
    catalog cache — 6GB -> 3GB at MIND scale with BERT-base — and the
    upper slice computes in its own `lm_dtype` anyway."""
    sig = weights_fingerprint(params, extra=arch_key(model.item_op))
    d = cache_dir(data_name, operator_name, root)
    hpath = os.path.join(d, f"layer_{layer}.{sig}.npy")
    mpath = os.path.join(d, f"mask.{sig}.npy")
    if not regenerate and os.path.isfile(hpath) and os.path.isfile(mpath):
        # caches are scrubbed BEFORE saving (build_lm_hidden) — mmap and
        # ship straight to device, no host copy / re-scrub of the multi-GB
        # array
        hidden = np.load(hpath, mmap_mode="r")
        mask = np.load(mpath)
    else:
        hidden, mask = build_lm_hidden(model, params, contents, page_size)
        os.makedirs(d, exist_ok=True)
        np.save(hpath, hidden)
        np.save(mpath, mask)
    # pad the token dim to a sublane multiple (8) when shipping to device:
    # an unaligned L (e.g. 31) makes every consuming executable re-tile the
    # whole (N, L, D) operand into padded layout — a 3 GB HLO-temp copy at
    # MIND/BERT-base scale, measured the difference between the "ffn" remat
    # policy fitting the v5e HBM or not. Padded positions carry mask 0, so
    # attention/pooling never read them. On-disk cache stays unpadded.
    hidden_d = jnp.asarray(hidden, dtype=device_dtype)
    mask = np.asarray(mask)
    pad = (-hidden_d.shape[1]) % 8
    if pad:
        hidden_d = jnp.pad(hidden_d, ((0, 0), (0, pad), (0, 0)))
        mask = np.pad(mask, ((0, 0), (0, pad)))
    return {LM_HIDDEN_KEY: hidden_d,
            LM_MASK_KEY: jnp.asarray(mask)}


def load_or_build_iisan_cache(model, params, contents, data_name: str,
                              operator_name: str, selected_layers,
                              page_size: int = 256, root: str = "cache",
                              regenerate: bool = False
                              ) -> Dict[str, jnp.ndarray]:
    """IISAN: per-layer mean-pooled states (N, all_layers, D) cached to
    states.npy (reference iisan_operator.py:115-151); the selected-layer
    subset is registered under the lm-hidden content key with a dummy
    length-1 mask."""
    sig = weights_fingerprint(params, extra=arch_key(model.item_op))
    d = cache_dir(data_name, f"{operator_name}iisan", root)
    spath = os.path.join(d, f"states.{sig}.npy")
    if not regenerate and os.path.isfile(spath):
        states = np.load(spath)
        states, _ = scrub_nans(states)
    else:
        page_fn = jax.jit(
            lambda p, c: model.apply(p, c, method=model.encode_item_lower))
        pages, n = _paged_apply(lambda c: page_fn(params, c), contents,
                                page_size)
        states = np.concatenate(
            [np.asarray(pooled, np.float32) for pooled, _m in pages])[:n]
        states, _ = scrub_nans(states)
        os.makedirs(d, exist_ok=True)
        np.save(spath, states)
    sel = states[:, list(selected_layers), :]           # (N, H_sel, D)
    ones = np.ones((sel.shape[0], 1), np.int32)
    return {LM_HIDDEN_KEY: jnp.asarray(sel),
            LM_MASK_KEY: jnp.asarray(ones)}
