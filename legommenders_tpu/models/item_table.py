"""Device-resident item content: the TPU-first replacement for the
reference's host-side Resampler item cache (loader/resampler.py:113-126).

Every item-input column is a dense `(num_items, L)` int32 device array
(UNSET = -1 padding kept for mask derivation). A batch carries only item
IDs; `gather(ids)` pulls the token rows inside `jit`, so content injection
is one XLA gather instead of per-sample python dict assembly in DataLoader
workers.
"""
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from legommenders_tpu.data.dataset import LegoData
from legommenders_tpu.data.token_store import UNSET


class ItemContentTable:
    def __init__(self, columns: Dict[str, jnp.ndarray],
                 col_vocabs: Dict[str, str]):
        self.columns = columns          # col -> (N, L) int32 (UNSET padded)
        self.col_vocabs = col_vocabs    # col -> vocab name
        first = next(iter(columns.values()))
        self.num_items = int(first.shape[0])

    @classmethod
    def from_data(cls, data: LegoData,
                  inputs: Optional[List[Tuple[str, Optional[int]]]] = None
                  ) -> "ItemContentTable":
        cols, vocabs = {}, {}
        for col, max_len in (inputs or data.item_inputs):
            arr = data.items[col]
            if arr.ndim == 1:
                arr = arr[:, None]
            if max_len is not None and arr.shape[1] != max_len:
                if arr.shape[1] > max_len:
                    arr = arr[:, :max_len]
                else:
                    pad = np.full((arr.shape[0], max_len - arr.shape[1]),
                                  UNSET, np.int32)
                    arr = np.concatenate([arr, pad], axis=1)
            cols[col] = jnp.asarray(arr.astype(np.int32))
            vocabs[col] = data.items.vocab_name(col) or col
        return cls(cols, vocabs)

    def gather(self, item_ids: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """ids (...,) -> {col: (..., L) int32}; stays UNSET-padded."""
        safe = jnp.clip(item_ids, 0, self.num_items - 1)
        return {c: jnp.take(a, safe, axis=0) for c, a in self.columns.items()}

    def page(self, start: int, size: int) -> Dict[str, jnp.ndarray]:
        ids = jnp.arange(start, start + size)
        return self.gather(ids)

    def seq_lens(self) -> Dict[str, int]:
        return {c: int(a.shape[1]) for c, a in self.columns.items()}
