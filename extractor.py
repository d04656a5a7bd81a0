"""Embedding-dump CLI (parity: reference extractor.py:58-126): exports the
trained item/user representation matrices to .npy via the fast-eval cache."""
import os
import sys

import numpy as np

from legommenders_tpu.cli.base import BaseLego
from legommenders_tpu.runtime.checkpoint import load_checkpoint
from legommenders_tpu.runtime.steps import init_params


class ExtractorCLI(BaseLego):
    def run(self):
        import jax.numpy as jnp

        m = self.manager
        assert m.cache is not None, (
            "extractor requires a cacheable model (use_fast_eval + "
            "caching-capable operators)")
        batch = next(m.train_batcher(self.seed).epoch(shuffle=False))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = init_params(m.model, jb, m.contents.columns, seed=self.seed)
        load_sign = self.cli.get("load_sign")
        if load_sign:
            params, _, _ = load_checkpoint(
                f"{self.ph.dir}/{load_sign}.ckpt", params, model_only=True)
        m.cache.cache(params)
        out_dir = self.cli.get("export_dir", "data/export")
        os.makedirs(out_dir, exist_ok=True)
        item_path = os.path.join(out_dir, f"{self.ph.signature}.items.npy")
        user_path = os.path.join(out_dir, f"{self.ph.signature}.users.npy")
        np.save(item_path, np.asarray(m.cache.item_repr))
        np.save(user_path, np.asarray(m.cache.user_repr))
        print(f"saved {item_path} {np.asarray(m.cache.item_repr).shape}, "
              f"{user_path} {np.asarray(m.cache.user_repr).shape}")


if __name__ == "__main__":
    ExtractorCLI(sys.argv[1:]).run()
