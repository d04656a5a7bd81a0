"""Parameter-size CLI (parity: reference sizer.py:43-92): prints trainable
parameter shapes + total M params."""
import sys

from legommenders_tpu.cli.base import BaseLego


class SizerCLI(BaseLego):
    def run(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from legommenders_tpu.runtime.steps import init_params

        m = self.manager
        batch = next(m.train_batcher(self.seed).epoch(shuffle=False))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = init_params(m.model, jb, m.contents.columns, seed=self.seed)
        total = 0
        for path, leaf in jax.tree_util.tree_leaves_with_path(params):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            n = int(np.prod(leaf.shape))
            total += n
            print(f"{name:80s} {tuple(leaf.shape)}")
        print(f"total: {total/1e6:.3f}M params")
        return total


if __name__ == "__main__":
    SizerCLI(sys.argv[1:]).run()
