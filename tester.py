"""Test/latency CLI (parity: reference tester.py:110-121).

    python tester.py --data synthetic --model naml --load_sign <sig>
    python tester.py ... --latency --num_batches 100
"""
import sys

from legommenders_tpu.cli.base import BaseLego
from legommenders_tpu.runtime.checkpoint import load_checkpoint
from legommenders_tpu.runtime.steps import init_params
from legommenders_tpu.runtime.tester import Tester


class TesterCLI(BaseLego):
    def run(self):
        import jax.numpy as jnp

        m = self.manager
        batch = next(m.train_batcher(self.seed).epoch(shuffle=False))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        params = init_params(m.model, jb, m.contents.columns, seed=self.seed)

        load_sign = self.cli.get("load_sign")
        if load_sign:
            params, _, _ = load_checkpoint(
                f"{self.ph.dir}/{load_sign}.ckpt", params, model_only=True)
        else:
            self.log.info("no --load_sign given: evaluating fresh params")

        tester = Tester(m, params, log=self.log)
        trace_dir = self.cli.get("trace")
        if trace_dir:
            # xprof/tensorboard-viewable device trace of the eval pass —
            # the TPU-native upgrade of the reference's latency timer
            # (SURVEY §5 tracing/profiling)
            import jax
            with jax.profiler.trace(str(trace_dir)):
                if self.cli.get("latency"):
                    tester.latency(int(self.cli.get("num_batches", 100)))
                results = tester.test()
            self.log.info(f"profiler trace written to {trace_dir}")
        else:
            if self.cli.get("latency"):
                tester.latency(int(self.cli.get("num_batches", 100)))
            results = tester.test()
        with open(self.ph.result_path, "w") as f:
            f.write(",".join(results.keys()) + "\n")
            f.write(",".join(f"{v:.6f}" for v in results.values()) + "\n")
        return results


if __name__ == "__main__":
    TesterCLI(sys.argv[1:]).run()
