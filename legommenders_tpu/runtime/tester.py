"""Tester — test-split evaluation + latency benchmark.

Parity: reference tester.py:46-141 — `test()` computes the metric suite on
the test split; `latency(num_batches)` times each forward (with
block_until_ready for honest device timing, the JAX analogue of the
reference's per-forward latency timer, tester.py:82-105).
"""
from typing import Dict

from legommenders_tpu.runtime.manager import Manager
from legommenders_tpu.utils.logging import get_logger
from legommenders_tpu.utils.timer import Timer


class Tester:
    def __init__(self, manager: Manager, params, log=None):
        self.m = manager
        self.params = params
        self.log = log or get_logger("tester")
        self.evaluator = manager.evaluator()

    def test(self) -> Dict[str, float]:
        res = self.evaluator.evaluate(self.params, "test")
        self.log.info("test: " + ", ".join(
            f"{k} {v:.4f}" for k, v in res.items()))
        return res

    def latency(self, num_batches: int = 100,
                use_cache: bool = True) -> float:
        timer = Timer(activate=True)
        self.evaluator.evaluate(
            self.params, "test", latency_timer=timer,
            use_cache=use_cache and self.evaluator.cache is not None,
            max_batches=num_batches)
        avg_ms = timer.avg_ms("forward")
        self.log.info(f"avg forward latency: {avg_ms:.3f} ms "
                      f"({num_batches} batches)")
        return avg_ms
