"""Training CLI (parity: reference trainer.py:319-322).

    python trainer.py --data synthetic --model naml --exp default \
        --hidden_size 64 --lr 0.001 --batch_size 64
"""
import sys

from legommenders_tpu.cli.base import BaseLego
from legommenders_tpu.runtime.trainer import Trainer


class TrainerCLI(BaseLego):
    def run(self):
        import sys as _sys
        trainer = Trainer(self.manager, seed=self.seed,
                          ckpt_path=self.ph.ckpt_path, log=self.log,
                          session=self.cli.get("session"),
                          command=" ".join(_sys.argv[1:]),
                          signature=self.ph.signature)
        load_sign = (self.cfg.exp.load.sign
                     if self.cfg.exp and self.cfg.exp.load else None)
        if load_sign:
            from legommenders_tpu.runtime.checkpoint import load_checkpoint
            trainer.init()
            trainer.params, _, _ = load_checkpoint(
                self.ph.dir + f"/{load_sign}.ckpt", trainer.params,
                model_only=True)
        trainer.train()
        results = trainer.test()
        import jax
        if jax.process_index() == 0:  # multi-host: one writer
            with open(self.ph.result_path, "w") as f:
                f.write(",".join(results.keys()) + "\n")
                f.write(",".join(f"{v:.6f}" for v in results.values()) + "\n")
        return results


if __name__ == "__main__":
    TrainerCLI(sys.argv[1:]).run()
