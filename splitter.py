"""LM layer pre-caching CLI (parity: reference splitter.py:56-121).

Pre-computes lower-layer hidden states of the item LM for all items:

    python splitter.py --data mind --model bert-naml --layers 0+6+11

Negative layer indices wrap (reference splitter.py:64-75). Each requested
layer k caches the hidden states after layers 0..k-1 to
cache/<data>/<op>/layer_k.npy (+ shared mask.npy).
"""
import sys

from legommenders_tpu.cli.base import BaseLego


class SplitterCLI(BaseLego):
    def run(self):
        import dataclasses
        import jax.numpy as jnp
        from legommenders_tpu.models.operators.lm_ops import LMOperator
        from legommenders_tpu.runtime.lm_cache import load_or_build_lm_cache
        from legommenders_tpu.runtime.steps import init_params

        m = self.manager
        op = m.model.item_op
        assert isinstance(op, LMOperator), (
            "--model must use an LM item operator (reference splitter.py:66)")
        layers_arg = str(self.cli.get("layers", op.resolved_tune_from or 1))
        layers = [int(x) for x in layers_arg.split("+")]
        layers = [l if l >= 0 else op.num_hidden_layers + l for l in layers]

        batch = next(m.train_batcher(self.seed).epoch(shuffle=False))
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        for layer in layers:
            # rebuild the model with tune_from=layer so the lower slice
            # covers exactly layers 0..layer-1
            lego_cfg = dataclasses.replace(m.lego_cfg)
            lego_cfg.item_config = {**m.lego_cfg.item_config,
                                    "tune_from": layer}
            model, contents, _ = lego_cfg.build()
            params = init_params(model, jb, contents.columns,
                                 seed=self.seed)
            load_or_build_lm_cache(
                model, params, dict(contents.columns),
                data_name=m.data.name, operator_name=op.transformer_key,
                layer=layer, page_size=m.lego_cfg.cache_page_size,
                regenerate=bool(self.cli.get("regenerate")))
            self.log.info(f"cached layer {layer}")


if __name__ == "__main__":
    SplitterCLI(sys.argv[1:]).run()
