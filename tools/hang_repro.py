"""Reproduce the per-occurrence encode hang with the REAL model graph.

    timeout 300 python tools/hang_repro.py [batch_size] [mode]

mode: off|on (full_catalog_encode). Prints compile+step time on success.
"""
import sys
import time

import jax
import jax.numpy as jnp
import optax

from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.runtime.manager import Manager
from legommenders_tpu.runtime.steps import init_params, make_train_step_folded


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    mode = sys.argv[2] if len(sys.argv) > 2 else "off"
    item_op = sys.argv[3] if len(sys.argv) > 3 else "CNN"
    dropout = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
    user_op = sys.argv[5] if len(sys.argv) > 5 else "Ada"
    data = SyntheticProcessor(
        num_items=65000, num_users=20000, title_len=30, history_len=50,
        vocab_size=30000, inters_per_user=12).as_lego_data()
    model_cfg = {
        "name": "NAML",
        "meta": {"item": item_op, "user": user_op, "predictor": "Dot"},
        "config": {"use_item_content": True, "hidden_size": 64,
                   "use_neg_sampling": True, "neg_count": 4,
                   "full_catalog_encode": mode,
                   "item_page_size": int(sys.argv[7]) if len(sys.argv) > 7 else 0,
                   "item_config": {"dropout": dropout, "kernel_size": 3}},
    }
    m = Manager({}, model_cfg, exp_cfg={"policy": {"batch_size": B}},
                data=data)
    from legommenders_tpu.data.pipeline import TrainBatcher
    tb = TrainBatcher(data, B, neg_count=4, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(tb.epoch(False)).items()}
    print("init...", flush=True)
    params = init_params(m.model, batch, m.contents.columns, seed=0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    rng_impl = sys.argv[6] if len(sys.argv) > 6 else None
    step = make_train_step_folded(m.model, m.contents.columns, opt,
                                  rng_impl=rng_impl)
    print("compiling train step...", flush=True)
    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, batch, 1)
    jax.block_until_ready(loss)
    t1 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, batch, 2)
    jax.block_until_ready(loss)
    t2 = time.perf_counter()
    print(f"OK mode={mode} B={B} op={item_op}/{user_op} do={dropout}  compile={t1-t0:.1f}s step={t2-t1:.4f}s "
          f"loss={float(loss):.4f}", flush=True)


if __name__ == "__main__":
    main()
