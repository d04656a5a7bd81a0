"""Benchmark: train throughput (impressions/sec/chip) on the flagship model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference handbook NAML run implies ~15k train samples/sec on
Apple-M MPS (BASELINE.md) — the only concrete published number.
"""
import json
import sys
import time

import numpy as np


def main(argv=()):
    import jax
    import jax.numpy as jnp
    import optax

    from legommenders_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.data.device_pipeline import DeviceTrainPipeline
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params

    # MIND-small scale: 65k-item catalog, NAML geometry from the reference
    # handbook run (hidden 64; TPU-friendly batch 4096)
    data = SyntheticProcessor(
        num_items=65000, num_users=20000, title_len=30, history_len=50,
        vocab_size=30000, inters_per_user=12).as_lego_data()
    model_cfg = {
        "name": "NAML",
        "meta": {"item": "CNN", "user": "Ada", "predictor": "Dot"},
        "config": {"use_item_content": True, "hidden_size": 64,
                   "use_neg_sampling": True, "neg_count": 4,
                   "full_catalog_encode": "on",
                   "item_config": {"dropout": 0.1, "kernel_size": 3}},
    }
    # batch sweep on the v5e (catalog encode + embedding grad are fixed
    # per-step costs): 154k @ 8192, 249k @ 16384, 367k @ 32768 impr/s;
    # 65536 exceeds the fixture's positive-row count
    from legommenders_tpu.utils.function import parse_cli
    cli = parse_cli(list(argv))
    batch_size = int(cli.get("batch_size") or 32768)
    m = Manager({}, model_cfg,
                exp_cfg={"policy": {"batch_size": batch_size,
                                    "dtype": "bf16"}}, data=data)

    # device-resident pipeline: interactions/history/negatives live in HBM,
    # batch assembly is fused into the train step; the host ships only 32KB
    # of permuted row indices per step (data/device_pipeline.py)
    dp = DeviceTrainPipeline(data, batch_size=batch_size, neg_count=4,
                             seed=0)
    idx0 = next(dp.epoch_indices(shuffle=False))
    batch0 = dp.assemble(jnp.asarray(idx0), jax.random.PRNGKey(0))
    params = init_params(m.model, batch0, m.contents.columns, seed=0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = dp.make_fused_train_step(m.model, m.contents.columns, opt,
                                    rng_impl="rbg")

    # warmup / compile
    params, opt_state, loss = step(params, opt_state, jnp.asarray(idx0), 0)
    jax.block_until_ready(loss)

    def index_stream():
        while True:
            for idx in dp.epoch_indices():
                yield idx

    n_steps = 200
    stream = index_stream()
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(next(stream)), i + 1)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    samples_per_sec = n_steps * batch_size / dt
    step_s = dt / n_steps

    # ---- honest breakdown: where the step time goes -------------------
    # fwd-only and fwd+bwd variants of the same fused graph, timed
    # separately; opt = full step minus fwd+bwd (adam + embedding update)
    fwd_t = dp.time_loss_only(m.model, m.contents.columns, params,
                              jnp.asarray(idx0), n_steps=50)
    fb_t = dp.time_grad_only(m.model, m.contents.columns, params,
                             jnp.asarray(idx0), n_steps=50)

    # hardware-grounded estimates at the bench geometry (catalog mode):
    # every step encodes the full 65k catalog once (CNN d=64) + embeds
    # 1.95M catalog tokens; dominant traffic = embedding fwd gather +
    # bwd segment-sum over (N*L, 64) f32 rows
    N, L, D = 65000, 30, 64
    tok_bytes = N * L * D * 4
    flops = (
        # catalog CNN encode fwd (k=3): N*L*(2*k*D*D) + additive attn
        N * L * 2 * 3 * D * D
        # user Ada attention + dot predictor (B rows, S=50 clicks, K=5)
        + batch_size * (50 + 5) * 2 * D * D
    ) * 3  # fwd + ~2x bwd
    baseline = 15000.0  # reference MPS impressions/sec (BASELINE.md)
    print(json.dumps({
        "metric": "train_impressions_per_sec_per_chip",
        "value": round(samples_per_sec, 1),
        "unit": "impressions/s",
        "vs_baseline": round(samples_per_sec / baseline, 3),
        "step_ms": round(step_s * 1e3, 2),
        "fwd_ms": round(fwd_t * 1e3, 2),
        "bwd_ms": round((fb_t - fwd_t) * 1e3, 2),
        "opt_ms": round((step_s - fb_t) * 1e3, 2),
        "model_tflops_per_s_est": round(flops / step_s / 1e12, 2),
        "embed_grad_gbytes_per_step": round(tok_bytes / 1e9, 2),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
