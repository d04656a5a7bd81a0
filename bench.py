"""Benchmark: train throughput (impressions/sec/chip) on the flagship model.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", "rows"}.
Baseline: the reference handbook NAML run implies ~15k train samples/sec on
Apple-M MPS (BASELINE.md) — the only concrete published number.

The headline is a two-row story (VERDICT r3 item 7): the realistic
optimizer batch (16,384) and the amortized large batch (32,768 — the
fixture's positive-row count caps it below 65,536); the fixed per-step
catalog encode + embedding gradient are what the larger batch amortizes.
Timing hygiene: the full step is timed over 3 independent repeats
(median + spread reported); opt_ms is the clamped median difference, so a
physically impossible negative time can no longer be printed.
"""
import json
import statistics
import sys
import time

import numpy as np


def _timed_runs(fn, n_steps, repeats=3):
    """fn(step_idx) must leave device work outstanding; returns list of
    per-step means (seconds), one per repeat."""
    import jax
    means = []
    k = 0
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(n_steps):
            k += 1
            out = fn(k)
        jax.block_until_ready(out)
        means.append((time.perf_counter() - t0) / n_steps)
    return means


def bench_one(data, model_cfg, batch_size, n_steps=100):
    import jax
    import jax.numpy as jnp
    import optax

    from legommenders_tpu.data.device_pipeline import DeviceTrainPipeline
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params

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

    stream = index_stream()
    state = [params, opt_state]

    def one_step(i):
        state[0], state[1], loss = step(state[0], state[1],
                                        jnp.asarray(next(stream)), i)
        return loss

    step_means = _timed_runs(one_step, n_steps, repeats=3)
    params = state[0]
    step_s = statistics.median(step_means)
    spread = max(step_means) - min(step_means)

    # ---- honest breakdown: where the step time goes -------------------
    # fwd-only and fwd+bwd variants of the same fused graph, timed
    # separately; opt = clamped(step - fwd+bwd) (adam + embedding update)
    fwd_t = dp.time_loss_only(m.model, m.contents.columns, params,
                              jnp.asarray(idx0), n_steps=50)
    fb_t = dp.time_grad_only(m.model, m.contents.columns, params,
                             jnp.asarray(idx0), n_steps=50)

    row = {
        "batch_size": batch_size,
        "impressions_per_sec": round(batch_size / step_s, 1),
        "step_ms": round(step_s * 1e3, 2),
        "step_ms_spread_3runs": round(spread * 1e3, 2),
        "fwd_ms": round(fwd_t * 1e3, 2),
        "bwd_ms": round((fb_t - fwd_t) * 1e3, 2),
        "opt_ms": round(max(0.0, step_s - fb_t) * 1e3, 2),
        "opt_ms_raw_delta": round((step_s - fb_t) * 1e3, 2),
    }
    row.update(_roofline(dp, m, params, jnp.asarray(idx0), fwd_t, fb_t))
    return row


# v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM
_PEAK_TFLOPS, _PEAK_GBPS = 197.0, 819.0


def _roofline(dp, m, params, idx, fwd_t, fb_t):
    """XLA cost-analysis roofline for the fwd and fwd+bwd graphs: achieved
    TFLOP/s and HBM GB/s per phase plus which wall (MXU flops vs HBM
    bytes) each phase sits against — so the next lever is chosen by
    measurement, not guess (VERDICT r4 item 7).

    Caveat: cost_analysis counts HLO-level bytes BEFORE fusion, so
    achieved GB/s can exceed the physical peak (fused elementwise chains
    never touch HBM); >100% readings mean "deep inside the bandwidth
    wall", not faster-than-light memory. v5e measurement: NAML@32k bwd
    36.6 GB in 59 ms = 75% of physical peak — the step is HBM-bound and
    the next lever is byte reduction, not FLOPs."""
    import jax

    def costs(fn_builder):
        loss_fn, big = dp._make_loss_fn(m.model, m.contents.columns, "rbg")
        fn = fn_builder(loss_fn)
        ca = jax.jit(fn).lower(params, big, idx, 0).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0) or 0.0), \
            float(ca.get("bytes accessed", 0.0) or 0.0)

    try:
        f_fwd, b_fwd = costs(lambda f: f)
        f_fb, b_fb = costs(jax.value_and_grad)
    except Exception as e:  # cost_analysis shape varies across backends
        return {"roofline_error": str(e)[:120]}

    bwd_t = max(fb_t - fwd_t, 1e-9)
    out = {}
    for phase, (fl, by, t) in {
        "fwd": (f_fwd, b_fwd, fwd_t),
        "bwd": (f_fb - f_fwd, b_fb - b_fwd, bwd_t),
    }.items():
        tfps = fl / t / 1e12
        gbps = by / t / 1e9
        mxu_u, hbm_u = tfps / _PEAK_TFLOPS, gbps / _PEAK_GBPS
        out[f"{phase}_tflops"] = round(fl / 1e12, 4)
        out[f"{phase}_gbytes"] = round(by / 1e9, 3)
        out[f"{phase}_achieved_tflops_per_s"] = round(tfps, 2)
        out[f"{phase}_achieved_hbm_gbps"] = round(gbps, 1)
        out[f"{phase}_bound"] = ("hbm" if hbm_u > mxu_u else "mxu") + \
            f" ({max(hbm_u, mxu_u) * 100:.0f}% of peak)"
    return out


def main(argv=()):
    import jax

    from legommenders_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.utils.function import parse_cli

    # MIND-small scale: 65k-item catalog, NAML geometry from the reference
    # handbook run (hidden 64)
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
    cli = parse_cli(list(argv))
    if cli.get("item_page_size"):
        # byte-reduction experiment knob: page+remat the catalog encode —
        # the roofline says the step is HBM-bound, so trading backward
        # bytes for recompute FLOPs can pay on this model too
        model_cfg["config"]["item_page_size"] = int(cli["item_page_size"])
        model_cfg["config"]["item_page_remat"] = str(
            cli.get("remat") or "full")
    if cli.get("batch_size"):
        batches = [int(cli["batch_size"])]
    else:
        batches = [16384, 32768]   # realistic + amortized
    rows = [bench_one(data, model_cfg, b) for b in batches]

    best = max(rows, key=lambda r: r["impressions_per_sec"])
    baseline = 15000.0  # reference MPS impressions/sec (BASELINE.md)
    print(json.dumps({
        "metric": "train_impressions_per_sec_per_chip",
        "value": best["impressions_per_sec"],
        "unit": "impressions/s",
        "vs_baseline": round(best["impressions_per_sec"] / baseline, 3),
        "rows": rows,
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
