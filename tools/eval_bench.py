"""Evaluator wall-clock at MIND-small scale (VERDICT r3 item 2).

Times the REAL Evaluator (cache build -> whole-phase device scoring -> one
D2H -> MetricPool) on the golden-run fixture geometry: 65k items, 50k
users, 1.75M test interactions. Reference counterpart being beaten:
base_lego.py:349-398 host-batched fast-eval loop (the round-3 framework
did 49.8 s / 1.75M rows because data/pipeline.py assembled numpy batches
per step; this path ships zero per-batch host traffic).

Run on the real chip:   timeout 900 python tools/eval_bench.py
CPU (for smoke):        JAX_PLATFORM_NAME=cpu python tools/eval_bench.py --small
Uncached-path variant:  timeout 1800 python tools/eval_bench.py --uncached
(`--uncached` swaps the model for MINER — Transformer item op +
PolyAttention user op, allow_caching=False — so the whole phase runs the
device-resident FULL-FORWARD scan of evaluator.py:score_phase_device_full
instead of the repr-cache fast-eval; reference counterpart is the host
mini-batch loop every non-cached model lives in, base_lego.py:349-398.)
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    small = "--small" in sys.argv
    uncached = "--uncached" in sys.argv
    import jax
    import jax.numpy as jnp
    from legommenders_tpu.parallel.mesh import enable_compilation_cache
    if not small:
        enable_compilation_cache()
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params

    t0 = time.perf_counter()
    if small:
        data = SyntheticProcessor(
            num_items=2000, num_users=500, title_len=30, history_len=50,
            vocab_size=5000, inters_per_user=20).as_lego_data()
    else:
        # golden-run geometry: 50k users x 35 inters = 1.75M rows/split
        data = SyntheticProcessor(
            num_items=65000, num_users=50000, title_len=30, history_len=50,
            vocab_size=20000, inters_per_user=35).as_lego_data()
    build_s = time.perf_counter() - t0

    if uncached:
        # MINER (miner.yaml): PolyAttention user repr is a matrix, so
        # allow_caching=False and eval takes the full-forward scan path
        model_cfg = {
            "meta": {"item": "Transformer", "user": "PolyAttention",
                     "predictor": "MINER"},
            "config": {"use_item_content": True, "hidden_size": 64,
                       "item_config": {"num_attention_heads": 8,
                                       "num_hidden_layers": 3},
                       "user_config": {"num_context_codes": 32,
                                       "context_code_dim": 200}},
        }
    else:
        model_cfg = {
            "meta": {"item": "CNN", "user": "Ada", "predictor": "Dot"},
            "config": {"use_item_content": True, "hidden_size": 64,
                       "item_config": {"dropout": 0.1}},
        }
    m = Manager({}, model_cfg,
                exp_cfg={"policy": {"batch_size": 1024, "dtype": "bf16"}},
                data=data)
    tb = m.train_batcher(seed=0)
    jb0 = {k: jnp.asarray(v) for k, v in next(tb.epoch(shuffle=False)).items()}
    params = init_params(m.model, jb0, m.contents.columns, seed=0)
    ev = m.evaluator()
    n_rows = len(data.inters["test"][data.cm.label_col])

    if uncached:
        assert m.cache is None or not getattr(m.cache, "active", False)
        t0 = time.perf_counter()
        res = ev.evaluate(params, "test")
        cold_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_steady = ev.evaluate(params, "test")
        total_s = time.perf_counter() - t0
        # score-only split (warm the standalone executable first — the
        # hot path above runs score+metrics fused in one program)
        ph = ev._get_full_phase("test")
        jax.block_until_ready(ev.score_phase_device_full(params, "test"))
        t0 = time.perf_counter()
        scores_dev = ev.score_phase_device_full(params, "test")
        jax.block_until_ready(scores_dev)
        score_s = time.perf_counter() - t0
        res_host = ev.pool(jax.device_get(scores_dev), ph.labels, ph.groups)
        for k in res_host:
            assert abs(res_steady[k] - res_host[k]) < 1e-6, (
                k, res_steady[k], res_host[k])
        print(json.dumps({
            "metric": "evaluator_uncached_rows_per_sec",
            "value": round(n_rows / total_s, 0),
            "unit": "rows/s",
            "rows": n_rows,
            "total_s": round(total_s, 3),
            "score_s": round(score_s, 3),
            "cold_first_eval_s": round(cold_s, 2),
            "host_fixture_build_s": round(build_s, 1),
            "gauc": round(float(res_steady.get("GAUC", float("nan"))), 4),
            "model": "MINER (allow_caching=False, full-forward scan)",
            "backend": jax.default_backend(),
        }))
        return

    # --- first evaluate: includes compiles + cache build -----------------
    t0 = time.perf_counter()
    res = ev.evaluate(params, "test")
    cold_s = time.perf_counter() - t0

    # --- steady-state: what an epoch loop sees ---------------------------
    # cache rebuild happens every eval (params change between epochs);
    # since round 5 the rebuild is one fused lax.map dispatch and the
    # metric pool runs on device (no (n,) D2H on the hot path)
    m.cache.clean()
    t0 = time.perf_counter()
    res_steady = ev.evaluate(params, "test")
    total_s = time.perf_counter() - t0

    # breakdown (re-run each phase separately)
    m.cache.clean()
    t0 = time.perf_counter()
    m.cache.cache(params)
    jax.block_until_ready(m.cache.user_repr)
    cache_s = time.perf_counter() - t0

    ph = ev._get_device_phase("test")
    scorer = ev._get_scorer()
    # warm the STANDALONE scorer/metric executables first — the hot eval
    # path runs them fused in one program, so these would otherwise time
    # their own compiles
    scores_dev = scorer(params, m.cache.item_repr, m.cache.user_repr,
                        ph.u_pages, ph.i_pages)[:ph.n]
    ev.pool.calculate_device(scores_dev, ph.labels_d, ph.groups_d,
                             max_groups=ph.num_groups)
    t0 = time.perf_counter()
    scores_dev = scorer(params, m.cache.item_repr, m.cache.user_repr,
                        ph.u_pages, ph.i_pages)[:ph.n]
    jax.block_until_ready(scores_dev)
    score_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    res2 = ev.pool.calculate_device(scores_dev, ph.labels_d, ph.groups_d,
                                    max_groups=ph.num_groups)
    metrics_s = time.perf_counter() - t0

    # host-pool oracle (also times the OLD metric path for the record)
    t0 = time.perf_counter()
    res_host = ev.pool(jax.device_get(scores_dev), ph.labels, ph.groups)
    host_metrics_s = time.perf_counter() - t0
    for k in res_host:
        assert abs(res2[k] - res_host[k]) < 1e-6, (k, res2[k], res_host[k])

    print(json.dumps({
        "metric": "evaluator_rows_per_sec",
        "value": round(n_rows / total_s, 0),
        "unit": "rows/s",
        "rows": n_rows,
        "total_s": round(total_s, 3),
        "cache_build_s": round(cache_s, 3),
        "score_s": round(score_s, 4),
        "metrics_device_s": round(metrics_s, 4),
        "metrics_host_s_for_reference": round(host_metrics_s, 3),
        "cold_first_eval_s": round(cold_s, 2),
        "host_fixture_build_s": round(build_s, 1),
        "gauc": round(float(res2.get("GAUC", float("nan"))), 4),
        "backend": jax.default_backend(),
    }))
    assert abs(res["GAUC"] - res2["GAUC"]) < 1e-6


if __name__ == "__main__":
    main()
