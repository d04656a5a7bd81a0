"""LM item-encoder benchmark: bert-naml on one TPU chip.

The reference's headline capability is LLM content encoding
(reference model/operators/once_operator.py:41-236): a pretrained LM
encodes item text, layers 0..tune_from-1 are frozen+cached offline and
only the top slice (with LoRA) trains. This bench measures that exact
path end-to-end on the v5e:

  * BertBase geometry (12 layers, d=768, L=30 tokens), lm_dtype bf16
  * tune_from=10 -> 2 trainable encoder layers + LoRA(r=32), cached
    (N, L, 768) bf16 lower-layer hidden states device-resident
  * MIND-small scale catalog (65,536 items), per-occurrence encode
    (num_items > 2*B*(K+S) so `auto` picks the occurrence path — the
    formerly pathological graph, root-caused to threefry-in-donated-step)
  * fused device-resident train step (data/device_pipeline.py)

Prints ONE JSON line with impressions/s plus an analytic MFU estimate for
the trainable LM slice (fwd+bwd ~ 3x fwd matmul FLOPs) so the number is
grounded in hardware terms, not just a baseline ratio.

Usage:  python bench_lm.py            # full TPU bench
        python bench_lm.py --smoke 1  # tiny CPU smoke (CI)
"""
import json
import sys
import time


def main(argv):
    from legommenders_tpu.utils.function import parse_cli
    cli = parse_cli(argv)
    smoke = bool(int(cli.get("smoke") or 0))

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from legommenders_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()

    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.data.device_pipeline import DeviceTrainPipeline
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params

    if smoke:
        num_items, title_len, hist_len, batch_size = 200, 8, 6, 16
        tune_from, n_layers, d_model, n_heads = 1, 2, 32, 2
        page_size, n_steps = 256, 3
    else:
        num_items = int(cli.get("num_items") or 65536)
        title_len, hist_len = 30, 50
        # batch sweep on the v5e (catalog-encode cost is fixed per step at
        # B >= ~1.2k where `auto` flips to the catalog pass): 260 impr/s @
        # 512 (per-occurrence), 595 @ 2048, 1190 @ 4096, 4738 @ 16384 —
        # step time pinned at ~3.45s by the 65k-item encode throughout.
        # tanh-gelu + attention packing (tools/lm_ablate.py) cut the encode
        # to 2.90s: 5649 impr/s @ 16384, 30.5% trainable-slice MFU.
        # r3: fused Pallas attention 6148 @ 16384; step stays ~2.7s while
        # B grows (encode-bound): 12169 @ 32768, 23927 @ 65536 (1.6x the
        # reference's NON-LM baseline). Default = the headline point;
        # fixture build at 65536 users takes ~10 min host-side, once.
        batch_size = int(cli.get("batch_size") or 65536)
        tune_from = int(cli.get("tune_from") or 10)
        n_layers, d_model, n_heads = 12, 768, 12
        # page sweep (round 5, ffn remat + aligned cache): 8192: 8,548 /
        # 4096: 8,933 / 2048: 9,133 / 1024: 9,557 / 512: 10,029 /
        # 256: 10,091 impr/s @ 16384 — smaller pages keep the remat
        # working set resident; 512 is the default (256 is +0.6% but
        # doubles scan length at bigger catalogs)
        page_size = int(cli.get("item_page_size") or 512)
        n_steps = int(cli.get("steps") or 10)
    neg_count = 4
    K = neg_count + 1

    # ~1.9 positive train rows per user at the fixture's click rate; the
    # device pipeline needs >= batch_size positives for one step
    data = SyntheticProcessor(
        num_items=num_items, num_users=max(2000, num_items // 4, batch_size),
        title_len=title_len, history_len=hist_len,
        vocab_size=30000, inters_per_user=12).as_lego_data()

    model_cfg = {
        "name": "BERT-NAML",
        "meta": {"item": "BertBase" if not smoke else "Bert",
                 "user": "Ada", "predictor": "Dot"},
        "config": {
            "use_item_content": True, "hidden_size": 64,
            "embedding_dim": d_model,
            "use_neg_sampling": True, "neg_count": neg_count,
            "full_catalog_encode": "auto",
            "item_page_size": page_size,
            # remat policy: "dots" (all GEMM outputs) wants 72.7G HBM at
            # the 65k catalog (measured r3) — infeasible. "ffn" (round 5)
            # saves ONLY the per-layer FFN second-GEMM outputs (~6G,
            # page-count invariant) and fits once the gather-paged scan +
            # sublane-padded cache freed the 3G relayout copy: measured
            # 8,933 vs 8,722 impr/s over "full" at batch 16384
            "item_page_remat": str(cli.get("remat") or "ffn"),
            "cache_page_size": 2048 if not smoke else 64,
            "use_fast_eval": False,
            "item_config": {
                "tune_from": tune_from, "use_lora": True, "lora_r": 32,
                "lm_dtype": jnp.bfloat16,
                "num_hidden_layers": n_layers,
                "num_attention_heads": n_heads,
                "additive_hidden_size": 256,
                # tanh-gelu: erf on the 4D intermediate costs as much as
                # the GEMMs (tools/lm_ablate.py); ~1e-3 output delta
                "gelu_approximate":
                    bool(int(cli.get("gelu_approximate") or 1)),
                # fused Pallas attention core (scores/probs/dropout in
                # VMEM) — ops/pallas_attention.packed_attention. +8.8%
                # at batch 16384 (5649 -> 6148 impr/s) on the v5e
                "fused_attention":
                    bool(int(cli.get("fused_attention") or 1)),
                # q/k/v base projections as one concatenated GEMM per
                # layer (exact math, identical param tree —
                # lm/layers._fused_qkv_proj). Measured NEUTRAL on v5e at
                # this geometry (5988 vs 5986 impr/s @ 16384) — XLA
                # already schedules the three GEMMs back-to-back; knob
                # kept for other geometries, default off
                "fused_qkv": bool(int(cli.get("fused_qkv") or 0)),
                # round-4 MFU levers (tools/lm_ablate.py): folding the
                # LoRA deltas into the base kernels cut grad/page
                # 99.5 -> 91.8 ms (requires lora_dropout 0 — dropping the
                # 0.1 default itself saved another ~6.5 ms/page; peft's
                # own examples commonly run lora_dropout=0). norm_bf16
                # measured NEUTRAL (XLA already fuses the LN apply) —
                # knob kept, default off.
                "lora_dropout":
                    float(cli.get("lora_dropout") or 0.0),
                "lora_fold": bool(int(cli.get("lora_fold") or 1)),
                # one bits draw feeds both hidden-dropout sites per layer
                # (lm/layers.SharedBitsDropout; ~1.5% step win measured)
                "dropout_reuse": bool(int(cli.get("dropout_reuse") or 1)),
            },
        },
    }
    m = Manager({}, model_cfg,
                exp_cfg={"policy": {"batch_size": batch_size,
                                    "dtype": "bf16"}}, data=data)

    dp = DeviceTrainPipeline(data, batch_size=batch_size,
                             neg_count=neg_count, seed=0)
    idx0 = next(dp.epoch_indices(shuffle=False))
    batch0 = dp.assemble(jnp.asarray(idx0), jax.random.PRNGKey(0))
    # init on a tiny slice: flax init runs the forward EAGERLY (unfused
    # f32 intermediates) — at full batch/catalog that alone OOMs; param
    # shapes depend only on config, not on batch/catalog sizes
    tiny_batch = {k: v[:4] for k, v in batch0.items()}
    tiny_contents = {c: a[:32] for c, a in m.contents.columns.items()}
    params = init_params(m.model, tiny_batch, tiny_contents, seed=0)

    t0 = time.perf_counter()
    # cache is fingerprint-keyed on the lower-slice weights (seed-stable
    # here), so disk reuse across runs is safe; --regen 1 forces a rebuild
    assert m.prepare_lm_cache(params,
                              regenerate=bool(int(cli.get("regen") or 0))), \
        "LM layer-split cache not prepared (is tune_from set?)"
    cache_s = time.perf_counter() - t0
    hid = m.contents.columns["__lm_hidden__"]
    print(f"# lm cache: {hid.shape} {hid.dtype} built in {cache_s:.1f}s",
          file=sys.stderr)

    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    step = dp.make_fused_train_step(m.model, m.contents.columns, opt,
                                    rng_impl="rbg")

    t0 = time.perf_counter()
    params, opt_state, loss = step(params, opt_state, jnp.asarray(idx0), 0)
    jax.block_until_ready(loss)
    compile_s = time.perf_counter() - t0
    print(f"# step compile+run: {compile_s:.1f}s, loss {float(loss):.4f}",
          file=sys.stderr)

    def index_stream():
        while True:
            for idx in dp.epoch_indices():
                yield idx

    stream = index_stream()
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(next(stream)), i + 1)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    step_s = dt / n_steps
    impr_per_sec = batch_size / step_s

    # fwd/bwd breakdown needs a second live executable alongside the train
    # step's buffers — at LM scale that can exhaust HBM; report nulls then
    fwd_t = fb_t = None
    try:
        fwd_t = dp.time_loss_only(m.model, m.contents.columns, params,
                                  jnp.asarray(idx0),
                                  n_steps=max(5, n_steps // 4))
        fb_t = dp.time_grad_only(m.model, m.contents.columns, params,
                                 jnp.asarray(idx0),
                                 n_steps=max(5, n_steps // 4))
    except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED path
        print(f"# breakdown skipped: {type(e).__name__}", file=sys.stderr)

    # ---- analytic FLOPs for the trainable path (per step) -------------
    # occurrences per step: `auto` picks catalog when N <= 2*B*(K+S)
    occ = (num_items
           if num_items <= 2 * batch_size * (K + hist_len)
           else batch_size * (K + hist_len))
    L = int(hid.shape[1])  # inputer may add CLS/SEP tokens
    tokens = occ * L
    top_layers = n_layers - tune_from
    # per token/layer fwd: qkvo 8d^2 + ffn 16d^2 + attn 4*L*d
    f_layer = 24 * d_model * d_model + 4 * L * d_model
    f_head = 2 * d_model * 64  # linear head
    flops_fwd = tokens * (top_layers * f_layer + f_head)
    flops_step = 3 * flops_fwd  # fwd + ~2x bwd (LoRA adds <2%)
    tflops = flops_step / step_s / 1e12
    peak = 197.0  # v5e bf16 peak TFLOP/s
    mfu = tflops / peak

    # reference baseline: the handbook's MPS NAML run implies ~15k impr/s
    # for a from-scratch CNN encoder; its LLM path is strictly slower
    # (full torch BERT fwd per occurrence). 15k is therefore a generous
    # LM-mode ceiling for the reference (BASELINE.md).
    baseline = 15000.0
    print(json.dumps({
        "metric": "lm_train_impressions_per_sec_per_chip",
        "value": round(impr_per_sec, 1),
        "unit": "impressions/s",
        "vs_baseline": round(impr_per_sec / baseline, 3),
        "model": "bert-naml bf16 tune_from=%d lora_r=32" % tune_from,
        "step_ms": round(step_s * 1e3, 2),
        "fwd_ms": round(fwd_t * 1e3, 2) if fwd_t else None,
        "bwd_ms": round((fb_t - fwd_t) * 1e3, 2) if fb_t else None,
        "opt_ms": round((step_s - fb_t) * 1e3, 2) if fb_t else None,
        "occurrences_per_step": occ,
        "trainable_slice_tflops_per_s": round(tflops, 2),
        "mfu_est": round(mfu, 4),
        "cache_build_s": round(cache_s, 1),
    }))


if __name__ == "__main__":
    main(sys.argv[1:])
