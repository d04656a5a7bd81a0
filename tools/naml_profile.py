"""Op-level device-time breakdown of the NAML fused train step.

Runs bench.py's exact step (batch 32,768, fused device pipeline) under
jax.profiler, parses the XSpace with jax.profiler.ProfileData, and prints
the top ops by total device time — so the next byte-reduction lever on
the HBM-bound backward (bench.py roofline: 59 ms bwd at 618 GB/s
pre-fusion) is chosen from a measured op table, not a guess.

Usage (real chip):  timeout 900 python tools/naml_profile.py [batch]
"""
import collections
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    import jax
    import jax.numpy as jnp
    import optax
    from legommenders_tpu.parallel.mesh import enable_compilation_cache
    enable_compilation_cache()
    from legommenders_tpu.data.device_pipeline import DeviceTrainPipeline
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params

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
    m = Manager({}, model_cfg,
                exp_cfg={"policy": {"batch_size": batch, "dtype": "bf16"}},
                data=data)
    dp = DeviceTrainPipeline(data, batch_size=batch, neg_count=4, seed=0)
    idx0 = next(dp.epoch_indices(shuffle=False))
    batch0 = dp.assemble(jnp.asarray(idx0), jax.random.PRNGKey(0))
    params = init_params(m.model, batch0, m.contents.columns, seed=0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = dp.make_fused_train_step(m.model, m.contents.columns, opt,
                                    rng_impl="rbg")
    params, opt_state, loss = step(params, opt_state, jnp.asarray(idx0), 0)
    jax.block_until_ready(loss)

    n_steps = 5
    tmp = tempfile.mkdtemp(prefix="naml_prof_")
    jax.profiler.start_trace(tmp)
    for i in range(1, n_steps + 1):
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(idx0), i)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {tmp}"
    pd = jax.profiler.ProfileData.from_file(paths[0])
    per_op = collections.Counter()
    per_cat = collections.Counter()
    total_ps = 0
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            for ev in line.events:
                dur = ev.duration_ns
                name = ev.name
                per_op[name] += dur
                total_ps += dur
    for name, ns in per_op.items():
        cat = name.split(".")[0].split("(")[0]
        per_cat[cat] += ns
    print(f"# device planes total: {total_ps / 1e6 / n_steps:.2f} "
          f"ms/step over {n_steps} steps")
    print(f"{'op':70s} {'ms/step':>9s} {'share':>7s}")
    for name, ns in per_op.most_common(32):
        print(f"{name[:70]:70s} {ns / 1e6 / n_steps:9.3f} "
              f"{100 * ns / max(total_ps, 1):6.1f}%")
    print(json.dumps({"trace_dir": tmp,
                      "total_ms_per_step": round(total_ps / 1e6 / n_steps,
                                                 2)}))


if __name__ == "__main__":
    main()
