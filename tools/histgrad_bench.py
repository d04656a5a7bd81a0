"""Microbench: history-gather backward — naive scatter-add vs
HistoryGradPlan (by-user segment-sum + static gather-reduce).

The NAML fused step's largest backward op is the scatter-add transpose of
`clicks = take(all_reprs, hist_ids)` — 24 ms of the 89 ms step at B=32k
(tools/naml_profile.py on the v5e). This times both formulations at bench
geometry and checks numerics.

Run: timeout 600 python tools/histgrad_bench.py
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def timeit(fn, *a, n=20):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    import jax
    import jax.numpy as jnp
    from legommenders_tpu.ops.catalog_grad import HistoryGradPlan

    U, S, N, D, B = 20000, 50, 65000, 64, 32768
    rng = np.random.default_rng(0)
    # realistic history matrix: popularity-skewed ids, ~10% pad (UNSET->0)
    H = (rng.zipf(1.3, size=(U, S)) % N).astype(np.int32)
    H[rng.random((U, S)) < 0.1] = 0
    u = jnp.asarray(rng.integers(0, U, size=B).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    H_dev = jnp.asarray(H)

    plan = HistoryGradPlan(H, N)

    @jax.jit
    def naive(g, u):
        ids = jnp.take(H_dev, u, axis=0).reshape(-1)
        return jnp.zeros((N, D), g.dtype).at[ids].add(g.reshape(-1, D))

    @jax.jit
    def planned(g, u):
        gu = jnp.zeros((U, S, D), g.dtype).at[u].add(g)
        return plan.inner.segment_reduce(gu)

    @jax.jit
    def by_user_only(g, u):
        return jnp.zeros((U, S, D), g.dtype).at[u].add(g)

    t_naive, out_n = timeit(naive, g, u)
    t_plan, out_p = timeit(planned, g, u)
    t_user, _ = timeit(by_user_only, g, u)

    # numerics: bf16 accumulation order differs; compare in f32 tolerance
    a = np.asarray(out_n, np.float32)
    b = np.asarray(out_p, np.float32)
    scale = np.abs(a).max() + 1e-6
    err = np.abs(a - b).max() / scale
    print(f"naive scatter-add : {t_naive * 1e3:8.2f} ms")
    print(f"planned (2-level) : {t_plan * 1e3:8.2f} ms  "
          f"(by-user stage alone {t_user * 1e3:.2f} ms)")
    print(f"rel max diff      : {err:.2e}  (bf16 reorder tolerance)")

    # end-to-end vjp of the actual take (fwd + bwd together)
    tbl = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    @jax.jit
    def vjp_naive(tbl, g, u):
        def f(t):
            ids = jnp.take(H_dev, u, axis=0)
            return jnp.take(t, ids, axis=0)
        _, pull = jax.vjp(f, tbl)
        return pull(g)[0]

    @jax.jit
    def vjp_plan(tbl, g, u):
        _, pull = jax.vjp(lambda t: plan.take(t, u), tbl)
        return pull(g)[0]

    tv_n, _ = timeit(vjp_naive, tbl, g, u)
    tv_p, _ = timeit(vjp_plan, tbl, g, u)
    print(f"full vjp naive    : {tv_n * 1e3:8.2f} ms")
    print(f"full vjp planned  : {tv_p * 1e3:8.2f} ms")

    # ---- stage-2 breakdown: where does segment_reduce time go? ----------
    gu = np.asarray(jnp.zeros((U, S, D), jnp.bfloat16).at[u].add(g))
    gu_d = jnp.asarray(gu)
    reduce_j = jax.jit(plan.inner.segment_reduce)
    t_red, _ = timeit(reduce_j, gu_d)
    lvl1 = plan.inner._levels[0]

    @jax.jit
    def level1_only(gu):
        cur = gu.reshape(-1, D)
        ext = jnp.concatenate([cur, jnp.zeros((1, D), cur.dtype)], axis=0)
        return jnp.take(ext, lvl1, axis=0).sum(axis=1)

    t_l1, _ = timeit(level1_only, gu_d)
    order = np.argsort(np.where(H == -1, 0, H).reshape(-1),
                       kind="stable").astype(np.int32)
    order_d = jnp.asarray(order)

    @jax.jit
    def bare_permute(gu):
        return jnp.take(gu.reshape(-1, D), order_d, axis=0)

    t_perm, _ = timeit(bare_permute, gu_d)
    print(f"stage2 reduce     : {t_red * 1e3:8.2f} ms "
          f"(level1 {t_l1 * 1e3:.2f} ms, bare 1M-row permute "
          f"{t_perm * 1e3:.2f} ms, levels={len(plan.inner._levels)})")

    for F in (16, 32):
        from legommenders_tpu.ops.catalog_grad import HistoryGradPlan as HP
        p2 = HP(H, N, fanout=F)
        r2 = jax.jit(p2.inner.segment_reduce)
        t2, _ = timeit(r2, gu_d)
        print(f"stage2 fanout={F:3d}: {t2 * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
