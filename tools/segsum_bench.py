"""Micro-bench: embedding-gradient segment-sum strategies on the real TPU.

The fused NAML step spends ~22ms/57ms in the catalog-embedding backward
(ROADMAP perf #2): a (N*L, D) cotangent must be segment-summed by (static)
token id into the (V, D) table gradient. This tool measures each candidate
on the bench geometry (N=65000, L=30, D=64, V=30000) so the winner is
chosen by data, not theory:

  plan-f{F}     current CatalogGradPlan gather-reduce at fanout F
  plan-bf16     same, cotangent pre-cast to bf16 (halves gather traffic)
  scatter       raw .at[ids].add(g) scatter-add (XLA baseline)
  gather-perm   g[order] alone — the raw permutation cost that lower-bounds
                any sort-based design
  onehot-mxu    sorted block-diagonal one-hot matmul: host-sorted chunks of
                C occurrences each span a narrow contiguous id window W;
                per chunk (W, C) one-hot @ (C, D) on the MXU, then overlap-
                add of chunk outputs (includes the g[order] permutation)
  fwd-gather    table[ids] forward lookup, for reference

Usage: python tools/segsum_bench.py [--n 65000] [--l 30] [--d 64] [--v 30000]
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main(argv):
    from legommenders_tpu.utils.function import parse_cli
    cli = parse_cli(argv)
    N = int(cli.get("n") or 65000)
    L = int(cli.get("l") or 30)
    D = int(cli.get("d") or 64)
    V = int(cli.get("v") or 30000)
    C = int(cli.get("chunk") or 4096)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from legommenders_tpu.ops.catalog_grad import CatalogGradPlan

    rng = np.random.default_rng(0)
    ids = rng.integers(0, V, size=(N, L)).astype(np.int32)
    M = N * L
    g = jnp.asarray(rng.standard_normal((M, D)).astype(np.float32))
    table = jnp.asarray(rng.standard_normal((V, D)).astype(np.float32))
    flat = ids.reshape(-1)
    flat_dev = jnp.asarray(flat)
    gb = M * D * 4 / 1e9

    results = {}

    # current plan at several fanouts (g passed as ARG — the axon
    # remote-compile tunnel 413s on multi-MB closure constants)
    def plan_vjp(plan):
        def f(t, gg):
            _, vjp = jax.vjp(plan.take, t)
            return vjp(gg.reshape(N, L, D))[0]
        return jax.jit(f)

    for F in (8, 16, 32):
        plan = CatalogGradPlan(ids, V, fanout=F)
        results[f"plan-f{F}"] = timeit(plan_vjp(plan), table, g)

    # bf16 cotangent through the best plan
    plan16 = CatalogGradPlan(ids, V, fanout=16)

    def bf16_bwd(t, gg):
        _, vjp = jax.vjp(plan16.take, t)
        return vjp(gg.reshape(N, L, D))[0]
    results["plan-bf16"] = timeit(
        jax.jit(bf16_bwd), table.astype(jnp.bfloat16),
        g.astype(jnp.bfloat16))

    # raw scatter-add
    @jax.jit
    def scatter(gg):
        return jnp.zeros((V, D), gg.dtype).at[flat_dev].add(gg)
    results["scatter"] = timeit(scatter, g)

    # raw permutation (gather by sorted order)
    order = jnp.asarray(np.argsort(flat, kind="stable").astype(np.int32))

    @jax.jit
    def gather_perm(gg):
        return jnp.take(gg, order, axis=0)
    results["gather-perm"] = timeit(gather_perm, g)

    # forward lookup for reference
    @jax.jit
    def fwd(t):
        return jnp.take(t, flat_dev, axis=0)
    results["fwd-gather"] = timeit(fwd, table)

    # sorted block-diagonal one-hot MXU: sort ids; chunk sorted stream; each
    # chunk's ids span [base_c, base_c + W); one-hot (C, W) built on device
    # from (sorted_ids - base) via iota compare; chunk result (W, D) written
    # by overlap-add into (n_chunks, W) windows then scattered once (windows
    # overlap at most at the boundary id -> resolve with a final segment fix
    # on n_chunks rows — negligible). Here we measure the core cost:
    # permutation + one-hot matmuls + windowed accumulation.
    sflat = np.sort(flat, kind="stable")
    n_chunks = -(-M // C)
    pad = n_chunks * C - M
    sp = np.pad(sflat, (0, pad), constant_values=V)
    sp2 = sp.reshape(n_chunks, C)
    base = sp2[:, 0].astype(np.int32)
    span = int((sp2.max(axis=1) - base).max()) + 1
    W = max(128, int(2 ** np.ceil(np.log2(span))))
    base_dev = jnp.asarray(base)
    local = jnp.asarray((sp2 - base[:, None]).astype(np.int32))  # (nc, C)

    @jax.jit
    def onehot_mxu(gg):
        gs = jnp.take(gg, order, axis=0)
        gs = jnp.pad(gs, ((0, pad), (0, 0)))
        gs = gs.reshape(n_chunks, C, D).astype(jnp.bfloat16)
        onehot = (local[:, :, None] ==
                  jnp.arange(W, dtype=jnp.int32)[None, None, :])
        onehot = onehot.astype(jnp.bfloat16)                  # (nc, C, W)
        part = jnp.einsum("ncw,ncd->nwd", onehot, gs,
                          preferred_element_type=jnp.float32)  # (nc, W, D)
        # windowed overlap-add into (V, D)
        out = jnp.zeros((V + W, D), jnp.float32)
        out = out.at[base_dev[:, None] +
                     jnp.arange(W)[None, :]].add(part)
        return out[:V]
    results[f"onehot-mxu W={W}"] = timeit(onehot_mxu, g)

    # correctness spot-check of onehot vs scatter
    ref = np.asarray(scatter(g))
    got = np.asarray(onehot_mxu(g))
    err = float(np.max(np.abs(ref - got)) / (np.abs(ref).max() + 1e-9))

    print(f"# M={M} D={D} V={V} chunk={C} W={W} |g|={gb:.2f}GB "
          f"onehot_rel_err={err:.2e}")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"{k:18s} {v*1e3:8.2f} ms   {gb/v:7.1f} GB/s effective")


if __name__ == "__main__":
    main(sys.argv[1:])
