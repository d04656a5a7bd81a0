"""Bisect the per-occurrence item-encode compiler hang (ROADMAP r1 #1).

Runs ONE named graph variant (argv[1]) so the caller can subprocess-timeout
each: the axon Mosaic compiler hang is not interruptible in-process.

    timeout 180 python tools/hang_bisect.py <variant> [B]

Variants build up the per-occurrence train graph piece by piece at the
bench shape (N=65000 items, L=30 tokens, V=30000 vocab, D=64, K=5, S=50).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    variant = sys.argv[1]
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    N, L, V, D, K, S = 65000, 30, 30000, 64, 5, 50
    OCC = B * (K + S)

    rng = np.random.default_rng(0)
    contents = jnp.asarray(
        rng.integers(0, V, size=(N, L)).astype(np.int32))
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, N, size=(OCC,)).astype(np.int32))
    wq = jnp.asarray(rng.normal(size=(D, D)).astype(np.float32) * 0.05)
    q = jnp.asarray(rng.normal(size=(D,)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, D, D)).astype(np.float32) * 0.05)

    def gather_tokens(tbl):
        toks = jnp.take(contents, ids, axis=0)          # (OCC, L)
        emb = jnp.take(tbl, toks, axis=0)               # (OCC, L, D)
        return emb, toks

    def conv(emb):
        return jax.nn.relu(
            jax.lax.conv_general_dilated(
                emb, kern, (1,), "SAME",
                dimension_numbers=("NWC", "WIO", "NWC")))

    def additive(x):
        a = jnp.tanh(x @ wq) @ q                        # (OCC, L)
        w = jax.nn.softmax(a, axis=-1)
        return jnp.einsum("ol,old->od", w, x)

    def head(vec, tbl):
        # fold OCC back to (B, K+S); dot-product matching loss
        v = vec.reshape(B, K + S, D)
        cand, hist = v[:, :K], v[:, K:]
        user = hist.mean(axis=1)
        scores = jnp.einsum("bd,bkd->bk", user, cand)
        return -jnp.mean(jax.nn.log_softmax(scores, axis=-1)[:, 0])

    graphs = {
        # forward-only pieces
        "gather_fwd": lambda tbl: gather_tokens(tbl)[0].sum(),
        "conv_fwd": lambda tbl: conv(gather_tokens(tbl)[0]).sum(),
        "additive_fwd": lambda tbl: additive(
            conv(gather_tokens(tbl)[0])).sum(),
        "full_fwd": lambda tbl: head(
            additive(conv(gather_tokens(tbl)[0])), tbl),
        # grads (the scatter-adds live in the backward)
        "gather_grad": jax.grad(lambda tbl: gather_tokens(tbl)[0].sum()),
        "conv_grad": jax.grad(lambda tbl: conv(gather_tokens(tbl)[0]).sum()),
        "additive_grad": jax.grad(
            lambda tbl: additive(conv(gather_tokens(tbl)[0])).sum()),
        "full_grad": jax.grad(
            lambda tbl: head(additive(conv(gather_tokens(tbl)[0])), tbl)),
    }
    fn = jax.jit(graphs[variant])
    t0 = time.perf_counter()
    out = fn(table)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    out = fn(table)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"OK {variant} B={B} OCC={OCC} compile={t1-t0:.1f}s "
          f"run={t2-t1:.4f}s", flush=True)


if __name__ == "__main__":
    main()
