"""Ablate the LM catalog-encode step on the real TPU.

The bench_lm catalog pass runs 65k items × 31 tokens through 2 trainable
BERT layers at ~26% MFU. This tool times the pieces in isolation to find
where the non-matmul time goes:

  gemm-floor     just the 6 GEMMs of a BERT layer ×2 layers, same shapes
  slice-eval     BertEncoderSlice fwd, eval mode (no dropout)
  slice-train    fwd, training (dropout masks on)
  slice-lora     fwd, training, LoRA r=32 + frozen base
  grad-lora      value_and_grad of slice-lora (no remat, single page)

All at one page of P tokens rows (default 4096×31) — multiply by pages for
the step. Usage: python tools/lm_ablate.py [--p 4096] [--l 31] [--d 768]
"""
import sys
import time

sys.path.insert(0, "/root/repo")


def timeit(fn, *args, n=20):
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
    P = int(cli.get("p") or 4096)
    L = int(cli.get("l") or 31)
    D = int(cli.get("d") or 768)
    H = 12

    import jax
    import jax.numpy as jnp
    import numpy as np
    from legommenders_tpu.models.lm.layers import BertEncoderSlice

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((P, L, D)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    mask = jnp.ones((P, L), jnp.int32)
    M = P * L
    xf = x.reshape(M, D)

    w1 = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w4 = jnp.asarray(rng.standard_normal((D, 4 * D)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    w4b = jnp.asarray(rng.standard_normal((4 * D, D)).astype(np.float32)
                      ).astype(jnp.bfloat16)

    @jax.jit
    def gemm_floor(xf):
        h = xf
        for _ in range(2):               # 2 layers
            q = h @ w1
            k = h @ w1
            v = h @ w1
            o = v @ w1                   # stand-in for attn-out proj
            inter = (h + o) @ w4
            h = inter @ w4b
        return h
    t_floor = timeit(gemm_floor, xf)
    flops = 2 * M * (24 * D * D) * 1  # 2 layers x 12 D^2-GEMM-pairs
    print(f"gemm-floor   {t_floor*1e3:8.2f} ms  "
          f"{flops/t_floor/1e12:6.1f} TFLOP/s")

    big = jnp.asarray(rng.standard_normal((M, 4 * D)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    for nm, f in [("gelu-erf", lambda t: jax.nn.gelu(t, approximate=False)),
                  ("gelu-tanh", lambda t: jax.nn.gelu(t, approximate=True)),
                  ("gelu-sig", lambda t: t * jax.nn.sigmoid(1.702 * t))]:
        jf = jax.jit(f)
        print(f"{nm:12s} {timeit(jf, big)*1e3:8.2f} ms  (x2 layers/step)")

    def make(lora, dropout, approx=False, pack=0):
        return BertEncoderSlice(
            num_layers=2, num_heads=H, start=10, embed=False,
            dropout=dropout, lora_r=32 if lora else 0,
            lora_dropout=0.1 if lora else 0.0, freeze_base=lora,
            gelu_approximate=approx, attention_pack=pack,
            dtype=jnp.bfloat16)

    sl = make(False, 0.0)
    params = sl.init(jax.random.PRNGKey(0), x, mask, False)

    f_eval = jax.jit(lambda p, x: sl.apply(p, x, mask, False))
    print(f"slice-eval   {timeit(f_eval, params, x)*1e3:8.2f} ms")

    sl_t = make(False, 0.1)
    key = jax.random.key(1, impl="rbg")
    f_train = jax.jit(lambda p, x: sl_t.apply(
        p, x, mask, True, rngs={"dropout": key}))
    print(f"slice-train  {timeit(f_train, params, x)*1e3:8.2f} ms")

    sl_l = make(True, 0.1)
    params_l = sl_l.init(jax.random.PRNGKey(0), x, mask, False)
    f_lora = jax.jit(lambda p, x: sl_l.apply(
        p, x, mask, True, rngs={"dropout": key}))
    print(f"slice-lora   {timeit(f_lora, params_l, x)*1e3:8.2f} ms")

    sl_a = make(True, 0.1, approx=True)
    f_ap = jax.jit(lambda p, x: sl_a.apply(
        p, x, mask, True, rngs={"dropout": key}))
    print(f"slice-tanh   {timeit(f_ap, params_l, x)*1e3:8.2f} ms")

    sl_p = make(True, 0.1, approx=True, pack=-1)
    f_pk = jax.jit(lambda p, x: sl_p.apply(
        p, x, mask, True, rngs={"dropout": key}))
    print(f"slice-packed {timeit(f_pk, params_l, x)*1e3:8.2f} ms")

    sl_f = sl_p.clone(fused_attention=True)
    f_fu = jax.jit(lambda p, x: sl_f.apply(
        p, x, mask, True, rngs={"dropout": key}))
    print(f"slice-fused  {timeit(f_fu, params_l, x)*1e3:8.2f} ms")

    def loss_f(p, x):
        return jnp.sum(sl_f.apply(p, x, mask, True,
                                  rngs={"dropout": key}).astype(jnp.float32))
    gf = jax.jit(jax.value_and_grad(loss_f))
    gft = timeit(lambda p, xx: gf(p, xx)[0], params_l, x)
    print(f"grad-fused   {gft*1e3:8.2f} ms")

    def loss_p(p, x):
        return jnp.sum(sl_p.apply(p, x, mask, True,
                                  rngs={"dropout": key}).astype(jnp.float32))
    gp = jax.jit(jax.value_and_grad(loss_p))
    gpt = timeit(lambda p, xx: gp(p, xx)[0], params_l, x)
    print(f"grad-packed  {gpt*1e3:8.2f} ms")

    def loss(p, x):
        return jnp.sum(sl_l.apply(p, x, mask, True,
                                  rngs={"dropout": key}).astype(jnp.float32))
    g = jax.jit(jax.value_and_grad(loss))
    gt = timeit(lambda p, xx: g(p, xx)[0], params_l, x)
    print(f"grad-lora    {gt*1e3:8.2f} ms")

    # ---- round-4 MFU levers (VERDICT r3 item 5) -----------------------
    # lora_fold: LoRA delta folded into the base kernel (lora_dropout=0);
    # norm_bf16: LayerNorms apply in bf16 (stats stay f32)
    def make4(fold, norm16, reuse=False, drop=0.1):
        return BertEncoderSlice(
            num_layers=2, num_heads=H, start=10, embed=False,
            dropout=drop, lora_r=32, lora_dropout=0.0, freeze_base=True,
            gelu_approximate=True, attention_pack=-1, fused_attention=True,
            lora_fold=fold, norm_bf16=norm16, dropout_reuse=reuse,
            dtype=jnp.bfloat16)

    base4 = make4(False, False)
    params4 = base4.init(jax.random.PRNGKey(0), x, mask, False)
    for nm, fold, norm16, reuse, drop in [
            ("lever-none", False, False, False, 0.1),
            ("lever-fold", True, False, False, 0.1),
            ("lever-norm16", False, True, False, 0.1),
            ("lever-both", True, True, False, 0.1),
            ("lever-reuse", True, False, True, 0.1),
            ("lever-nodrop", True, False, False, 0.0)]:
        sl4 = make4(fold, norm16, reuse, drop)
        f4 = jax.jit(lambda p, xx, m=sl4: m.apply(
            p, xx, mask, True, rngs={"dropout": key}))
        t_f = timeit(f4, params4, x)

        def loss4(p, xx, m=sl4):
            return jnp.sum(m.apply(p, xx, mask, True, rngs={"dropout": key}
                                   ).astype(jnp.float32))
        g4 = jax.jit(jax.value_and_grad(loss4))
        t_g = timeit(lambda p, xx: g4(p, xx)[0], params4, x)
        print(f"{nm:12s} fwd {t_f*1e3:8.2f} ms   grad {t_g*1e3:8.2f} ms")


if __name__ == "__main__":
    main(sys.argv[1:])
