"""LM operator family: full mode, layer-split cache mode, LoRA, IISAN."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.pipeline import TrainBatcher
from legommenders_tpu.models.lego_config import LegoConfig
from legommenders_tpu.runtime.manager import Manager
from legommenders_tpu.runtime.steps import init_params, make_loss_fn

TINY_LM = {"num_hidden_layers": 2, "num_attention_heads": 2,
           "max_position": 64, "lm_dtype": jnp.float32}


@pytest.fixture(scope="module")
def synth():
    return SyntheticProcessor(num_items=40, num_users=20, title_len=8,
                              history_len=6,
                              inters_per_user=10).as_lego_data()


def build_manager(synth, item_op, item_cfg, hidden=16):
    model_cfg = {
        "name": item_op,
        "meta": {"item": item_op, "user": "Ada", "predictor": "Dot"},
        "config": {"use_item_content": True, "hidden_size": hidden,
                   "embedding_dim": 16, "use_neg_sampling": True,
                   "item_config": item_cfg},
    }
    return Manager({}, model_cfg,
                   exp_cfg={"policy": {"batch_size": 4}}, data=synth)


def _first_batch(m):
    tb = m.train_batcher(seed=0)
    return {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}


def test_bert_full_mode(synth):
    m = build_manager(synth, "Bert", {**TINY_LM, "use_lora": False})
    batch = _first_batch(m)
    params = init_params(m.model, batch, m.contents.columns)
    scores = m.model.apply(params, batch, m.contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()
    # gradients flow into the LM base weights (no LoRA -> trainable)
    loss_fn = make_loss_fn(m.model, m.contents.columns, True)
    _, grads = jax.value_and_grad(loss_fn)(params, batch,
                                           jax.random.PRNGKey(0))
    lm_grads = grads["params"]["item_op"]["lm"]
    total = sum(float(np.abs(np.asarray(g)).sum())
                for g in jax.tree_util.tree_leaves(lm_grads))
    assert total > 0


def test_bert_layer_split_with_lora(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # cache/ written to cwd
    m = build_manager(synth, "Bert",
                      {**TINY_LM, "tune_from": 1, "use_lora": True,
                       "lora_r": 2})
    op = m.model.item_op
    assert op.use_lm_cache
    batch = _first_batch(m)
    params = init_params(m.model, batch, m.contents.columns)
    assert m.prepare_lm_cache(params)
    from legommenders_tpu.models.operators.lm_ops import LM_HIDDEN_KEY
    assert LM_HIDDEN_KEY in m.contents.columns
    N = synth.num_items
    assert m.contents.columns[LM_HIDDEN_KEY].shape[0] == N

    scores = m.model.apply(params, batch, m.contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()

    # with LoRA, base LM kernels receive ZERO grad; lora_A/B receive grad
    loss_fn = make_loss_fn(m.model, m.contents.columns, True)
    _, grads = jax.value_and_grad(loss_fn)(params, batch,
                                           jax.random.PRNGKey(0))
    flat = jax.tree_util.tree_leaves_with_path(grads)
    base_total, lora_total = 0.0, 0.0
    for path, g in flat:
        keys = [str(getattr(p, "key", "")) for p in path]
        if "lm" not in keys:
            continue
        s = float(np.abs(np.asarray(g)).sum())
        if any(k.startswith("lora_") for k in keys):
            lora_total += s
        elif keys[-1] in ("kernel", "bias"):
            base_total += s
    assert lora_total > 0, "LoRA params got no gradient"
    assert base_total == 0, "frozen base weights got gradient"

    # second call loads from disk cache
    m2 = build_manager(synth, "Bert",
                       {**TINY_LM, "tune_from": 1, "use_lora": True,
                        "lora_r": 2})
    assert m2.prepare_lm_cache(params)


def test_opt_and_llama_tiny(synth):
    for op_name, extra in (("OPT", {}),
                           ("Llama", {"intermediate_size": 32}),):
        m = build_manager(synth, op_name,
                          {**TINY_LM, "use_lora": False,
                           "lm_dtype": jnp.float32, **extra})
        batch = _first_batch(m)
        params = init_params(m.model, batch, m.contents.columns)
        scores = m.model.apply(params, batch, m.contents.columns,
                               training=False)
        assert scores.shape == (4, 5)
        assert np.isfinite(np.asarray(scores)).all()


def test_iisan(synth, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    m = build_manager(synth, "BertIISAN",
                      {**TINY_LM, "layer_selection_step": 1})
    op = m.model.item_op
    assert op.use_lm_cache and op.is_iisan
    assert op.get_selected_layers() == [0, 1]
    batch = _first_batch(m)
    params = init_params(m.model, batch, m.contents.columns)
    assert m.prepare_lm_cache(params)
    from legommenders_tpu.models.operators.lm_ops import LM_HIDDEN_KEY
    states = m.contents.columns[LM_HIDDEN_KEY]
    assert states.shape == (synth.num_items, 2, 16)
    scores = m.model.apply(params, batch, m.contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_lm_trainer_end_to_end(synth, tmp_path, monkeypatch):
    """Trainer drives a tune_from BERT + LoRA model: lm-cache prepared at
    init, dual item_lr labels only the LM subtree, training runs."""
    monkeypatch.chdir(tmp_path)
    import optax
    from legommenders_tpu.runtime.trainer import Trainer

    m = build_manager(synth, "Bert",
                      {**TINY_LM, "tune_from": 1, "use_lora": True,
                       "lora_r": 2})
    m.policy.update({"epoch": 2, "lr": 3e-3, "item_lr": 1e-4,
                     "batch_size": 4})
    m.metrics = ["GAUC"]
    tr = Trainer(m, seed=3)
    tr.init()
    from legommenders_tpu.models.operators.lm_ops import LM_HIDDEN_KEY
    assert LM_HIDDEN_KEY in m.contents.columns  # cache prepared at init
    # dual-LR labels: only item_op/lm params marked "item"
    labels = tr.optimizer  # multi_transform built
    tr.train()
    res = tr.test()
    assert np.isfinite(res["GAUC"])


def test_partial_interleaved_rotary_math():
    """ChatGLM rotary: first rot_dim dims rotate in (even, odd) pairs at
    frequencies base^(-2i/rot_dim); the tail passes through. Checked
    against an independent per-position complex-rotation computation."""
    from legommenders_tpu.models.lm.layers import (
        apply_rotary_partial_interleaved, rotary_interleaved_embedding,
    )
    rng = np.random.default_rng(0)
    B, L, H, d, rot = 2, 5, 3, 8, 4
    x = rng.normal(size=(B, L, H, d)).astype(np.float32)
    cos, sin = rotary_interleaved_embedding(L, rot)
    got = np.asarray(apply_rotary_partial_interleaved(
        jnp.asarray(x), cos, sin))

    inv_freq = 1.0 / (10000.0 ** (np.arange(0, rot, 2) / rot))
    want = x.copy()
    for l in range(L):
        for p in range(rot // 2):
            ang = l * inv_freq[p]
            c, s = np.cos(ang), np.sin(ang)
            x0 = x[:, l, :, 2 * p].copy()
            x1 = x[:, l, :, 2 * p + 1].copy()
            want[:, l, :, 2 * p] = x0 * c - x1 * s
            want[:, l, :, 2 * p + 1] = x1 * c + x0 * s
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_glm_geometry_and_checkpoint_mapping(synth):
    """GLM operator runs with MQA + qkv-bias + partial rotary, and
    glm_slice_params maps a (synthetic) fused ChatGLM state dict onto the
    exact param tree."""
    from legommenders_tpu.models.lm import hf_loader

    H, G, d, D, FFN, N = 4, 2, 4, 16, 24, 2
    m = build_manager(synth, "GLM",
                      {**TINY_LM, "use_lora": False,
                       "num_hidden_layers": N, "num_attention_heads": H,
                       "num_kv_heads": G, "intermediate_size": FFN})
    batch = _first_batch(m)
    params = init_params(m.model, batch, m.contents.columns)
    scores = m.model.apply(params, batch, m.contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()

    # synthetic fused ChatGLM checkpoint
    rng = np.random.default_rng(1)
    sd = {}
    for i in range(N):
        p = f"transformer.encoder.layers.{i}."
        sd[p + "input_layernorm.weight"] = rng.normal(size=(D,))
        sd[p + "self_attention.query_key_value.weight"] = rng.normal(
            size=((H + 2 * G) * d, D))
        sd[p + "self_attention.query_key_value.bias"] = rng.normal(
            size=((H + 2 * G) * d,))
        sd[p + "self_attention.dense.weight"] = rng.normal(size=(D, D))
        sd[p + "post_attention_layernorm.weight"] = rng.normal(size=(D,))
        sd[p + "mlp.dense_h_to_4h.weight"] = rng.normal(size=(2 * FFN, D))
        sd[p + "mlp.dense_4h_to_h.weight"] = rng.normal(size=(D, FFN))
    sd["transformer.encoder.final_layernorm.weight"] = rng.normal(size=(D,))
    sd = {k: v.astype(np.float32) for k, v in sd.items()}

    mapped = hf_loader.glm_slice_params(sd, 0, N, H, G, final_norm=True)
    target = params["params"]["item_op"]["lm"]
    # exact tree-structure + shape match against the initialized module
    t1 = jax.tree_util.tree_structure(target)
    t2 = jax.tree_util.tree_structure(mapped)
    assert t1 == t2, f"{t1} != {t2}"
    for a, b in zip(jax.tree_util.tree_leaves(target),
                    jax.tree_util.tree_leaves(mapped)):
        assert np.shape(a) == np.shape(b)

    # fused-split correctness: q/k/v rows land in order
    qkv = sd["transformer.encoder.layers.0.self_attention.query_key_value.weight"]
    np.testing.assert_array_equal(
        np.asarray(mapped["layer_0"]["q_proj"]["kernel"]), qkv[: H * d].T)
    np.testing.assert_array_equal(
        np.asarray(mapped["layer_0"]["k_proj"]["kernel"]),
        qkv[H * d: H * d + G * d].T)
    np.testing.assert_array_equal(
        np.asarray(mapped["layer_0"]["v_proj"]["kernel"]),
        qkv[H * d + G * d:].T)
    gate = sd["transformer.encoder.layers.0.mlp.dense_h_to_4h.weight"][:FFN]
    np.testing.assert_array_equal(
        np.asarray(mapped["layer_0"]["gate_proj"]["kernel"]), gate.T)

    # merged weights actually change the forward
    merged = hf_loader.merge_lm_params(params, mapped)
    s2 = m.model.apply(merged, batch, m.contents.columns, training=False)
    assert np.isfinite(np.asarray(s2)).all()
    assert not np.allclose(np.asarray(scores), np.asarray(s2))


def test_gelu_approximate_knob():
    """tanh-gelu knob: same params apply, small output delta vs exact erf,
    and the lm-cache fingerprint distinguishes the two variants."""
    from legommenders_tpu.models.lm.layers import BertEncoderSlice
    from legommenders_tpu.models.operators.lm_ops import BertOperator
    from legommenders_tpu.runtime.lm_cache import (
        arch_key, weights_fingerprint)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 32)),
                    jnp.float32)
    mask = jnp.ones((2, 5), jnp.int32)
    exact = BertEncoderSlice(num_layers=1, num_heads=2, embed=False)
    approx = exact.clone(gelu_approximate=True)
    params = exact.init(jax.random.PRNGKey(0), x, mask, False)
    y0 = exact.apply(params, x, mask, False)
    y1 = approx.apply(params, x, mask, False)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))
    assert float(jnp.max(jnp.abs(y0 - y1))) < 1e-2

    op0 = BertOperator(hidden_size=16, input_dim=32, num_hidden_layers=1,
                       num_attention_heads=2)
    op1 = op0.clone(gelu_approximate=True)
    assert arch_key(op0) != arch_key(op1)
    p = {"params": {"item_op": params["params"]}}
    assert (weights_fingerprint(p, extra=arch_key(op0))
            != weights_fingerprint(p, extra=arch_key(op1)))


def test_attention_pack_parity():
    """Packed block-diag attention == unpacked per-item attention (exact
    zeros from masked lanes), incl. ragged masks and B % G != 0."""
    from legommenders_tpu.models.lm.layers import BertEncoderSlice

    rng = np.random.default_rng(1)
    B, L, D = 7, 9, 32
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    lens = rng.integers(1, L + 1, B)
    mask = jnp.asarray((np.arange(L)[None] < lens[:, None]).astype(np.int32))
    base = BertEncoderSlice(num_layers=2, num_heads=2, embed=True,
                            dropout=0.0)
    packed = base.clone(attention_pack=-1)
    params = base.init(jax.random.PRNGKey(0), x, mask, False)
    y0 = base.apply(params, x, mask, False)
    y1 = packed.apply(params, x, mask, False)
    assert y1.shape == y0.shape
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-5, atol=1e-5)

    # IISAN pooled collection under packing
    pooled0 = base.clone(collect_pooled=True).apply(params, x, mask, False)
    pooled1 = packed.clone(collect_pooled=True).apply(params, x, mask, False)
    np.testing.assert_allclose(np.asarray(pooled0), np.asarray(pooled1),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("family", ["bert", "bert-lora", "llama", "glm",
                                    "opt"])
def test_fused_qkv_parity(family):
    """fused_qkv: one concatenated base GEMM == three per-projection GEMMs
    (exact math), with an IDENTICAL param tree — the same params apply to
    both variants, so checkpoints/HF mapping are unaffected. Covers LoRA
    (frozen base + low-rank delta), GQA + qkv bias (GLM), and OPT."""
    from legommenders_tpu.models.lm.layers import (
        BertEncoderSlice, LlamaDecoderSlice, OPTDecoderSlice)

    rng = np.random.default_rng(3)
    B, L, D = 5, 9, 32
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    lens = rng.integers(1, L + 1, B)
    mask = jnp.asarray((np.arange(L)[None] < lens[:, None]).astype(np.int32))
    if family == "bert":
        base = BertEncoderSlice(num_layers=2, num_heads=2, embed=True,
                                dropout=0.0)
    elif family == "bert-lora":
        base = BertEncoderSlice(num_layers=2, num_heads=2, embed=False,
                                dropout=0.0, lora_r=2, freeze_base=True)
    elif family == "llama":
        base = LlamaDecoderSlice(num_layers=2, num_heads=2,
                                 dtype=jnp.float32)
    elif family == "glm":
        base = LlamaDecoderSlice(num_layers=2, num_heads=4, num_kv_heads=2,
                                 qkv_bias=True, rotary_fraction=0.5,
                                 rotary_interleaved=True, dtype=jnp.float32)
    else:
        base = OPTDecoderSlice(num_layers=2, num_heads=2,
                               embed_positions=False, dtype=jnp.float32)
    fused = base.clone(fused_qkv=True)
    params = base.init(jax.random.PRNGKey(0), x, mask, False)
    params_f = fused.init(jax.random.PRNGKey(0), x, mask, False)
    # identical tree AND identical values (flax derives init RNG from the
    # param path, which ProjParams preserves)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y0 = base.apply(params, x, mask, False)
    y1 = fused.apply(params, x, mask, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)
    if family == "bert-lora":
        # grads: frozen base still zero, LoRA still flows, under fusion
        def loss(p):
            return jnp.sum(fused.apply(p, x, mask, False) ** 2)
        g = jax.grad(loss)(params)["params"]
        attn = g["layer_0"]["attention"]
        assert float(np.abs(np.asarray(attn["query"]["kernel"])).sum()) == 0
        # lora_B inits to zeros, so lora_A's grad is exactly zero at init
        # (dL/dA factors through B) — lora_B is the live signal
        assert float(np.abs(np.asarray(attn["query"]["lora_B"])).sum()) > 0


@pytest.mark.parametrize("family", ["llama", "glm", "opt"])
def test_attention_pack_parity_causal(family):
    """Packed causal attention == unpacked, incl. per-item rotary restart
    (plain + GLM partial-interleaved geometry)."""
    from legommenders_tpu.models.lm.layers import (
        LlamaDecoderSlice, OPTDecoderSlice)

    rng = np.random.default_rng(2)
    B, L, D = 7, 9, 32
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    lens = rng.integers(1, L + 1, B)
    mask = jnp.asarray((np.arange(L)[None] < lens[:, None]).astype(np.int32))
    if family == "llama":
        base = LlamaDecoderSlice(num_layers=2, num_heads=2,
                                 dtype=jnp.float32)
    elif family == "glm":
        base = LlamaDecoderSlice(num_layers=2, num_heads=4, num_kv_heads=2,
                                 qkv_bias=True, rotary_fraction=0.5,
                                 rotary_interleaved=True, dtype=jnp.float32)
    else:
        base = OPTDecoderSlice(num_layers=2, num_heads=2,
                               embed_positions=False, dtype=jnp.float32)
    packed = base.clone(attention_pack=-1)
    params = base.init(jax.random.PRNGKey(0), x, mask, False)
    y0 = base.apply(params, x, mask, False)
    y1 = packed.apply(params, x, mask, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-5, atol=2e-5)
