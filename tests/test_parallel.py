"""Sharding tests on the 8-device virtual CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

sys.path.insert(0, "/root/repo")


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    from legommenders_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(n_dp=4, n_mp=2)
    assert dict(mesh.shape) == {"dp": 4, "mp": 2}


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    out = jax.block_until_ready(out)
    assert np.isfinite(np.asarray(out)).all()


def test_sharded_matches_single_device():
    """One sharded train step == one single-device train step."""
    import jax.numpy as jnp
    import optax
    import __graft_entry__
    from legommenders_tpu.parallel.mesh import make_mesh
    from legommenders_tpu.parallel.train import make_sharded_train_step
    from legommenders_tpu.runtime.steps import init_params, make_train_step

    m, jbatch = __graft_entry__._build(batch=16)
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)
    opt = optax.adam(1e-3)

    # single-device
    step1 = make_train_step(m.model, m.contents.columns, opt, donate=False)
    p1, s1, loss1 = step1(params, opt.init(params), jbatch,
                          jax.random.PRNGKey(0))

    # sharded over 8 devices (dp=4, mp=2)
    mesh = make_mesh(n_dp=4, n_mp=2)
    step8, place = make_sharded_train_step(
        m.model, m.contents.columns, opt, mesh, min_rows_to_shard=2)
    with mesh:
        p, o, b = place(params, opt.init(params), jbatch)
        p8, s8, loss8 = step8(p, o, b, jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(jax.device_get(p8))
    for a, b_ in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_embedding_lookup_parity():
    """Row-sharded lookup (psum and all-gather variants) == plain take,
    forward AND gradient."""
    import jax.numpy as jnp
    from legommenders_tpu.parallel.mesh import make_mesh
    from legommenders_tpu.parallel.embed_sharded import (
        sharded_lookup, sharded_lookup_gather, pad_rows_for_sharding)

    rng = np.random.default_rng(3)
    mesh = make_mesh(n_dp=2, n_mp=4)
    V, D = 40, 16
    table = jnp.asarray(rng.normal(size=(V, D)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, V, size=(8, 6)))

    want = jnp.take(table, ids, axis=0)
    with mesh:
        for fn in (sharded_lookup, sharded_lookup_gather):
            got = fn(table, ids, mesh)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6)

        # gradient parity (psum variant)
        def loss_sharded(t):
            return jnp.sum(sharded_lookup(t, ids, mesh) ** 2)

        def loss_plain(t):
            return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

        g1 = jax.grad(loss_sharded)(table)
        g2 = jax.grad(loss_plain)(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-5, atol=1e-6)


def test_sharded_lookup_padding():
    import jax.numpy as jnp
    from legommenders_tpu.parallel.embed_sharded import pad_rows_for_sharding
    t = jnp.ones((10, 4))
    p = pad_rows_for_sharding(t, 8)
    assert p.shape == (16, 4)
    assert float(p[10:].sum()) == 0.0


def test_sequence_parallel_additive_attention():
    """SP additive pooling == single-device masked softmax pool, fwd+grad."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.ops.core import additive_attention_pool
    from legommenders_tpu.ops.sp_additive import sp_additive_attention

    rng = np.random.default_rng(5)
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, ("sp",))
    B, L, D = 6, 40, 16  # L divisible by 8 shards
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    m = jnp.asarray((rng.random((B, L)) < 0.7).astype(np.float32))

    want = additive_attention_pool(x, s, m)
    with mesh:
        got = sp_additive_attention(x, s, m, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

        def loss_sp(x, s):
            return jnp.sum(sp_additive_attention(x, s, m, mesh) ** 2)

        def loss_ref(x, s):
            return jnp.sum(additive_attention_pool(x, s, m) ** 2)

        g1 = jax.grad(loss_sp, argnums=(0, 1))(x, s)
        g2 = jax.grad(loss_ref, argnums=(0, 1))(x, s)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


def test_sharded_catalog_scoring():
    import jax.numpy as jnp
    from legommenders_tpu.parallel.mesh import make_mesh
    from legommenders_tpu.parallel.embed_sharded import sharded_catalog_scores

    rng = np.random.default_rng(9)
    mesh = make_mesh(n_dp=1, n_mp=8)
    B, N, D = 4, 64, 16
    u = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    with mesh:
        got = sharded_catalog_scores(u, it, mesh)
    want = u @ it.T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_ulysses_sequence_parallel_attention():
    """Ulysses all-to-all attention == single-device attention, fwd+grad."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.ops.core import masked_softmax
    from legommenders_tpu.ops.sp_attention import ulysses_attention

    rng = np.random.default_rng(11)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    B, L, H, d = 2, 32, 4, 8
    D = H * d
    q = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    m = jnp.asarray((rng.random((B, L)) < 0.8).astype(np.float32))

    def ref(q, k, v):
        qh = q.reshape(B, L, H, d)
        kh = k.reshape(B, L, H, d)
        vh = v.reshape(B, L, H, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
        key_mask = jnp.broadcast_to(m[:, None, None, :], scores.shape)
        attn = masked_softmax(scores, key_mask)
        return jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, L, D)

    want = ref(q, k, v)
    with mesh:
        got = ulysses_attention(q, k, v, m, mesh, num_heads=H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        g1 = jax.grad(lambda q: jnp.sum(
            ulysses_attention(q, k, v, m, mesh, num_heads=H) ** 2))(q)
        g2 = jax.grad(lambda q: jnp.sum(ref(q, k, v) ** 2))(q)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)


def test_auto_checkpoint_routes_sharded(tmp_path):
    """save_auto/load_auto: sharded params -> orbax dir (restored with the
    template's shardings); replicated/single-device -> msgpack file."""
    import os
    import jax.numpy as jnp
    import optax
    import __graft_entry__
    from legommenders_tpu.parallel.mesh import make_mesh
    from legommenders_tpu.parallel.train import make_sharded_train_step
    from legommenders_tpu.runtime.checkpoint import (
        load_auto, params_are_sharded, save_auto,
    )
    from legommenders_tpu.runtime.steps import init_params

    m, jbatch = __graft_entry__._build(batch=16)
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)
    assert not params_are_sharded(params)

    # single-device route -> msgpack file
    p1 = str(tmp_path / "ckpt.msgpack")
    written = save_auto(p1, params, meta={"epoch": 1})
    assert written == p1 and os.path.isfile(p1)
    re1, _, meta1 = load_auto(p1, params, model_only=True)
    assert meta1["epoch"] == 1

    # mesh-sharded route -> orbax dir
    opt = optax.adam(1e-3)
    mesh = make_mesh(n_dp=4, n_mp=2)
    _, place = make_sharded_train_step(
        m.model, m.contents.columns, opt, mesh, min_rows_to_shard=2)
    with mesh:
        sp, so, _ = place(params, opt.init(params), jbatch)
    assert params_are_sharded(sp)
    p2 = str(tmp_path / "ckpt_sharded")
    written = save_auto(p2, sp, so, meta={"epoch": 2})
    assert written == p2 + ".orbax" and os.path.isdir(written)
    re2, ro2, meta2 = load_auto(p2, sp, so)
    assert meta2["epoch"] == 2
    for a, b in zip(jax.tree_util.tree_leaves(sp),
                    jax.tree_util.tree_leaves(re2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored leaves keep the template sharding
    some = jax.tree_util.tree_leaves(re2)[0]
    assert getattr(some, "sharding", None) is not None


def test_flatten_transformer_sequence_parallel_parity():
    """FlattenTransformerOperator with sequence_parallel=True under an SP
    mesh matches the local path on identical params (fwd + grad)."""
    import jax.numpy as jnp
    from legommenders_tpu.models.operators.transformer import (
        FlattenTransformerOperator,
    )
    from legommenders_tpu.parallel.mesh import make_mesh, sequence_parallel

    B, L, D, H = 2, 16, 32, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L)) > 0.2).astype(np.int32))
    mask = mask.at[:, 0].set(1)

    local = FlattenTransformerOperator(
        hidden_size=D, input_dim=D, num_hidden_layers=2,
        num_attention_heads=H, attention_dropout=0.0)
    sp_op = FlattenTransformerOperator(
        hidden_size=D, input_dim=D, num_hidden_layers=2,
        num_attention_heads=H, attention_dropout=0.0,
        sequence_parallel=True)
    params = local.init(jax.random.PRNGKey(0), x, mask)
    want = local.apply(params, x, mask)

    mesh = make_mesh(n_dp=1, n_mp=2, n_sp=4)
    with sequence_parallel(mesh), mesh:
        got = sp_op.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        # grads agree too (collectives differentiate correctly)
        g_sp = jax.grad(lambda p: jnp.sum(sp_op.apply(p, x, mask) ** 2))(
            params)
    g_local = jax.grad(lambda p: jnp.sum(local.apply(p, x, mask) ** 2))(
        params)
    for a, b in zip(jax.tree_util.tree_leaves(g_local),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_gpipe_matches_sequential():
    """4-stage GPipe over a 'pp' mesh == sequential layer application,
    forward and gradient."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.parallel.pipeline import gpipe

    P_, B, D, M = 4, 16, 8, 4
    rng = np.random.default_rng(0)
    Ws = jnp.asarray(rng.normal(size=(P_, D, D)).astype(np.float32)) * 0.3
    bs = jnp.asarray(rng.normal(size=(P_, D)).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    def stage(params, xm):
        W, b = params
        return jnp.tanh(xm @ W + b)

    def sequential(Ws, bs, x):
        for i in range(P_):
            x = stage((Ws[i], bs[i]), x)
        return x

    want = sequential(Ws, bs, x)
    devices = np.asarray(jax.devices()[:P_]).reshape(P_)
    mesh = Mesh(devices, ("pp",))

    def piped(Ws, bs, x):
        # keep the (P, 1, ...) stage grouping: leading axis sharded
        return gpipe(lambda p, xm: stage((p[0][0], p[1][0]), xm),
                     (Ws[:, None], bs[:, None]), x, mesh,
                     num_microbatches=M)

    got = piped(Ws, bs, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda W: jnp.sum(sequential(W, bs, x) ** 2))(Ws)
    g2 = jax.grad(lambda W: jnp.sum(piped(W, bs, x) ** 2))(Ws)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               rtol=1e-4, atol=1e-5)


def test_gpipe_lm_layer_stack():
    """Pipeline the Llama decoder layers of an LM slice across 2 stages
    and match the sequential slice output."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.models.lm.layers import LlamaDecoderSlice
    from legommenders_tpu.parallel.pipeline import (
        gpipe, stack_layer_params,
    )

    B, L, D, H, NL = 8, 6, 16, 2, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.ones((B, L), jnp.int32)
    sl = LlamaDecoderSlice(num_layers=NL, num_heads=H, intermediate_size=32,
                           final_norm=False, dtype=jnp.float32)
    variables = sl.init(jax.random.PRNGKey(0), x, mask)
    want = sl.apply(variables, x, mask)

    from legommenders_tpu.models.lm.layers import LlamaDecoderLayer
    layer = LlamaDecoderLayer(num_heads=H, intermediate_size=32,
                              dtype=jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.tril(jnp.ones((L, L), bool))
    mask_bias = jnp.where(causal[None, None], 0.0, neg)

    stacked = stack_layer_params(
        variables["params"], [f"layer_{i}" for i in range(NL)],
        layers_per_stage=2)

    def stage(params2, xm):
        # two sequential layers per stage
        for j in range(2):
            p = jax.tree_util.tree_map(lambda a: a[j], params2)
            xm = layer.apply({"params": p}, xm, mask_bias)
        return xm

    devices = np.asarray(jax.devices()[:2]).reshape(2)
    mesh = Mesh(devices, ("pp",))
    got = gpipe(stage, stacked, x, mesh, num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_expert_parallel_crossnetmix():
    """DCNv2 CrossNetMix expert tensors shard over mp; one sharded train
    step matches the single-device step."""
    import jax.numpy as jnp
    import optax
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.parallel.mesh import (
        make_mesh, params_shardings, MP_AXIS,
    )
    from legommenders_tpu.parallel.train import make_sharded_train_step
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params, make_train_step

    data = SyntheticProcessor(num_items=40, num_users=20, title_len=8,
                              history_len=6,
                              inters_per_user=10).as_lego_data()
    m = Manager({}, {"meta": {"item": "CNN", "user": "Ada",
                              "predictor": "DCNv2"},
                     "config": {"hidden_size": 16, "use_fast_eval": False,
                                "predictor_config": {
                                    "use_low_rank_mixture": True,
                                    "low_rank": 8, "num_experts": 4,
                                    "parallel_dnn_hidden_units": (32,)}}},
                exp_cfg={"policy": {"batch_size": 16}}, data=data)
    tb = m.train_batcher(seed=0)
    import jax.numpy as jnp2
    jbatch = {k: jnp2.asarray(v) for k, v in next(tb.epoch()).items()}
    params = init_params(m.model, jbatch, m.contents.columns, seed=0)

    mesh = make_mesh(n_dp=2, n_mp=4)
    shardings = params_shardings(params, mesh)
    flat = jax.tree_util.tree_map_with_path(
        lambda p, s: ("/".join(str(getattr(q, "key", "")) for q in p), s),
        shardings)
    expert_sharded = [
        (path, s) for path, s in jax.tree_util.tree_leaves(
            flat, is_leaf=lambda x: isinstance(x, tuple))
        if "CrossNetMix" in path and ("U_" in path or "V_" in path
                                      or "C_" in path)]
    assert expert_sharded, "no CrossNetMix expert params found"
    for path, s in expert_sharded:
        assert s.spec[0] == MP_AXIS, f"{path} not expert-sharded: {s.spec}"

    # gradient parity (adam would amplify fp noise on analytically-zero
    # bias grads, so compare grads rather than post-update params)
    from legommenders_tpu.runtime.steps import make_loss_fn
    loss_fn = make_loss_fn(m.model, m.contents.columns, True)
    loss1, g1 = jax.value_and_grad(loss_fn)(params, jbatch,
                                            jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    step8, place = make_sharded_train_step(
        m.model, m.contents.columns, opt, mesh, min_rows_to_shard=2)
    with mesh:
        p, o, b = place(params, opt.init(params), jbatch)
        sharded_grad = jax.jit(jax.value_and_grad(loss_fn))
        loss8, g8 = sharded_grad(p, b, jax.random.PRNGKey(0))
        # one full sharded train step also executes
        p8, _, _ = step8(p, o, b, jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(jax.device_get(g8))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=1e-5)


def test_pipeline_stages_bert_slice_parity():
    """First-class pipeline_stages knob: a BertEncoderSlice with
    pipeline_stages=2 under a pp mesh matches the serial slice — forward
    AND LoRA gradients (deterministic graph; dropout rngs differ by
    construction under pipelining)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.models.lm.layers import BertEncoderSlice
    from legommenders_tpu.parallel.mesh import pipeline_parallel

    B, L, D = 8, 6, 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    mask = np.ones((B, L), np.int32)
    mask[3, 4:] = 0
    mask = jnp.asarray(mask)

    kw = dict(num_layers=2, num_heads=2, start=0, embed=False,
              dropout=0.0, lora_r=2, lora_dropout=0.0, freeze_base=True)
    serial = BertEncoderSlice(**kw)
    piped = BertEncoderSlice(**kw, pipeline_stages=2,
                             pipeline_microbatches=4)
    params = serial.init(jax.random.PRNGKey(0), x, mask, False)

    y0 = serial.apply(params, x, mask, False)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("pp",))
    with pipeline_parallel(mesh):
        y1 = piped.apply(params, x, mask, False)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=2e-5, atol=2e-5)

        def loss_pp(p):
            return jnp.sum(piped.apply(p, x, mask, False) ** 2)
        g1 = jax.grad(loss_pp)(params)

    def loss_serial(p):
        return jnp.sum(serial.apply(p, x, mask, False) ** 2)
    g0 = jax.grad(loss_serial)(params)

    flat0 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(g0)}
    flat1 = {jax.tree_util.keystr(k): v for k, v in
             jax.tree_util.tree_leaves_with_path(g1)}
    assert flat0.keys() == flat1.keys()
    lora_grads = 0.0
    for k in flat0:
        np.testing.assert_allclose(np.asarray(flat1[k]),
                                   np.asarray(flat0[k]),
                                   rtol=5e-5, atol=5e-5, err_msg=k)
        if "lora_" in k:
            lora_grads += float(np.abs(np.asarray(flat0[k])).sum())
    assert lora_grads > 0


def test_pipeline_stages_llama_slice_parity():
    """Same knob on the Llama decoder slice (causal mask + final RMSNorm
    outside the staged stack), pp=4 with 4 layers."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.models.lm.layers import LlamaDecoderSlice
    from legommenders_tpu.parallel.mesh import pipeline_parallel

    B, L, D = 8, 5, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, L), np.int32))

    kw = dict(num_layers=4, num_heads=2, intermediate_size=32, start=0,
              final_norm=True, dtype=jnp.float32)
    serial = LlamaDecoderSlice(**kw)
    piped = LlamaDecoderSlice(**kw, pipeline_stages=4)
    params = serial.init(jax.random.PRNGKey(0), x, mask, False)
    y0 = serial.apply(params, x, mask, False)
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("pp",))
    with pipeline_parallel(mesh):
        y1 = piped.apply(params, x, mask, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_matches_dense():
    """Ring attention (rotating K/V + online softmax) equals dense masked
    attention and the Ulysses path — fwd and grad — on the 8-way sp mesh."""
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from legommenders_tpu.ops.core import masked_softmax
    from legommenders_tpu.ops.ring_attention import ring_attention

    B, L, D, H = 4, 32, 32, 4
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
               for _ in range(3))
    mask = np.ones((B, L), np.float32)
    mask[1, 20:] = 0
    mask[2, :] = 0          # fully-masked row -> zeros by convention
    mask = jnp.asarray(mask)

    def dense(q, k, v, mask):
        d = D // H
        qh = q.reshape(B, L, H, d)
        kh = k.reshape(B, L, H, d)
        vh = v.reshape(B, L, H, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
        attn = masked_softmax(
            scores, jnp.broadcast_to(mask[:, None, None, :], scores.shape))
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
        return out.reshape(B, L, D)

    ref = dense(q, k, v, mask)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    got = ring_attention(q, k, v, mask, mesh, num_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # grads w.r.t. q/k/v match dense
    def loss_ring(args):
        return jnp.sum(ring_attention(*args, mask, mesh, num_heads=H) ** 2)

    def loss_dense(args):
        return jnp.sum(dense(*args, mask) ** 2)

    g1 = jax.grad(loss_ring)((q, k, v))
    g0 = jax.grad(loss_dense)((q, k, v))
    for a, b in zip(g1, g0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_flatten_transformer_ring_attention_parity():
    """Same operator parity as the Ulysses test but with sp_impl='ring' —
    rotating-KV attention must match the local path on identical params."""
    import jax.numpy as jnp
    from legommenders_tpu.models.operators.transformer import (
        FlattenTransformerOperator,
    )
    from legommenders_tpu.parallel.mesh import make_mesh, sequence_parallel

    B, L, D, H = 2, 16, 32, 2   # H=2 with sp=4: ring has no head constraint
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    mask = jnp.asarray((rng.random((B, L)) > 0.2).astype(np.int32))
    mask = mask.at[:, 0].set(1)

    local = FlattenTransformerOperator(
        hidden_size=D, input_dim=D, num_hidden_layers=2,
        num_attention_heads=H, attention_dropout=0.0)
    sp_op = FlattenTransformerOperator(
        hidden_size=D, input_dim=D, num_hidden_layers=2,
        num_attention_heads=H, attention_dropout=0.0,
        sequence_parallel=True, sp_impl="ring")
    params = local.init(jax.random.PRNGKey(0), x, mask)
    want = local.apply(params, x, mask)

    mesh = make_mesh(n_dp=1, n_mp=2, n_sp=4)
    with sequence_parallel(mesh), mesh:
        got = sp_op.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-5)
        g_sp = jax.grad(lambda p: jnp.sum(sp_op.apply(p, x, mask) ** 2))(
            params)
    g_local = jax.grad(lambda p: jnp.sum(local.apply(p, x, mask) ** 2))(
        params)
    for a, b in zip(jax.tree_util.tree_leaves(g_local),
                    jax.tree_util.tree_leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_lm_tensor_parallel_matches_single_device():
    """Megatron-TP shardings on the BERT slice (qkv/fc1 column-sharded,
    out/fc2 row-sharded over mp): one sharded train step of a bert model
    equals the single-device step, and the kernels really are sharded."""
    import jax.numpy as jnp
    import optax
    from jax.sharding import PartitionSpec as P
    from legommenders_tpu.data.pipeline import TrainBatcher
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.parallel.mesh import make_mesh, params_shardings
    from legommenders_tpu.parallel.train import make_sharded_train_step
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params, make_train_step

    data = SyntheticProcessor(num_items=40, num_users=20, title_len=6,
                              history_len=4, inters_per_user=8
                              ).as_lego_data()
    cfg = {"meta": {"item": "Bert", "user": "Ada", "predictor": "Dot"},
           "config": {"use_item_content": True, "hidden_size": 16,
                      "embedding_dim": 32, "use_neg_sampling": True,
                      "neg_count": 2,
                      "item_config": {"tune_from": None,
                                      "num_hidden_layers": 2,
                                      "num_attention_heads": 2,
                                      "use_lora": False,
                                      "lm_dtype": jnp.float32}}}
    m = Manager({}, cfg, exp_cfg={"policy": {"batch_size": 8}}, data=data)
    batch = {k: jnp.asarray(v) for k, v in
             next(TrainBatcher(data, 8, neg_count=2, seed=0).epoch()).items()}
    params = init_params(m.model, batch, m.contents.columns, seed=0)
    opt = optax.adam(1e-3)

    step1 = make_train_step(m.model, m.contents.columns, opt, donate=False)
    p1, _, loss1 = step1(params, opt.init(params), batch,
                         jax.random.PRNGKey(0))

    mesh = make_mesh(n_dp=2, n_mp=2, devices=jax.devices()[:4])
    # the TP rule must actually fire on the attention/FFN kernels
    specs = params_shardings(params, mesh)
    flat = {jax.tree_util.keystr(k): s.spec for k, s in
            jax.tree_util.tree_leaves_with_path(specs)}
    qspec = [s for k, s in flat.items()
             if "query" in k and k.endswith("['kernel']")]
    ospec = [s for k, s in flat.items()
             if "attention']['output" in k and k.endswith("['kernel']")]
    assert qspec and all(s == P(None, "mp") for s in qspec), qspec
    assert ospec and all(s == P("mp", None) for s in ospec), ospec

    step8, place = make_sharded_train_step(
        m.model, m.contents.columns, opt, mesh, min_rows_to_shard=2)
    with mesh:
        p, o, b = place(params, opt.init(params), batch)
        p8, _, loss8 = step8(p, o, b, jax.random.PRNGKey(0))
    assert float(loss1) == pytest.approx(float(loss8), rel=1e-4)
    f1 = jax.tree_util.tree_leaves_with_path(p1)
    f8 = dict(jax.tree_util.tree_leaves_with_path(jax.device_get(p8)))
    for k, a in f1:
        ks = jax.tree_util.keystr(k)
        if "['key']['bias']" in ks:
            # softmax is invariant to a constant shift of all key scores,
            # so the key bias has an exactly-zero mathematical gradient;
            # adam then amplifies f32 reduction noise to ~lr, and the
            # noise sign legitimately differs between partitionings
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(f8[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=ks)
