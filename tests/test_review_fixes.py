"""Regression tests for the round-1 code-review findings."""
import numpy as np
import pytest

from legommenders_tpu.data.token_store import TokenStore
from legommenders_tpu.data.pipeline import Prefetcher


def test_filter_cache_keyed_by_lineage(tmp_path):
    """Chained/changed filters must not reuse stale cached indices."""
    cache = str(tmp_path)

    def fresh():
        st = TokenStore()
        st.add_scalar_column("x", np.arange(10, dtype=np.int32))
        return st

    # run 1: A = x>=5 then B = x%2==0
    st = fresh()
    a1 = st.filter("x", "lambda x: x >= 5", cache_dir=cache)
    st1 = st.select(a1, tag="filter:x:a")
    b1 = st1.filter("x", "lambda x: x % 2 == 0", cache_dir=cache)
    got1 = st1["x"][b1]
    np.testing.assert_array_equal(sorted(got1), [6, 8])

    # run 2: A' = x>=2 then same B — must NOT hit run 1's B cache
    st = fresh()
    a2 = st.filter("x", "lambda x: x >= 2", cache_dir=cache)
    st2 = st.select(a2, tag="filter:x:a2")
    b2 = st2.filter("x", "lambda x: x % 2 == 0", cache_dir=cache)
    got2 = st2["x"][b2]
    np.testing.assert_array_equal(sorted(got2), [2, 4, 6, 8])


def test_callable_filters_not_cached(tmp_path):
    st = TokenStore()
    st.add_scalar_column("x", np.arange(6, dtype=np.int32))
    st.filter("x", lambda v: v > 2, cache_dir=str(tmp_path))
    import os
    assert not os.path.isdir(os.path.join(str(tmp_path), "filters")) or \
        not os.listdir(os.path.join(str(tmp_path), "filters"))


def test_view_protects_storehub_cache():
    """truncate on a loaded store must not mutate the cached original."""
    st = TokenStore()
    st.add_seq_column("h", [[1, 2, 3, 4]], "v", 4)
    view = st.view()
    view.truncate("h", 2)
    assert st["h"].shape == (1, 4)      # original intact
    assert view["h"].shape == (1, 2)


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        yield 2
        raise RuntimeError("boom")

    items = []
    with pytest.raises(RuntimeError, match="boom"):
        for x in Prefetcher(gen()):
            items.append(x)
    assert items == [1, 2]


def test_prefetcher_close_releases_producer():
    import threading

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    p = Prefetcher(gen(), depth=2)
    next(p)
    p.close()
    # producer must wind down (not stay blocked on a full queue forever)
    p._thread.join(timeout=5)
    assert not p._thread.is_alive()


def test_simple_dev_direction():
    """simple_dev monitors raw loss with minimize=True."""
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.trainer import Trainer

    data = SyntheticProcessor(num_items=40, num_users=20).as_lego_data()
    m = Manager({}, {"meta": {"item": "CNN", "user": "Ada",
                              "predictor": "Dot"},
                     "config": {"use_item_content": True,
                                "hidden_size": 8}},
                exp_cfg={"policy": {"batch_size": 8, "simple_dev": True},
                         "store": {"metric": "GAUC"}}, data=data)
    tr = Trainer(m, seed=0)
    assert tr.monitor.minimize is True
    tr.init()
    loss = tr.dev()
    assert loss > 0  # raw CE loss, not negated


def test_dotted_override_creates_path():
    from legommenders_tpu.config.parser import parse_four_way
    cfg = parse_four_way({"model": "naml",
                          "model.config.item_config.tune_from": 6},
                         config_root="config")
    assert cfg.model.config.item_config.tune_from == 6


def test_pretrained_smaller_than_vocab_raises():
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.models.lego_config import LegoConfig

    data = SyntheticProcessor(num_items=40, num_users=20).as_lego_data()
    small = np.zeros((10, 16), np.float32)  # word vocab is 500
    cfg = LegoConfig(data=data, item_operator="CNN", user_operator="Ada",
                     predictor="Dot", hidden_size=16,
                     embed_config={"embeddings": [
                         {"vocab_name": "word", "path": small,
                          "frozen": True}]})
    with pytest.raises(ValueError, match="rows"):
        cfg.build()


def test_hf_weight_loading(tmp_path, monkeypatch):
    """Fake HF BERT checkpoint -> params actually carry its weights."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from legommenders_tpu.config.dotfiles import ModelInit
    from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
    from legommenders_tpu.runtime.manager import Manager
    from legommenders_tpu.runtime.steps import init_params

    D, H, L_layers, MAXP = 16, 2, 2, 64
    rng = np.random.default_rng(0)
    sd = {}
    sd["embeddings.position_embeddings.weight"] = rng.normal(size=(MAXP, D))
    sd["embeddings.token_type_embeddings.weight"] = rng.normal(size=(2, D))
    sd["embeddings.LayerNorm.weight"] = np.ones(D)
    sd["embeddings.LayerNorm.bias"] = np.zeros(D)
    for i in range(L_layers):
        p = f"encoder.layer.{i}."
        for name, shape in [
            ("attention.self.query", (D, D)), ("attention.self.key", (D, D)),
            ("attention.self.value", (D, D)),
            ("attention.output.dense", (D, D)),
            ("intermediate.dense", (4 * D, D)),
            ("output.dense", (D, 4 * D)),
        ]:
            sd[p + name + ".weight"] = rng.normal(size=shape)
            sd[p + name + ".bias"] = rng.normal(size=(shape[0],))
        for ln in ("attention.output.LayerNorm", "output.LayerNorm"):
            sd[p + ln + ".weight"] = np.ones(D)
            sd[p + ln + ".bias"] = np.zeros(D)
    ckpt = tmp_path / "bert"
    ckpt.mkdir()
    torch.save({k: torch.tensor(v, dtype=torch.float32)
                for k, v in sd.items()}, ckpt / "pytorch_model.bin")
    monkeypatch.setattr(ModelInit, "get",
                        lambda self_or_name, *a, **k: str(ckpt))

    data = SyntheticProcessor(num_items=30, num_users=15, title_len=8,
                              history_len=5,
                              inters_per_user=8).as_lego_data()
    m = Manager({}, {"meta": {"item": "Bert", "user": "Ada",
                              "predictor": "Dot"},
                     "config": {"use_item_content": True, "hidden_size": 16,
                                "embedding_dim": 16,
                                "item_config": {
                                    "num_hidden_layers": L_layers,
                                    "num_attention_heads": H,
                                    "max_position": MAXP,
                                    "use_lora": False,
                                    "lm_dtype": "float32"}}},
                exp_cfg={"policy": {"batch_size": 4}}, data=data)
    tb = m.train_batcher(0)
    batch = {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}
    params = init_params(m.model, batch, m.contents.columns)
    params2, loaded = m.load_lm_weights(params)
    assert loaded
    got = np.asarray(
        params2["params"]["item_op"]["lm"]["layer_0"]["attention"]
        ["query"]["kernel"])
    want = sd["encoder.layer.0.attention.self.query.weight"].T
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # model still runs with the ported weights
    scores = m.model.apply(params2, batch, m.contents.columns,
                           training=False)
    assert np.isfinite(np.asarray(scores)).all()


def test_arch_key_folds_lm_dtype():
    """Round-2 advisor: lm_dtype changes the lower slice's cached outputs
    with identical weights — the cache fingerprint must distinguish it."""
    import jax.numpy as jnp
    from legommenders_tpu.models.operators.lm_ops import BertOperator
    from legommenders_tpu.runtime.lm_cache import arch_key

    f32 = BertOperator(hidden_size=16, input_dim=32, num_hidden_layers=1,
                       num_attention_heads=2, lm_dtype=jnp.float32)
    bf16 = f32.clone(lm_dtype=jnp.bfloat16)
    assert arch_key(f32) != arch_key(bf16)
    assert "lm_dtype=float32" in arch_key(f32)
    assert "lm_dtype=bfloat16" in arch_key(bf16)
