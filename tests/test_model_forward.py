import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.pipeline import TrainBatcher
from legommenders_tpu.models.lego_config import LegoConfig
from legommenders_tpu.runtime.steps import (
    init_params, make_train_step, make_eval_step,
)


@pytest.fixture(scope="module")
def synth():
    return SyntheticProcessor(num_items=80, num_users=40).as_lego_data()


def build(synth, item_op, user_op="Ada", predictor="Dot", **kw):
    cfg = LegoConfig(
        data=synth, item_operator=item_op, user_operator=user_op,
        predictor=predictor, hidden_size=32, **kw)
    return cfg.build()


def make_batch(synth, bs=8, seed=0):
    tb = TrainBatcher(synth, batch_size=bs, neg_count=4, seed=seed)
    batch = next(tb.epoch())
    return {k: jnp.asarray(v) for k, v in batch.items()}, tb


@pytest.mark.parametrize("item_op,user_op", [
    ("CNN", "Ada"),          # NAML
    ("Attention", "Attention"),  # NRMS
    ("Ada", "Ada"),
])
def test_forward_shapes(synth, item_op, user_op):
    model, contents, hub = build(synth, item_op, user_op)
    batch, _ = make_batch(synth)
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (8, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_id_only_model(synth):
    model, contents, hub = build(synth, None, "Ada", use_item_content=False)
    batch, _ = make_batch(synth)
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (8, 5)


def test_training_learns(synth):
    """Few hundred steps on planted-structure data must beat random CE."""
    model, contents, hub = build(synth, "CNN", "Ada")
    batch0, tb = make_batch(synth, bs=32)
    params = init_params(model, batch0, contents.columns)
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, contents.columns, opt, donate=False)

    rng = jax.random.PRNGKey(0)
    losses = []
    for epoch in range(16):
        for b in tb.epoch():
            rng, sub = jax.random.split(rng)
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            params, opt_state, loss = step(params, opt_state, jb, sub)
            losses.append(float(loss))
    first = np.mean(losses[:5])
    last = np.mean(losses[-10:])
    # random chance CE = ln(5) ≈ 1.609
    assert last < first
    assert last < 1.45, f"did not learn: first={first:.3f} last={last:.3f}"


def test_pretrained_embedding_projection(synth):
    emb = np.random.default_rng(0).normal(size=(500, 48)).astype(np.float32)
    embed_cfg = {
        "embeddings": [{"vocab_name": "word", "path": emb, "frozen": True}],
        "transformation": "auto",
        "transformation_dropout": 0.1,
    }
    cfg = LegoConfig(data=synth, item_operator="Attention",
                     user_operator="Ada", hidden_size=32,
                     embed_config=embed_cfg)
    model, contents, hub = cfg.build()
    batch, _ = make_batch(synth)
    params = init_params(model, batch, contents.columns)
    # frozen pretrained table must be present and equal to the source array
    flat = jax.tree_util.tree_leaves_with_path(params)
    found = [p for p, v in flat if any("emb_vocab__word" in str(k) for k in p)]
    assert found, "pretrained table param missing"
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (8, 5)
