"""Semantic-ID family: SemanticOperator + Poly/SemanticMix predictors."""
import jax.numpy as jnp
import numpy as np
import pytest

from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.pipeline import TrainBatcher
from legommenders_tpu.models.lego_config import LegoConfig
from legommenders_tpu.runtime.steps import init_params


@pytest.fixture(scope="module")
def synth_sem():
    data = SyntheticProcessor(num_items=40, num_users=20, title_len=8,
                              history_len=6,
                              inters_per_user=10).as_lego_data()
    # add a semantic-code column: 4 codes per item from a 32-entry codebook
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 32, size=(40, 4)).astype(np.int32)
    from legommenders_tpu.data.vocab import Vocab
    data.items.add_seq_column("semantic", codes.tolist(),
                              Vocab("semantic", tokens=None).set_size(32), 4)
    data.items.vocab_hub.get("semantic").set_size(32)
    data.item_inputs = [("semantic", 4)]
    return data


def test_semantic_operator_poly_predictor(synth_sem):
    cfg = LegoConfig(
        data=synth_sem, item_operator="Ada", user_operator="Semantic",
        predictor="Poly", hidden_size=16,
        user_config={"base_operator": "Ada", "return_stack": True},
        predictor_config={"base_predictor": "Dot", "num_layers": 4})
    model, contents, hub = cfg.build()
    assert model.flatten_mode
    tb = TrainBatcher(synth_sem, batch_size=4, neg_count=4, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_semantic_operator_pooled(synth_sem):
    cfg = LegoConfig(
        data=synth_sem, item_operator="Ada", user_operator="Semantic",
        predictor="Dot", hidden_size=16,
        user_config={"base_operator": "Ada"})
    model, contents, hub = cfg.build()
    tb = TrainBatcher(synth_sem, batch_size=4, neg_count=4, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()


def test_semantic_mix_full_model(synth_sem):
    """End-to-end SemanticMix: SCSimple item codes (B,K,Si,D) + SCMix user
    codes (B,Su,D) + SemanticMix predictor, through a real train step.

    The reference ships the inputer/predictor unwired (no operator uses
    SemanticMixInputer); we complete the composition."""
    import jax
    from legommenders_tpu.data.vocab import Vocab
    from legommenders_tpu.runtime.steps import make_train_step
    import optax

    data = synth_sem
    if not getattr(data, "user_inputs", None):
        rng_np = np.random.default_rng(1)
        ucodes = rng_np.integers(0, 32, size=(data.num_users, 3)).astype(np.int32)
        data.users.add_seq_column(
            "semantic", ucodes.tolist(),
            Vocab("semantic", tokens=None).set_size(32), 3)
        data.user_inputs = [("semantic", 3)]

    cfg = LegoConfig(
        data=data, item_operator="SCSimple", user_operator="SCMix",
        predictor="SemanticMix", hidden_size=16,
        predictor_config={"base_predictor": "Dot"},
        use_fast_eval=False)
    model, contents, hub = cfg.build()
    assert model.flatten_mode and model.user_batch_cols == ("semantic",)

    tb = TrainBatcher(data, batch_size=4, neg_count=4, seed=0)
    batch_np = next(tb.epoch())
    assert batch_np["semantic"].shape == (4, 3)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = init_params(model, batch, contents.columns)
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (4, 5)
    assert np.isfinite(np.asarray(scores)).all()

    opt = optax.adam(1e-3)
    step = make_train_step(model, contents.columns, opt, donate=False)
    state = opt.init(params)
    p2, state, loss = step(params, state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # the mix linear and the semantic embedding must both receive gradient
    leaves1 = jax.tree_util.tree_leaves(params)
    leaves2 = jax.tree_util.tree_leaves(p2)
    assert any(not np.allclose(a, b) for a, b in zip(leaves1, leaves2))


def test_semantic_mix_predictor_unit(rng):
    """Unit-level: cumulative all-pairs scores + linear (B, K)."""
    import jax
    from legommenders_tpu.models.predictors.semantic_heads import (
        SemanticMixPredictor)
    B, K, Si, Su, D = 3, 5, 4, 4, 8
    user = jnp.asarray(rng.normal(size=(B, Su, D)).astype(np.float32))
    items = jnp.asarray(rng.normal(size=(B, K, Si, D)).astype(np.float32))
    pred = SemanticMixPredictor(hidden_size=D)
    params = pred.init(jax.random.PRNGKey(0), user, items)
    out = pred.apply(params, user, items)
    assert out.shape == (B, K)
    assert np.isfinite(np.asarray(out)).all()
