"""Operator/predictor zoo: build + forward + grad for every model family.

Mirrors the reference's YAML compositions (config/model/*.yaml): NAML,
NRMS, LSTUR, Fastformer, BST (transformer user), MINER, and the FuxiCTR
ranking heads.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legommenders_tpu.data.processors.synthetic import SyntheticProcessor
from legommenders_tpu.data.pipeline import TrainBatcher
from legommenders_tpu.models.lego_config import LegoConfig
from legommenders_tpu.runtime.steps import init_params, make_loss_fn


@pytest.fixture(scope="module")
def synth():
    return SyntheticProcessor(num_items=60, num_users=30, title_len=8,
                              history_len=10,
                              inters_per_user=12).as_lego_data()


def run_model(synth, item_op, user_op, predictor, use_neg=True,
              use_content=True, item_cfg=None, user_cfg=None,
              pred_cfg=None, bs=6):
    cfg = LegoConfig(
        data=synth, item_operator=item_op, user_operator=user_op,
        predictor=predictor, hidden_size=16,
        use_neg_sampling=use_neg, use_item_content=use_content,
        item_config=item_cfg or {}, user_config=user_cfg or {},
        predictor_config=pred_cfg or {})
    model, contents, hub = cfg.build()
    tb = TrainBatcher(synth, batch_size=bs, neg_count=4,
                      use_neg_sampling=use_neg, seed=0)
    batch = {k: jnp.asarray(v) for k, v in next(tb.epoch()).items()}
    params = init_params(model, batch, contents.columns)
    K = 5 if use_neg else 1
    scores = model.apply(params, batch, contents.columns, training=False)
    assert scores.shape == (bs, K), (scores.shape, (bs, K))
    assert np.isfinite(np.asarray(scores)).all()

    # one grad step must produce finite grads
    loss_fn = make_loss_fn(model, contents.columns, use_neg)
    loss, grads = jax.value_and_grad(loss_fn)(
        params, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
    return scores


# --- matching-mode (neg sampling) families -------------------------------
def test_naml(synth):
    run_model(synth, "CNN", "Ada", "Dot",
              item_cfg={"dropout": 0.1, "kernel_size": 3})


def test_lstur(synth):
    run_model(synth, "CNNCat", "GRU", "Dot")


def test_fastformer(synth):
    run_model(synth, "Fastformer", "Fastformer", "Dot",
              item_cfg={"num_hidden_layers": 1},
              user_cfg={"num_hidden_layers": 1})


def test_bst_transformer_user(synth):
    run_model(synth, "Pooling", "Transformer", "Dot",
              user_cfg={"num_hidden_layers": 1})


def test_miner(synth):
    run_model(synth, "Transformer", "PolyAttention", "MINER",
              item_cfg={"num_hidden_layers": 1},
              user_cfg={"num_context_codes": 4, "context_code_dim": 8})


def test_flatten_fastformer(synth):
    run_model(synth, "Fastformer", "FlattenFastformer", "Dot",
              item_cfg={"num_hidden_layers": 1},
              user_cfg={"num_hidden_layers": 1})


# --- ranking-mode CTR heads ----------------------------------------------
CTR_HEADS = [
    ("DNN", {}),
    ("DeepFM", {}),
    ("PNN", {}),
    ("DCN", {"cross_num": 2}),
    ("DCNv2", {"model_structure": "parallel", "cross_num": 2}),
    ("DCNv2", {"model_structure": "stacked_parallel",
               "use_low_rank_mixture": True, "low_rank": 4,
               "num_experts": 2, "cross_num": 2}),
    ("GDCN", {"cross_num": 2}),
    ("AutoInt", {"num_attention_layers": 1, "attention_dim": 16,
                 "num_attention_heads": 2}),
    ("MaskNet", {"hidden_units": [16], "num_blocks": 2, "block_dim": 8}),
    ("MaskNet", {"hidden_units": [16, 8], "sequential_mode": True}),
    ("FinalMLP", {"mlp1_hidden_units": [16], "mlp2_hidden_units": [16]}),
]


@pytest.mark.parametrize("pred,pcfg", CTR_HEADS,
                         ids=[f"{p}-{i}" for i, (p, _) in enumerate(CTR_HEADS)])
def test_ctr_heads(synth, pred, pcfg):
    small = {"dnn_hidden_units": [16, 16]}
    run_model(synth, "Pooling", "Pooling", pred, use_neg=False,
              pred_cfg={**small, **pcfg})


def test_din(synth):
    run_model(synth, "Pooling", "NullConcat", "DIN", use_neg=False,
              pred_cfg={"dnn_hidden_units": [16],
                        "attention_hidden_units": [8]})


def test_incompatible_predictor_raises(synth):
    with pytest.raises(ValueError):
        run_model(synth, "Pooling", "Pooling", "DIN", use_neg=True)
    with pytest.raises(ValueError):
        run_model(synth, "CNN", "PolyAttention", "MINER", use_neg=False)
