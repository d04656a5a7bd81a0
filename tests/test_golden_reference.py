"""Golden-value parity vs the torch reference implementation.

Runs the ACTUAL reference modules (imported read-only from /root/reference,
torch-cpu) next to our flax counterparts on identical inputs with copied
weights, and asserts numerical agreement. This pins the riskiest parity
surface: the nn-block math (SURVEY.md §7 "hard parts" (a)/(b)).

The reference tree is imported, never copied; tests skip if it is absent.
"""
import importlib
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_path():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not available")
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def t2n(t):
    return np.asarray(t.detach().numpy())


def lin_kernel(linear):
    """torch nn.Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return t2n(linear.weight).T


def mlp_params(ref_mlp, hidden_count, output=True):
    """Map a reference MLPLayer (Sequential of Linear/act) to our MLPLayer
    param dict. Assumes no batch-norm/dropout (identical layer ordering)."""
    linears = [m for m in ref_mlp.dnn if isinstance(m, torch.nn.Linear)]
    out = {}
    for i in range(hidden_count):
        out[f"dense_{i}"] = {"kernel": lin_kernel(linears[i]),
                             "bias": t2n(linears[i].bias)}
    if output:
        out["dense_out"] = {"kernel": lin_kernel(linears[-1]),
                            "bias": t2n(linears[-1].bias)}
    return out


# --------------------------------------------------------------------------- #
# common blocks                                                               #
# --------------------------------------------------------------------------- #

def test_additive_attention_golden():
    """model/common/attention.py:10-38 vs models/common.AdditiveAttention."""
    import jax.numpy as jnp
    from legommenders_tpu.models.common import AdditiveAttention

    ref_att = importlib.import_module("model.common.attention")
    torch.manual_seed(0)
    B, L, D, H = 5, 7, 12, 20
    ref = ref_att.AdditiveAttention(D, H).eval()
    x = torch.randn(B, L, D)
    mask = (torch.rand(B, L) > 0.3).float()
    mask[:, 0] = 1.0  # every row has at least one valid slot
    with torch.no_grad():
        want = t2n(ref(x, mask))

    params = {"params": {
        "proj_kernel": lin_kernel(ref.encoder[0]),
        "proj_bias": t2n(ref.encoder[0].bias),
        "query": lin_kernel(ref.encoder[2]),
    }}
    got = AdditiveAttention(hidden_size=H).apply(
        params, jnp.asarray(t2n(x)), jnp.asarray(t2n(mask)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_fuxictr_mhsa_golden():
    """model/common/attention.py:64-114 (AutoInt MHSA: residual + relu)."""
    import jax.numpy as jnp
    from legommenders_tpu.models.common import MultiHeadSelfAttention

    ref_att = importlib.import_module("model.common.attention")
    torch.manual_seed(1)
    B, L, D, A, H = 4, 6, 10, 16, 2
    ref = ref_att.MultiHeadSelfAttention(
        D, attention_dim=A, num_heads=H, use_residual=True,
        use_scale=False, layer_norm=False).eval()
    x = torch.randn(B, L, D)
    with torch.no_grad():
        want = t2n(ref(x))

    params = {"params": {
        "q": {"kernel": lin_kernel(ref.W_q)},
        "k": {"kernel": lin_kernel(ref.W_k)},
        "v": {"kernel": lin_kernel(ref.W_v)},
        "res": {"kernel": lin_kernel(ref.W_res)},
    }}
    mine = MultiHeadSelfAttention(
        num_heads=H, attention_dim=A, use_residual=True, use_scale=False,
        layer_norm=False, relu_out=True, out_proj=False)
    got = mine.apply(params, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_mlp_layer_golden():
    """model/common/mlp_layer.py:6-45."""
    import jax.numpy as jnp
    from legommenders_tpu.models.common import MLPLayer

    ref_mlp_mod = importlib.import_module("model.common.mlp_layer")
    torch.manual_seed(2)
    D = 14
    ref = ref_mlp_mod.MLPLayer(
        input_dim=D, output_dim=1, hidden_units=[16, 8],
        hidden_activations="ReLU", dropout_rates=0.0,
        batch_norm=False).eval()
    x = torch.randn(9, D)
    with torch.no_grad():
        want = t2n(ref(x))

    params = {"params": mlp_params(ref, 2)}
    got = MLPLayer(hidden_units=(16, 8), output_dim=1).apply(
        params, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_dice_golden():
    """model/common/activation.py Dice (train-mode batch statistics)."""
    import jax.numpy as jnp
    from legommenders_tpu.models.common import Dice

    ref_act = importlib.import_module("model.common.activation")
    torch.manual_seed(3)
    D = 8
    ref = ref_act.Dice(D).train()
    alpha = torch.randn(D)
    with torch.no_grad():
        ref.alpha.copy_(alpha)
    x = torch.randn(32, D)
    with torch.no_grad():
        want = t2n(ref(x))

    params = {"params": {"alpha": t2n(alpha)}}
    got = Dice().apply(params, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


# --------------------------------------------------------------------------- #
# cross networks                                                              #
# --------------------------------------------------------------------------- #

def test_crossnet_v1_golden():
    """model/predictors/dcn_predictor.py:50-72 CrossNet."""
    import jax.numpy as jnp
    from legommenders_tpu.models.predictors.cross import CrossNet

    ref_dcn = importlib.import_module("model.predictors.dcn_predictor")
    torch.manual_seed(4)
    D, N = 12, 3
    ref = ref_dcn.CrossNet(D, N).eval()
    x = torch.randn(7, D)
    with torch.no_grad():
        want = t2n(ref(x))

    p = {}
    for i, layer in enumerate(ref.cross_net):
        p[f"w_{i}"] = {"kernel": lin_kernel(layer.weight)}
        p[f"b_{i}"] = t2n(layer.bias)
    got = CrossNet(num_layers=N).apply({"params": p}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_crossnet_v2_golden():
    """model/predictors/dcnv2_predictor.py:66-78 CrossNetV2."""
    import jax.numpy as jnp
    from legommenders_tpu.models.predictors.cross import CrossNetV2

    ref_mod = importlib.import_module("model.predictors.dcnv2_predictor")
    torch.manual_seed(5)
    D, N = 10, 3
    ref = ref_mod.CrossNetV2(D, N).eval()
    x = torch.randn(6, D)
    with torch.no_grad():
        want = t2n(ref(x))

    p = {f"cross_{i}": {"kernel": lin_kernel(ref.cross_layers[i]),
                        "bias": t2n(ref.cross_layers[i].bias)}
         for i in range(N)}
    got = CrossNetV2(num_layers=N).apply({"params": p}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_crossnet_mix_golden():
    """model/predictors/dcnv2_predictor.py:80-137 CrossNetMix (low-rank MoE)."""
    import jax.numpy as jnp
    from legommenders_tpu.models.predictors.cross import CrossNetMix

    ref_mod = importlib.import_module("model.predictors.dcnv2_predictor")
    torch.manual_seed(6)
    D, N, R, E = 8, 2, 4, 3
    ref = ref_mod.CrossNetMix(D, layer_num=N, low_rank=R, num_experts=E).eval()
    x = torch.randn(5, D)
    with torch.no_grad():
        want = t2n(ref(x))

    p = {}
    for i in range(N):
        p[f"U_{i}"] = t2n(ref.U_list[i])
        p[f"V_{i}"] = t2n(ref.V_list[i])
        p[f"C_{i}"] = t2n(ref.C_list[i])
        p[f"bias_{i}"] = t2n(ref.bias[i]).squeeze(-1)
        for e in range(E):
            p[f"gate_{i}_{e}"] = {"kernel": lin_kernel(ref.gating[e])}
    got = CrossNetMix(num_layers=N, low_rank=R, num_experts=E).apply(
        {"params": p}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_gate_cross_golden():
    """model/predictors/gdcn_predictor.py gated cross layers."""
    import jax.numpy as jnp
    from legommenders_tpu.models.predictors.cross import GateCrossLayer

    ref_mod = importlib.import_module("model.predictors.gdcn_predictor")
    torch.manual_seed(7)
    D, N = 10, 2
    ref = ref_mod.GateCrossLayer(D, N).eval()
    x = torch.randn(6, D)
    with torch.no_grad():
        want = t2n(ref(x))

    p = {}
    for i in range(N):
        p[f"w_{i}"] = {"kernel": lin_kernel(ref.w[i])}
        p[f"wg_{i}"] = {"kernel": lin_kernel(ref.wg[i])}
        p[f"b_{i}"] = t2n(ref.b[i]).reshape(-1)
    got = GateCrossLayer(num_layers=N).apply({"params": p}, jnp.asarray(t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# --------------------------------------------------------------------------- #
# FM / DeepFM                                                                 #
# --------------------------------------------------------------------------- #

def test_deepfm_golden():
    """model/predictors/deepfm_predictor.py:46-84: FM bi-interaction + DNN."""
    import jax
    import jax.numpy as jnp
    from legommenders_tpu.models.predictors.ctr import DeepFMPredictor

    ref_mod = importlib.import_module("model.predictors.deepfm_predictor")
    ref_mlp_mod = importlib.import_module("model.common.mlp_layer")
    torch.manual_seed(8)
    D = 12
    fm = ref_mod.FactorizationMachine()
    dnn = ref_mlp_mod.MLPLayer(
        input_dim=2 * D, output_dim=1, hidden_units=[16, 8],
        hidden_activations="ReLU", dropout_rates=0.0, batch_norm=False).eval()
    u = torch.randn(6, D)
    it = torch.randn(6, D)
    with torch.no_grad():
        fields = torch.stack([u, it], dim=1)
        want = t2n(((fm(fields) + dnn(fields.flatten(1))) / 2).flatten())

    mine = DeepFMPredictor(dnn_hidden_units=(16, 8))
    ju, ji = jnp.asarray(t2n(u)), jnp.asarray(t2n(it))
    var = mine.init(jax.random.PRNGKey(0), ju, ji, method=mine.score_pair)
    mlp_name = next(iter(var["params"]))
    got = mine.apply({"params": {mlp_name: mlp_params(dnn, 2)}},
                     ju, ji, method=mine.score_pair)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# --------------------------------------------------------------------------- #
# operators                                                                   #
# --------------------------------------------------------------------------- #

def test_fastformer_golden():
    """model/common/fastformer.py:6-227 (full FastformerModel) +
    fastformer_operator.py:24-49 (Linear head) vs FastformerOperator."""
    import jax.numpy as jnp
    from legommenders_tpu.models.operators.fastformer import FastformerOperator

    ref_ff = importlib.import_module("model.common.fastformer")
    torch.manual_seed(10)
    B, L, D, H, N, OUT = 3, 9, 16, 4, 2, 12
    cfg = ref_ff.FastformerConfig(hidden_size=D, num_hidden_layers=N,
                                  num_attention_heads=H,
                                  hidden_dropout_prob=0.0)
    ff = ref_ff.FastformerModel(cfg).eval()
    head = torch.nn.Linear(D, OUT)
    x = torch.randn(B, L, D)
    mask = (torch.rand(B, L) > 0.25).float()
    mask[:, 0] = 1.0
    with torch.no_grad():
        want = t2n(head(ff(inputs_embeds=x, attention_mask=mask)))

    def ln(mod):
        return {"scale": t2n(mod.weight), "bias": t2n(mod.bias)}

    def dense(mod):
        return {"kernel": lin_kernel(mod), "bias": t2n(mod.bias)}

    p = {
        "position_embeddings": t2n(ff.position_embeddings.weight),
        "LayerNorm_0": ln(ff.LayerNorm),
        "pooler": {
            "proj_kernel": lin_kernel(ff.poolers[0].att_fc1),
            "proj_bias": t2n(ff.poolers[0].att_fc1.bias),
            # att_fc2 bias shifts all scores equally and cancels in the
            # exp-normalization; only the weight matters
            "query": lin_kernel(ff.poolers[0].att_fc2),
        },
        "proj": dense(head),
    }
    for i, enc in enumerate(ff.encoders):
        p[f"layer_{i}"] = {
            "FastSelfAttention_0": {
                "query": dense(enc.attention.self.query),
                "key": dense(enc.attention.self.key),
                "query_att": dense(enc.attention.self.query_att),
                "key_att": dense(enc.attention.self.key_att),
                "transform": dense(enc.attention.self.transform),
            },
            "self_out": dense(enc.attention.output.dense),
            "LayerNorm_0": ln(enc.attention.output.LayerNorm),
            "intermediate": dense(enc.intermediate.dense),
            "output": dense(enc.output.dense),
            "LayerNorm_1": ln(enc.output.LayerNorm),
        }
    mine = FastformerOperator(hidden_size=OUT, input_dim=D,
                              num_hidden_layers=N, num_attention_heads=H,
                              hidden_dropout_prob=0.0)
    got = mine.apply({"params": p}, jnp.asarray(t2n(x)),
                     jnp.asarray(t2n(mask)), training=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_gru_golden(num_layers):
    """model/operators/gru_operator.py:18-54: packed GRU last hidden +
    Linear, with ragged lengths."""
    import jax.numpy as jnp
    from legommenders_tpu.models.operators.gru import GRUOperator

    torch.manual_seed(11 + num_layers)
    B, L, D, H = 4, 7, 10, 12
    gru = torch.nn.GRU(input_size=D, hidden_size=H, num_layers=num_layers,
                       batch_first=True).eval()
    linear = torch.nn.Linear(H, D)
    x = torch.randn(B, L, D)
    lengths = torch.tensor([L, 3, 5, 1])
    mask = (torch.arange(L)[None, :] < lengths[:, None]).float()
    with torch.no_grad():
        packed = torch.nn.utils.rnn.pack_padded_sequence(
            x, lengths.numpy(), batch_first=True, enforce_sorted=False)
        _, last_hidden = gru(packed)
        want = t2n(linear(last_hidden[-1]))

    p = {}
    for l in range(num_layers):
        w_ih = getattr(gru, f"weight_ih_l{l}")   # (3H, in)
        w_hh = getattr(gru, f"weight_hh_l{l}")   # (3H, H)
        b_ih = getattr(gru, f"bias_ih_l{l}")
        b_hh = getattr(gru, f"bias_hh_l{l}")
        wr, wz, wn = (t2n(w_ih)[i * H:(i + 1) * H] for i in range(3))
        ur, uz, un = (t2n(w_hh)[i * H:(i + 1) * H] for i in range(3))
        br, bz, bn = (t2n(b_ih)[i * H:(i + 1) * H] for i in range(3))
        hbr, hbz, hbn = (t2n(b_hh)[i * H:(i + 1) * H] for i in range(3))
        p[f"GRUCell_{l}"] = {
            "ir": {"kernel": wr.T, "bias": br + hbr},
            "iz": {"kernel": wz.T, "bias": bz + hbz},
            "in": {"kernel": wn.T, "bias": bn},
            "hr": {"kernel": ur.T},
            "hz": {"kernel": uz.T},
            "hn": {"kernel": un.T, "bias": hbn},
        }
    p["Dense_0"] = {"kernel": lin_kernel(linear), "bias": t2n(linear.bias)}
    mine = GRUOperator(hidden_size=H, input_dim=D, num_layers=num_layers)
    got = mine.apply({"params": p}, jnp.asarray(t2n(x)),
                     jnp.asarray(t2n(mask)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


# --------------------------------------------------------------------------- #
# metrics                                                                     #
# --------------------------------------------------------------------------- #

def test_metric_pool_golden():
    """utils/metrics.py vs runtime/metrics.py on the same ragged groups,
    including the non-standard MRR."""
    ref_metrics = importlib.import_module("utils.metrics")
    from legommenders_tpu.runtime.metrics import MetricPool

    rng = np.random.default_rng(0)
    n = 400
    scores = rng.normal(size=n)
    labels = (rng.random(n) < 0.25).astype(np.int64)
    groups = rng.integers(0, 37, size=n)
    # every group needs >=1 positive and >=1 negative for AUC-family metrics
    for g in np.unique(groups):
        idx = np.nonzero(groups == g)[0]
        labels[idx[0]] = 1
        if len(idx) > 1:
            labels[idx[1]] = 0
    # F1@t omitted: the reference CLI parser only accepts integer metric
    # args (utils/metrics.py:289), so float thresholds are unreachable there
    names = ["GAUC", "MRR", "MRR0", "NDCG@5", "HITRATIO@5", "RECALL@5",
             "AUC", "LOGLOSS"]

    with pytest.warns(UserWarning):
        ref_pool = ref_metrics.MetricPool.parse(names)
    # sigmoid scores for LogLoss validity
    probs = 1.0 / (1.0 + np.exp(-scores))
    want = ref_pool.calculate(probs.tolist(), labels.tolist(),
                              groups.tolist(), group_worker=2)

    with pytest.warns(UserWarning):
        mine = MetricPool.parse(names)
    got = mine(probs, labels, groups)

    for k, v in want.items():
        assert k in got, f"missing metric {k}"
        np.testing.assert_allclose(got[k], float(v), atol=1e-6,
                                   err_msg=f"metric {k} diverges")
