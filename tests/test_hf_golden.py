"""Golden parity: native flax LM slices vs the real HF transformers
modeling code, with the SAME (random) weights ported through
lm/hf_loader.py.

This executes the actual torch reference implementations (the reference
loads these very classes via AutoModel, once_operator.py:51) on tiny
random-init configs and asserts our BertEncoderSlice / OPTDecoderSlice /
LlamaDecoderSlice reproduce their hidden states — verifying BOTH the layer
math and the checkpoint weight mapping, without needing a downloaded
checkpoint (no-egress image).
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from `make test`, run by `make ci`

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from legommenders_tpu.models.lm.hf_loader import (  # noqa: E402
    bert_slice_params, llama_slice_params, opt_slice_params,
)
from legommenders_tpu.models.lm.layers import (  # noqa: E402
    BertEncoderSlice, LlamaDecoderSlice, OPTDecoderSlice,
)


def _inputs(vocab, B=2, L=7, seed=3):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, vocab, size=(B, L))
    mask = np.ones((B, L), np.int64)
    mask[1, L - 2:] = 0
    return ids, mask


def _valid_close(ours, theirs, mask, rtol=2e-4, atol=2e-4):
    ours = np.asarray(ours, np.float32)
    theirs = np.asarray(theirs, np.float32)
    m = mask.astype(bool)
    np.testing.assert_allclose(ours[m], theirs[m], rtol=rtol, atol=atol)


def test_bert_slice_matches_hf():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,  # slice fixes ffn=4*D
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(cfg).eval()
    ids, mask = _inputs(cfg.vocab_size)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)
                    ).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    wemb = sd["embeddings.word_embeddings.weight"]
    x = jnp.asarray(wemb[ids])
    slice_ = BertEncoderSlice(num_layers=2, num_heads=2, start=0,
                              embed=True, max_position=40, dropout=0.0)
    params = {"params": bert_slice_params(sd, 0, 2, embed=True)}
    out = slice_.apply(params, x, jnp.asarray(mask), training=False)
    _valid_close(out, ref, mask)

    # layer-split equivalence against HF intermediate hidden_states:
    # lower = layers [0,1), upper = layers [1,2)
    with torch.no_grad():
        hs = model(input_ids=torch.from_numpy(ids),
                   attention_mask=torch.from_numpy(mask),
                   output_hidden_states=True).hidden_states
    lower = BertEncoderSlice(num_layers=1, num_heads=2, start=0,
                             embed=True, max_position=40, dropout=0.0)
    mid = lower.apply({"params": bert_slice_params(sd, 0, 1, embed=True)},
                      x, jnp.asarray(mask), training=False)
    _valid_close(mid, hs[1].numpy(), mask)
    upper = BertEncoderSlice(num_layers=1, num_heads=2, start=1,
                             embed=False, dropout=0.0)
    top = upper.apply({"params": bert_slice_params(sd, 1, 1, embed=False)},
                      mid, jnp.asarray(mask), training=False)
    _valid_close(top, ref, mask)


def test_opt_slice_matches_hf():
    from transformers import OPTConfig, OPTModel

    cfg = OPTConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, ffn_dim=64, max_position_embeddings=40,
        dropout=0.0, attention_dropout=0.0, do_layer_norm_before=True,
        word_embed_proj_dim=32)
    torch.manual_seed(1)
    model = OPTModel(cfg).eval()
    ids, mask = _inputs(cfg.vocab_size)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)
                    ).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    wemb = sd["decoder.embed_tokens.weight"]
    x = jnp.asarray(wemb[ids])
    slice_ = OPTDecoderSlice(num_layers=2, num_heads=2, ffn_dim=64, start=0,
                             embed_positions=True, final_norm=True,
                             max_position=40, dtype=jnp.float32)
    params = {"params": opt_slice_params(sd, 0, 2, embed_positions=True,
                                         final_norm=True)}
    out = slice_.apply(params, x, jnp.asarray(mask), training=False)
    _valid_close(out, ref, mask)


def test_llama_slice_matches_hf():
    from transformers import LlamaConfig, LlamaModel

    cfg = LlamaConfig(
        vocab_size=50, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, intermediate_size=64,
        max_position_embeddings=64, rope_theta=10000.0,
        attention_dropout=0.0)
    torch.manual_seed(2)
    model = LlamaModel(cfg).eval()
    ids, mask = _inputs(cfg.vocab_size)
    # llama: left-pad semantics differ; use full masks and compare all
    mask = np.ones_like(mask)
    with torch.no_grad():
        ref = model(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask)
                    ).last_hidden_state.numpy()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    wemb = sd["embed_tokens.weight"]
    x = jnp.asarray(wemb[ids])
    slice_ = LlamaDecoderSlice(num_layers=2, num_heads=4, num_kv_heads=2,
                               intermediate_size=64, start=0,
                               final_norm=True, rope_theta=10000.0,
                               dtype=jnp.float32)
    params = {"params": llama_slice_params(sd, 0, 2, final_norm=True)}
    out = slice_.apply(params, x, jnp.asarray(mask), training=False)
    _valid_close(out, ref, mask, rtol=5e-4, atol=5e-4)
