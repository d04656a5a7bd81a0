"""HF checkpoint -> native flax LM slice weights.

Ports torch state dicts (BERT / OPT / Llama from local HF checkpoints) into
the param trees of lm/layers.py modules. The reference loads HF models
directly (once_operator.py:51 AutoModel.from_pretrained); here weights are
transposed into our layout once and live as jax arrays.

All loading is lazy & local-path based (no-egress environment); tests run
on random init.
"""
from typing import Dict

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.asarray(x, np.float32).T)


def _a(x):
    return np.asarray(x, np.float32)


def load_torch_state_dict(model_path: str) -> Dict[str, np.ndarray]:
    """Load an HF checkpoint's tensors as numpy (safetensors or torch bin)."""
    import os

    st_path = os.path.join(model_path, "model.safetensors")
    if os.path.isfile(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(model_path, "pytorch_model.bin")
    if os.path.isfile(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no model.safetensors / pytorch_model.bin under {model_path}")


# ---------------------------------------------------------------------------
def bert_slice_params(sd: Dict[str, np.ndarray], start: int,
                      num_layers: int, embed: bool) -> dict:
    """Map HF `bert.*` names into a BertEncoderSlice param subtree."""
    def g(key):
        for prefix in ("", "bert."):
            if prefix + key in sd:
                return sd[prefix + key]
        raise KeyError(key)

    out: dict = {}
    if embed and start == 0:
        out["position_embeddings"] = _a(
            g("embeddings.position_embeddings.weight"))
        out["token_type_embeddings"] = _a(
            g("embeddings.token_type_embeddings.weight"))[:1]
        out["embeddings_norm"] = {
            "scale": _a(g("embeddings.LayerNorm.weight")),
            "bias": _a(g("embeddings.LayerNorm.bias"))}
    for i in range(start, start + num_layers):
        p = f"encoder.layer.{i}."
        out[f"layer_{i}"] = {
            "attention": {
                "query": {"kernel": _t(g(p + "attention.self.query.weight")),
                          "bias": _a(g(p + "attention.self.query.bias"))},
                "key": {"kernel": _t(g(p + "attention.self.key.weight")),
                        "bias": _a(g(p + "attention.self.key.bias"))},
                "value": {"kernel": _t(g(p + "attention.self.value.weight")),
                          "bias": _a(g(p + "attention.self.value.bias"))},
                "output": {"kernel": _t(g(p + "attention.output.dense.weight")),
                           "bias": _a(g(p + "attention.output.dense.bias"))},
            },
            "attention_norm": {
                "scale": _a(g(p + "attention.output.LayerNorm.weight")),
                "bias": _a(g(p + "attention.output.LayerNorm.bias"))},
            "intermediate": {"kernel": _t(g(p + "intermediate.dense.weight")),
                             "bias": _a(g(p + "intermediate.dense.bias"))},
            "ffn_output": {"kernel": _t(g(p + "output.dense.weight")),
                           "bias": _a(g(p + "output.dense.bias"))},
            "output_norm": {"scale": _a(g(p + "output.LayerNorm.weight")),
                            "bias": _a(g(p + "output.LayerNorm.bias"))},
        }
    return out


def llama_slice_params(sd: Dict[str, np.ndarray], start: int,
                       num_layers: int, final_norm: bool) -> dict:
    def g(key):
        for prefix in ("", "model."):
            if prefix + key in sd:
                return sd[prefix + key]
        raise KeyError(key)

    out: dict = {}
    for i in range(start, start + num_layers):
        p = f"layers.{i}."
        out[f"layer_{i}"] = {
            "input_norm": {"weight": _a(g(p + "input_layernorm.weight"))},
            "q_proj": {"kernel": _t(g(p + "self_attn.q_proj.weight"))},
            "k_proj": {"kernel": _t(g(p + "self_attn.k_proj.weight"))},
            "v_proj": {"kernel": _t(g(p + "self_attn.v_proj.weight"))},
            "o_proj": {"kernel": _t(g(p + "self_attn.o_proj.weight"))},
            "post_norm": {
                "weight": _a(g(p + "post_attention_layernorm.weight"))},
            "gate_proj": {"kernel": _t(g(p + "mlp.gate_proj.weight"))},
            "up_proj": {"kernel": _t(g(p + "mlp.up_proj.weight"))},
            "down_proj": {"kernel": _t(g(p + "mlp.down_proj.weight"))},
        }
    if final_norm:
        out["final_norm"] = {"weight": _a(g("norm.weight"))}
    return out


def opt_slice_params(sd: Dict[str, np.ndarray], start: int,
                     num_layers: int, embed_positions: bool,
                     final_norm: bool) -> dict:
    def g(key):
        for prefix in ("", "model.", "model.decoder.", "decoder."):
            if prefix + key in sd:
                return sd[prefix + key]
        raise KeyError(key)

    out: dict = {}
    if embed_positions and start == 0:
        out["position_embeddings"] = _a(g("embed_positions.weight"))
    for i in range(start, start + num_layers):
        p = f"layers.{i}."
        out[f"layer_{i}"] = {
            "attn_norm": {"scale": _a(g(p + "self_attn_layer_norm.weight")),
                          "bias": _a(g(p + "self_attn_layer_norm.bias"))},
            "q_proj": {"kernel": _t(g(p + "self_attn.q_proj.weight")),
                       "bias": _a(g(p + "self_attn.q_proj.bias"))},
            "k_proj": {"kernel": _t(g(p + "self_attn.k_proj.weight")),
                       "bias": _a(g(p + "self_attn.k_proj.bias"))},
            "v_proj": {"kernel": _t(g(p + "self_attn.v_proj.weight")),
                       "bias": _a(g(p + "self_attn.v_proj.bias"))},
            "out_proj": {"kernel": _t(g(p + "self_attn.out_proj.weight")),
                         "bias": _a(g(p + "self_attn.out_proj.bias"))},
            "ffn_norm": {"scale": _a(g(p + "final_layer_norm.weight")),
                         "bias": _a(g(p + "final_layer_norm.bias"))},
            "fc1": {"kernel": _t(g(p + "fc1.weight")),
                    "bias": _a(g(p + "fc1.bias"))},
            "fc2": {"kernel": _t(g(p + "fc2.weight")),
                    "bias": _a(g(p + "fc2.bias"))},
        }
    if final_norm:
        out["final_norm"] = {"scale": _a(g("final_layer_norm.weight")),
                             "bias": _a(g("final_layer_norm.bias"))}
    return out


def glm_slice_params(sd: Dict[str, np.ndarray], start: int,
                     num_layers: int, num_heads: int, num_kv_heads: int,
                     final_norm: bool) -> dict:
    """ChatGLM2/3/GLM-4 checkpoint layout -> LlamaDecoderSlice params.

    The checkpoint fuses QKV into `self_attention.query_key_value`
    ((H + 2·G)·d rows: queries, then G key groups, then G value groups) and
    the SwiGLU gate/up into `mlp.dense_h_to_4h` (gate = first half);
    `self_attention.dense` is o_proj, norms are RMSNorm weights."""
    def g(key):
        for prefix in ("transformer.encoder.", "encoder.", "transformer.",
                       ""):
            if prefix + key in sd:
                return sd[prefix + key]
        raise KeyError(key)

    out: dict = {}
    for i in range(start, start + num_layers):
        p = f"layers.{i}."
        qkv_w = g(p + "self_attention.query_key_value.weight")
        D = qkv_w.shape[1]
        d = D // num_heads
        q_rows = num_heads * d
        kv_rows = num_kv_heads * d
        layer = {
            "input_norm": {"weight": _a(g(p + "input_layernorm.weight"))},
            "q_proj": {"kernel": _t(qkv_w[:q_rows])},
            "k_proj": {"kernel": _t(qkv_w[q_rows:q_rows + kv_rows])},
            "v_proj": {"kernel": _t(qkv_w[q_rows + kv_rows:])},
            "o_proj": {"kernel": _t(g(p + "self_attention.dense.weight"))},
            "post_norm": {
                "weight": _a(g(p + "post_attention_layernorm.weight"))},
        }
        bias_key = p + "self_attention.query_key_value.bias"
        try:
            qkv_b = g(bias_key)
        except KeyError:
            qkv_b = None
        if qkv_b is not None:
            layer["q_proj"]["bias"] = _a(qkv_b[:q_rows])
            layer["k_proj"]["bias"] = _a(qkv_b[q_rows:q_rows + kv_rows])
            layer["v_proj"]["bias"] = _a(qkv_b[q_rows + kv_rows:])
        h4h = g(p + "mlp.dense_h_to_4h.weight")      # (2*ffn, D)
        ffn = h4h.shape[0] // 2
        layer["gate_proj"] = {"kernel": _t(h4h[:ffn])}
        layer["up_proj"] = {"kernel": _t(h4h[ffn:])}
        layer["down_proj"] = {"kernel": _t(g(p + "mlp.dense_4h_to_h.weight"))}
        out[f"layer_{i}"] = layer
    if final_norm:
        out["final_norm"] = {"weight": _a(g("final_layernorm.weight"))}
    return out


def merge_lm_params(params: dict, lm_subtree: dict, path=("params", "item_op", "lm")) -> dict:
    """Replace the LM slice subtree inside a full model param tree, keeping
    any params absent from the checkpoint (e.g. lora_A/lora_B)."""
    import jax

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and isinstance(dst.get(k), dict):
                deep_update(dst[k], v)
            else:
                if k in dst:
                    want = np.asarray(dst[k]).shape
                    got = np.asarray(v).shape
                    assert want == got, f"shape mismatch at {k}: {want} vs {got}"
                dst[k] = v

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    node = params
    for key in path[:-1]:
        node = node[key]
    target = dict(node.get(path[-1], {}))
    deep_update(target, lm_subtree)
    node[path[-1]] = target
    return params
