"""HF checkpoint interop: torch LlamaForCausalLM state_dict <-> param pytrees.

Replaces the reference's reliance on ``AutoModelForCausalLM.from_pretrained``
(grasp.py:54) for weight ingestion. Weights can come from:

  - an in-memory torch model / state_dict (used by the golden parity tests),
  - a local HF checkpoint directory (pytorch_model.bin / *.safetensors),

and are converted to this framework's JAX pytree layout (kernels transposed to
[in, out]). No network access is required or attempted.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import ATTN_PROJS, MLP_PROJS


def config_from_hf(hf_config: Any) -> ModelConfig:
    """Build a ModelConfig from an HF LlamaConfig/MistralConfig-like object.

    Works on raw config.json namespaces too (config_from_dir), so family
    defaults that transformers' config classes synthesize must be
    re-derived here: original gemma/gemma-2 releases lack hidden_activation
    (and carry a historical hidden_act="gelu" that HF IGNORES in favor of
    the tanh approximation), and original gemma-2 configs lack layer_types
    (HF synthesizes even-layers-sliding alternation)."""
    get = lambda k, d=None: getattr(hf_config, k, d)
    mtype = str(get("model_type", ""))
    if mtype.startswith("gemma"):
        # HF GemmaConfig/Gemma2Config: hidden_activation defaults to
        # gelu_pytorch_tanh regardless of any legacy hidden_act value
        act = str(get("hidden_activation", None) or "gelu_pytorch_tanh")
    else:
        act = str(get("hidden_activation", None) or get("hidden_act", "silu"))
    layer_types = get("layer_types", None)
    if layer_types is None and mtype == "gemma2":
        # HF Gemma2Config synthesizes alternation (even layers sliding)
        layer_types = tuple(
            "sliding_attention" if i % 2 == 0 else "full_attention"
            for i in range(get("num_hidden_layers")))
    rope_scaling = get("rope_scaling", None)
    if rope_scaling and dict(rope_scaling).get(
            "rope_type", dict(rope_scaling).get("type")) == "longrope":
        # Phi-3 longrope needs the context bounds that live at the config
        # root: the long/short switch point and the attention factor derive
        # from max/original max positions (models.llama.rope_cos_sin)
        rope_scaling = dict(rope_scaling)
        rope_scaling.setdefault(
            "original_max_position_embeddings",
            get("original_max_position_embeddings",
                get("max_position_embeddings", 4096)))
        rope_scaling.setdefault("max_position_embeddings",
                                get("max_position_embeddings", 4096))
    return ModelConfig(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size"),
        num_hidden_layers=get("num_hidden_layers"),
        num_attention_heads=get("num_attention_heads"),
        num_key_value_heads=get("num_key_value_heads", get("num_attention_heads")),
        head_dim=get("head_dim", None),
        max_position_embeddings=get("max_position_embeddings", 4096),
        rope_theta=float(get("rope_theta", 10000.0)),
        rms_norm_eps=float(get("rms_norm_eps", 1e-5)),
        tie_word_embeddings=bool(get("tie_word_embeddings", False)),
        attention_bias=bool(get("attention_bias", False)),
        mlp_bias=bool(get("mlp_bias", False)),
        # Gemma family: GemmaConfig carries hidden_activation (gelu tanh),
        # and its model_type implies (1+w) norms + sqrt(hidden) embed scaling
        hidden_act=act,
        norm_plus_one=str(get("model_type", "")).startswith("gemma"),
        scale_embeddings=str(get("model_type", "")).startswith("gemma"),
        # Mistral applies its sliding window unconditionally; Qwen2 carries
        # a window in its config but gates it off via use_sliding_window
        sliding_window=(get("sliding_window", None)
                        if get("use_sliding_window", True) else None),
        rope_scaling=rope_scaling,  # llama3/linear/longrope (models.llama)
        # Gemma-2
        layer_types=tuple(layer_types) if layer_types else None,
        attn_logit_softcapping=get("attn_logit_softcapping", None),
        final_logit_softcapping=get("final_logit_softcapping", None),
        query_pre_attn_scalar=(float(get("query_pre_attn_scalar"))
                               if get("query_pre_attn_scalar", None) else None),
        sandwich_norms=str(get("model_type", "")) == "gemma2",
        # Mixtral-family sparse MoE
        num_local_experts=int(get("num_local_experts", 0) or 0),
        num_experts_per_tok=int(get("num_experts_per_tok", 2) or 2),
    )


def config_from_dir(path: str) -> ModelConfig:
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)

    class _NS:
        def __init__(self, d):
            self.__dict__.update(d)

    return config_from_hf(_NS(cfg))


def _to_np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def params_from_state_dict(state_dict: Dict[str, Any], config: ModelConfig, dtype=np.float32) -> Dict[str, Any]:
    """Convert an HF Llama state_dict to this framework's pytree.

    HF stores projection weights [out, in] (y = x W^T); we store JAX-layout
    kernels [in, out], so each projection weight is transposed once here.

    Also ingests reference-GRASP compressed checkpoints (migration path):
    SVDLinear modules (``<proj>.InLinear.weight``/``OutLinear.weight``,
    modeling_grasp.py:40-55) become low-rank subtrees, GRASPLayer modules
    (``<proj>.U/S/Vh``, :65-67) become full-SVD subtrees; derive the matching
    plan with models.llama.plan_from_params.
    """
    sd = {k: _to_np(v) for k, v in state_dict.items()}

    # Phi-3 fuses q/k/v into qkv_proj and gate/up into gate_up_proj (HF
    # modeling_phi3.py). Row slices of a fused matmul are EXACT (x @ W^T
    # splits by output rows), so splitting here is numerically identical and
    # restores the per-projection structure GRASP compresses.
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim_)
    for li in range(config.num_hidden_layers):
        base = f"model.layers.{li}"
        qkv = sd.pop(f"{base}.self_attn.qkv_proj.weight", None)
        if qkv is not None:
            q, k, v = np.split(qkv, [nh * hd, nh * hd + nkv * hd])
            sd[f"{base}.self_attn.q_proj.weight"] = q
            sd[f"{base}.self_attn.k_proj.weight"] = k
            sd[f"{base}.self_attn.v_proj.weight"] = v
        gu = sd.pop(f"{base}.mlp.gate_up_proj.weight", None)
        if gu is not None:
            g, u = np.split(gu, 2)  # HF Phi3MLP chunks gate first, then up
            sd[f"{base}.mlp.gate_proj.weight"] = g
            sd[f"{base}.mlp.up_proj.weight"] = u

    def kernel(name):
        if f"{name}.InLinear.weight" in sd:  # reference SVDLinear (compiled low-rank)
            p = {
                "in_kernel": np.ascontiguousarray(sd[f"{name}.InLinear.weight"].T.astype(dtype)),
                "out_kernel": np.ascontiguousarray(sd[f"{name}.OutLinear.weight"].T.astype(dtype)),
            }
            if f"{name}.OutLinear.bias" in sd:
                p["bias"] = sd[f"{name}.OutLinear.bias"].astype(dtype)
            return p
        if f"{name}.U" in sd:  # reference GRASPLayer (full SVD, trainable S)
            return {
                "u": sd[f"{name}.U"].astype(dtype),
                "s": sd[f"{name}.S"].astype(dtype),
                "vh": sd[f"{name}.Vh"].astype(dtype),
            }
        p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T.astype(dtype))}
        if f"{name}.bias" in sd:
            p["bias"] = sd[f"{name}.bias"].astype(dtype)
        return p

    def moe_block(base):
        """HF MixtralSparseMoeBlock -> stacked-expert layout (models/moe.py).

        HF: block_sparse_moe.gate.weight [E, D]; experts.<j>.w{1,3}.weight
        [F, D] and w2.weight [D, F] (torch [out, in]) -> ours: gate [D, E],
        w1/w3 [E, D, F], w2 [E, F, D].
        """
        e = config.num_local_experts
        return {
            "gate": {"kernel": np.ascontiguousarray(sd[f"{base}.gate.weight"].T.astype(dtype))},
            "experts": {
                w: np.stack([
                    np.ascontiguousarray(sd[f"{base}.experts.{j}.{w}.weight"].T.astype(dtype))
                    for j in range(e)
                ])
                for w in ("w1", "w2", "w3")
            },
        }

    layers = []
    for li in range(config.num_hidden_layers):
        base = f"model.layers.{li}"
        layer = {
            "input_layernorm": {"weight": sd[f"{base}.input_layernorm.weight"].astype(dtype)},
            "post_attention_layernorm": {
                "weight": sd[f"{base}.post_attention_layernorm.weight"].astype(dtype)
            },
            "self_attn": {p: kernel(f"{base}.self_attn.{p}") for p in ATTN_PROJS},
        }
        if f"{base}.pre_feedforward_layernorm.weight" in sd:  # Gemma-2
            layer["pre_feedforward_layernorm"] = {
                "weight": sd[f"{base}.pre_feedforward_layernorm.weight"].astype(dtype)}
            layer["post_feedforward_layernorm"] = {
                "weight": sd[f"{base}.post_feedforward_layernorm.weight"].astype(dtype)}
        if f"{base}.block_sparse_moe.gate.weight" in sd:
            layer["moe"] = moe_block(f"{base}.block_sparse_moe")
        else:
            layer["mlp"] = {p: kernel(f"{base}.mlp.{p}") for p in MLP_PROJS}
        layers.append(layer)

    params = {
        "embed_tokens": {"weight": sd["model.embed_tokens.weight"].astype(dtype)},
        "layers": layers,
        "norm": {"weight": sd["model.norm.weight"].astype(dtype)},
    }
    if not config.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": np.ascontiguousarray(sd["lm_head.weight"].T.astype(dtype))}
    return params


def load_hf_checkpoint(path: str, dtype=np.float32):
    """Load (config, params) from a local HF checkpoint directory."""
    config = config_from_dir(path)
    state_dict: Dict[str, Any] = {}

    st_files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    bin_files = sorted(
        f for f in os.listdir(path) if f.startswith("pytorch_model") and f.endswith(".bin")
    )
    if st_files:
        from safetensors import safe_open  # available via transformers dep

        for fname in st_files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    state_dict[k] = f.get_tensor(k)
    elif bin_files:
        import torch

        for fname in bin_files:
            state_dict.update(torch.load(os.path.join(path, fname), map_location="cpu", weights_only=True))
    else:
        raise FileNotFoundError(f"no safetensors/bin weights found under {path}")

    return config, params_from_state_dict(state_dict, config, dtype=dtype)
