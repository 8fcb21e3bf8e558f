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


def _export_proj(sd: Dict[str, np.ndarray], name: str, p: Dict[str, Any],
                 merge: bool, dtype) -> None:
    """Emit one projection subtree under HF naming (inverse of kernel())."""
    def put(key, arr):
        sd[key] = np.ascontiguousarray(np.asarray(arr, dtype=dtype))

    if "kernel_q" in p or "kernel_q4" in p or "in_kernel_q" in p or "in_kernel_q4" in p:
        raise ValueError(
            f"{name}: quantized projections cannot be exported to an HF "
            "state dict — export the floating-point params (quantize_params "
            "keeps the original tree untouched)"
        )
    if "in_kernel" in p and "kernel" in p:  # hybrid (pipeline padding form)
        if not merge:
            raise ValueError(
                f"{name}: hybrid projections only export with merge=True "
                "(or dehybridize_layers first)"
            )
        w = np.asarray(p["kernel"]) + np.asarray(p["in_kernel"]) @ np.asarray(p["out_kernel"])
        put(f"{name}.weight", w.T)
    elif "in_kernel" in p:  # compiled low-rank
        if merge:
            w = np.asarray(p["in_kernel"]) @ np.asarray(p["out_kernel"])
            put(f"{name}.weight", w.T)
        else:
            # reference SVDLinear naming (modeling_grasp.py:40-59): InLinear
            # then OutLinear, bias rides on OutLinear
            put(f"{name}.InLinear.weight", np.asarray(p["in_kernel"]).T)
            put(f"{name}.OutLinear.weight", np.asarray(p["out_kernel"]).T)
            if "bias" in p:
                put(f"{name}.OutLinear.bias", p["bias"])
            return
    elif "u" in p:  # full-SVD (grad-collection) form
        if merge:
            w = (np.asarray(p["u"]) * np.asarray(p["s"])) @ np.asarray(p["vh"])
            put(f"{name}.weight", w)  # u/s/vh already live in torch [out, in] space
        else:
            # reference GRASPLayer naming (modeling_grasp.py:65-67)
            put(f"{name}.U", p["u"])
            put(f"{name}.S", p["s"])
            put(f"{name}.Vh", p["vh"])
            return
    else:
        put(f"{name}.weight", np.asarray(p["kernel"]).T)
    if "bias" in p:
        put(f"{name}.bias", p["bias"])


def state_dict_from_params(params: Dict[str, Any], config: ModelConfig,
                           merge: bool = False, dtype=np.float32,
                           fuse_phi3: bool = False) -> Dict[str, np.ndarray]:
    """Inverse of params_from_state_dict: param pytree -> HF-style state dict.

    Dense kernels export as ``<name>.weight`` [out, in] (transposed back from
    the JAX [in, out] layout). Compressed projections export either

      - ``merge=False``: under the reference's own compiled-model naming —
        SVDLinear ``InLinear.weight``/``OutLinear.weight`` (+ ``OutLinear.bias``,
        modeling_grasp.py:40-59) for low-rank pairs and GRASPLayer ``U/S/Vh``
        (:65-67) for full-SVD subtrees — i.e. exactly the state_dict a
        reference-compressed torch model produces, so reference-side tooling
        (and our own params_from_state_dict) round-trips it; or
      - ``merge=True``: re-materialized dense (W = in_kernel·out_kernel /
        U·diag(S)·Vh), producing a stock HF checkpoint loadable with
        ``transformers`` (the reference's merge mode, modeling_grasp.py:447-460).

    fuse_phi3 re-fuses q/k/v -> qkv_proj and gate/up -> gate_up_proj (row
    concatenation, exact) so merged exports load into Phi3ForCausalLM.
    Quantized subtrees are rejected — export the fp tree instead.
    """
    sd: Dict[str, np.ndarray] = {}

    def put(key, arr):
        sd[key] = np.ascontiguousarray(np.asarray(arr, dtype=dtype))

    put("model.embed_tokens.weight", params["embed_tokens"]["weight"])
    put("model.norm.weight", params["norm"]["weight"])
    if "lm_head" in params:
        head = params["lm_head"]
        if "kernel" not in head:
            raise ValueError("quantized lm_head cannot be exported — use the fp tree")
        put("lm_head.weight", np.asarray(head["kernel"]).T)

    for li, layer in enumerate(params["layers"]):
        base = f"model.layers.{li}"
        for norm in ("input_layernorm", "post_attention_layernorm",
                     "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            if norm in layer and layer[norm] is not None:
                put(f"{base}.{norm}.weight", layer[norm]["weight"])
        for proj in ATTN_PROJS:
            _export_proj(sd, f"{base}.self_attn.{proj}", layer["self_attn"][proj],
                         merge, dtype)
        if "moe" in layer:
            moe = layer["moe"]
            put(f"{base}.block_sparse_moe.gate.weight",
                np.asarray(moe["gate"]["kernel"]).T)
            ex = moe["experts"]
            for w in MOE_PARTS_EXPORT:
                if w + "_a" in ex:  # stacked low-rank experts (engine MoE path)
                    if not merge:
                        raise ValueError(
                            f"{base}: compressed MoE experts have no reference "
                            "torch module naming — export with merge=True"
                        )
                    dense = np.einsum("eik,eko->eio", np.asarray(ex[w + "_a"]),
                                      np.asarray(ex[w + "_b"]))
                elif w in ex:
                    dense = np.asarray(ex[w])
                else:
                    raise ValueError(f"{base}: expert part {w} is quantized — "
                                     "export the fp tree")
                for j in range(dense.shape[0]):
                    put(f"{base}.block_sparse_moe.experts.{j}.{w}.weight", dense[j].T)
        else:
            for proj in MLP_PROJS:
                _export_proj(sd, f"{base}.mlp.{proj}", layer["mlp"][proj],
                             merge, dtype)

    if fuse_phi3:
        nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                       config.head_dim_)
        for li in range(config.num_hidden_layers):
            base = f"model.layers.{li}"
            try:
                q = sd.pop(f"{base}.self_attn.q_proj.weight")
                k = sd.pop(f"{base}.self_attn.k_proj.weight")
                v = sd.pop(f"{base}.self_attn.v_proj.weight")
            except KeyError:
                raise ValueError(
                    f"{base}: fuse_phi3 requires dense q/k/v — export "
                    "compressed attention with merge=True"
                ) from None
            assert q.shape[0] == nh * hd and k.shape[0] == nkv * hd, "GQA split mismatch"
            sd[f"{base}.self_attn.qkv_proj.weight"] = np.concatenate([q, k, v])
            g = sd.pop(f"{base}.mlp.gate_proj.weight")
            u = sd.pop(f"{base}.mlp.up_proj.weight")
            sd[f"{base}.mlp.gate_up_proj.weight"] = np.concatenate([g, u])
    return sd


MOE_PARTS_EXPORT = ("w1", "w2", "w3")


def hf_config_dict(config: ModelConfig, model_type: str = "llama") -> Dict[str, Any]:
    """ModelConfig -> an HF config.json dict (inverse of config_from_hf).

    model_type picks the transformers architecture ("llama", "mistral",
    "qwen2", "gemma", "gemma2", "mixtral", "phi3"); family-implied fields
    (Gemma norm/embedding behavior, Gemma-2 sandwich norms) are carried by
    the model_type itself on the HF side.
    """
    arch = {
        "llama": "LlamaForCausalLM", "mistral": "MistralForCausalLM",
        "qwen2": "Qwen2ForCausalLM", "gemma": "GemmaForCausalLM",
        "gemma2": "Gemma2ForCausalLM", "mixtral": "MixtralForCausalLM",
        "phi3": "Phi3ForCausalLM",
    }.get(model_type, "LlamaForCausalLM")
    d: Dict[str, Any] = {
        "architectures": [arch],
        "model_type": model_type,
        "vocab_size": config.vocab_size,
        "hidden_size": config.hidden_size,
        "intermediate_size": config.intermediate_size,
        "num_hidden_layers": config.num_hidden_layers,
        "num_attention_heads": config.num_attention_heads,
        "num_key_value_heads": config.num_key_value_heads,
        "max_position_embeddings": config.max_position_embeddings,
        "rope_theta": config.rope_theta,
        "rms_norm_eps": config.rms_norm_eps,
        "tie_word_embeddings": config.tie_word_embeddings,
        "attention_bias": config.attention_bias,
        "mlp_bias": config.mlp_bias,
        "hidden_act": config.hidden_act,
        "torch_dtype": "float32",
    }
    if config.head_dim is not None:  # decoupled head_dim (Gemma / explicit)
        d["head_dim"] = config.head_dim
    if model_type.startswith("gemma"):
        d["hidden_activation"] = config.hidden_act
    if config.sliding_window is not None:
        d["sliding_window"] = config.sliding_window
        d["use_sliding_window"] = True
    if config.rope_scaling is not None:
        d["rope_scaling"] = {k: (list(v) if isinstance(v, tuple) else v)
                             for k, v in config.rope_scaling}
    if config.layer_types is not None:
        d["layer_types"] = list(config.layer_types)
    if config.attn_logit_softcapping is not None:
        d["attn_logit_softcapping"] = config.attn_logit_softcapping
    if config.final_logit_softcapping is not None:
        d["final_logit_softcapping"] = config.final_logit_softcapping
    if config.query_pre_attn_scalar is not None:
        d["query_pre_attn_scalar"] = config.query_pre_attn_scalar
    if config.num_local_experts:
        d["num_local_experts"] = config.num_local_experts
        d["num_experts_per_tok"] = config.num_experts_per_tok
    return d


def save_hf_checkpoint(params: Dict[str, Any], config: ModelConfig, path: str,
                       merge: bool = True, model_type: str = "llama",
                       dtype=np.float32) -> None:
    """Write an HF-format checkpoint directory (model.safetensors + config.json).

    merge=True (default) re-materializes compressed projections so the result
    loads directly with ``AutoModelForCausalLM.from_pretrained`` — the exit
    ramp back to the torch ecosystem the reference lives in. merge=False
    keeps low-rank factors under the reference's SVDLinear naming (round-trips
    through params_from_state_dict; standard transformers classes cannot load
    it, matching the reference's own compiled checkpoints which also need its
    module code).
    """
    from safetensors.numpy import save_file  # available via transformers dep

    os.makedirs(path, exist_ok=True)
    sd = state_dict_from_params(params, config, merge=merge, dtype=dtype,
                                fuse_phi3=(model_type == "phi3"))
    save_file(sd, os.path.join(path, "model.safetensors"))
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(hf_config_dict(config, model_type), f, indent=2, sort_keys=True)


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
