"""LLaMA-family causal LM in pure functional JAX with projection overrides.

TPU-native re-design of the compute substrate the reference gets from
HF transformers (LlamaForCausalLM): immutable parameter pytrees + a static
per-layer *plan* that says, for each of the seven projections
(q/k/v/o, gate/up/down), whether it is

  - ``dense``   — ordinary [in, out] kernel,
  - ``svd``     — full SVD factors (U, S, Vh) with *S* the only trainable
                  leaf (reference GRASPLayer, modeling_grasp.py:62-79), or
  - ``lowrank`` — compiled two-matmul low-rank module (reference SVDLinear,
                  modeling_grasp.py:25-59).

"Replacing a layer" (reference ``_set_module`` swap, modeling_grasp.py:218-236)
becomes swapping a leaf subtree in the params pytree plus flipping the plan
entry — the forward function is pure and jit-compiles per unique plan.

Numerics follow HF LlamaForCausalLM exactly (RMSNorm in fp32, rotary embedding
with rotate_half, GQA via KV repeat, fp32 softmax) so fp32 parity against the
torch reference is testable on CPU.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.ops.lowrank import dense_apply, lowrank_apply, svd_apply

Params = Dict[str, Any]

ATTN_PROJS: Tuple[str, ...] = ("q_proj", "k_proj", "v_proj", "o_proj")
MLP_PROJS: Tuple[str, ...] = ("gate_proj", "up_proj", "down_proj")
PROJ_ORDER: Tuple[str, ...] = ATTN_PROJS + MLP_PROJS

# A layer plan is a 7-tuple of kinds in PROJ_ORDER; a model plan is a tuple of
# layer plans. Both are hashable => usable as jit static arguments.
LayerPlan = Tuple[str, ...]
ModelPlan = Tuple[LayerPlan, ...]

DENSE, SVD, LOWRANK = "dense", "svd", "lowrank"
# Dual-slot sum form y = x@kernel + (x@in_kernel)@out_kernel. Used by
# pipeline parallelism to make heterogeneous GRASP plans (dense + low-rank
# layers mixed) structurally uniform so layers stack/scan: the unused slot
# holds exact zeros (parallel.pipeline.hybridize_layers).
HYBRID = "hybrid"


def default_plan(config: ModelConfig) -> ModelPlan:
    return tuple(tuple(DENSE for _ in PROJ_ORDER) for _ in range(config.num_hidden_layers))


def plan_set(plan: ModelPlan, layer_id: int, proj: str, kind: str) -> ModelPlan:
    """Return a new plan with one projection's kind changed."""
    i = PROJ_ORDER.index(proj)
    layer = list(plan[layer_id])
    layer[i] = kind
    return plan[:layer_id] + (tuple(layer),) + plan[layer_id + 1 :]


def plan_kind(plan: ModelPlan, layer_id: int, proj: str) -> str:
    return plan[layer_id][PROJ_ORDER.index(proj)]


def plan_from_params(params: Params, config: ModelConfig) -> ModelPlan:
    """Derive the plan from a params pytree's subtree keys (in_kernel =>
    lowrank, u/s/vh => svd, kernel => dense) — e.g. for trees converted from
    reference-GRASP checkpoints by hf_io.params_from_state_dict."""
    layers = []
    for layer in params["layers"]:
        lp = []
        for proj in PROJ_ORDER:
            group = layer["self_attn"] if proj in ATTN_PROJS else layer.get("mlp")
            if group is None:  # MoE layer: expert MLP slots stay dense-marked
                lp.append(DENSE)
                continue
            p = group[proj]
            if "in_kernel" in p or "in_kernel_q" in p or "in_kernel_q4" in p:
                lp.append(LOWRANK)
            elif "u" in p:
                lp.append(SVD)
            else:
                lp.append(DENSE)
        layers.append(tuple(lp))
    return tuple(layers)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _proj_shapes(config: ModelConfig) -> Dict[str, Tuple[int, int]]:
    d, f = config.hidden_size, config.intermediate_size
    return {
        "q_proj": (d, config.q_dim),
        "k_proj": (d, config.kv_dim),
        "v_proj": (d, config.kv_dim),
        "o_proj": (config.q_dim, d),
        "gate_proj": (d, f),
        "up_proj": (d, f),
        "down_proj": (f, d),
    }


def init_params(rng: jax.Array, config: ModelConfig, scale: float = 0.02) -> Params:
    """Random-normal init (HF default std 0.02); all projections dense."""
    dtype = jnp.dtype(config.dtype)
    shapes = _proj_shapes(config)
    keys = jax.random.split(rng, config.num_hidden_layers + 2)

    def proj(key, name, with_bias):
        in_f, out_f = shapes[name]
        p = {"kernel": (jax.random.normal(key, (in_f, out_f), jnp.float32) * scale).astype(dtype)}
        if with_bias:
            p["bias"] = jnp.zeros((out_f,), dtype)
        return p

    # (1+w)-norm families (Gemma) zero-init the norm weight — HF
    # GemmaRMSNorm's nn.Parameter(torch.zeros(dim)) — so the effective
    # scale starts at 1 either way.
    norm_init = jnp.zeros if config.norm_plus_one else jnp.ones

    layers = []
    for li in range(config.num_hidden_layers):
        lk = jax.random.split(keys[li], 7)
        layer = {
            "input_layernorm": {"weight": norm_init((config.hidden_size,), dtype)},
            "post_attention_layernorm": {"weight": norm_init((config.hidden_size,), dtype)},
            "self_attn": {
                name: proj(lk[j], name, config.attention_bias)
                for j, name in enumerate(ATTN_PROJS)
            },
        }
        if config.sandwich_norms:  # Gemma-2: norms around the MLP too
            layer["pre_feedforward_layernorm"] = {"weight": norm_init((config.hidden_size,), dtype)}
            layer["post_feedforward_layernorm"] = {"weight": norm_init((config.hidden_size,), dtype)}
        if config.num_local_experts > 0:
            from grasp_tpu.models.moe import init_moe_params

            layer["moe"] = init_moe_params(lk[4], config, scale=scale)
        else:
            layer["mlp"] = {
                name: proj(lk[4 + j], name, config.mlp_bias)
                for j, name in enumerate(MLP_PROJS)
            }
        layers.append(layer)

    embed = (jax.random.normal(keys[-2], (config.vocab_size, config.hidden_size), jnp.float32) * scale).astype(dtype)
    params: Params = {
        "embed_tokens": {"weight": embed},
        "layers": layers,
        "norm": {"weight": norm_init((config.hidden_size,), dtype)},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = {
            "kernel": (
                jax.random.normal(keys[-1], (config.hidden_size, config.vocab_size), jnp.float32) * scale
            ).astype(dtype)
        }
    return params


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             plus_one: bool = False) -> jax.Array:
    """HF LlamaRMSNorm: fp32 variance, scale applied after cast-back.

    plus_one=True is GemmaRMSNorm (modeling_gemma.GemmaRMSNorm): the scale
    is (1 + w) with w zero-initialized, and the multiply happens in fp32
    BEFORE the cast back (transformers#29402) — same order as here."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32)
    if plus_one:
        w = 1.0 + w
    return (w * xf).astype(dtype)


def mlp_act(config: ModelConfig):
    """The MLP gate activation (HF ACT2FN[config.hidden_act]): SwiGLU
    families use silu; Gemma's GeGLU uses the tanh-approximate gelu
    (identical formula to torch's gelu_pytorch_tanh)."""
    act = config.hidden_act
    if act in ("silu", "swish"):
        return jax.nn.silu
    if act in ("gelu_pytorch_tanh", "gelu_tanh"):
        return partial(jax.nn.gelu, approximate=True)
    if act == "gelu":
        return partial(jax.nn.gelu, approximate=False)
    raise ValueError(f"unsupported hidden_act: {act!r}")


def embed_lookup(params: Params, ids: jax.Array, config: ModelConfig) -> jax.Array:
    """Token embedding lookup; Gemma additionally scales by sqrt(hidden)
    with the normalizer rounded to the embedding dtype first (HF
    GemmaModel.forward: torch.tensor(hidden_size**0.5, dtype=h.dtype))."""
    h = params["embed_tokens"]["weight"][ids]
    if config.scale_embeddings:
        h = h * jnp.asarray(config.hidden_size ** 0.5, h.dtype)
    return h


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float,
                 scaling=None) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables for rotary embedding, HF convention (duplicated freqs).

    scaling: optional HF rope_scaling (ModelConfig.rope_scaling tuple pairs
    or a dict). "llama3" replicates transformers'
    _compute_llama3_parameters exactly: low-frequency components (wavelength
    > original_ctx / low_freq_factor) divide by `factor`, high-frequency
    ones stay, the band between interpolates smoothly. "linear" divides all
    frequencies by `factor` (position interpolation). "longrope" (Phi-3
    long-context) replicates _compute_longrope_parameters: per-dimension
    short/long rescale factors — the long set applies exactly when the
    call's max position exceeds original_max_position_embeddings (HF
    switches by the same seq-len test; here it is a traced select, so one
    compile serves both regimes) — plus the attention magnitude factor
    sqrt(1 + ln(factor)/ln(original_ctx)) on cos/sin."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    attn_scale = 1.0
    if scaling:
        d = dict(scaling)
        rtype = d.get("rope_type", d.get("type", "default"))
        if rtype == "longrope":
            orig = float(d["original_max_position_embeddings"])
            maxp = float(d.get("max_position_embeddings", orig))
            factor = maxp / orig
            attn_scale = d.get("attention_factor")
            if attn_scale is None:
                attn_scale = (1.0 if factor <= 1.0 else
                              float(np.sqrt(1.0 + np.log(factor) / np.log(orig))))
            short = jnp.asarray(d["short_factor"], jnp.float32)
            long = jnp.asarray(d["long_factor"], jnp.float32)
            use_long = positions.max() + 1 > orig
            inv_freq = inv_freq / jnp.where(use_long, long, short)
        elif rtype == "llama3":
            factor = float(d["factor"])
            lo, hi = float(d["low_freq_factor"]), float(d["high_freq_factor"])
            old_ctx = float(d["original_max_position_embeddings"])
            wavelen = 2.0 * np.pi / inv_freq
            inv2 = jnp.where(wavelen > old_ctx / lo, inv_freq / factor, inv_freq)
            smooth = (old_ctx / wavelen - lo) / (hi - lo)
            smoothed = (1.0 - smooth) * inv2 / factor + smooth * inv2
            is_med = (wavelen >= old_ctx / hi) & (wavelen <= old_ctx / lo)
            inv_freq = jnp.where(is_med, smoothed, inv2)
        elif rtype == "linear":
            inv_freq = inv_freq / float(d["factor"])
        elif rtype != "default":
            raise ValueError(f"unsupported rope_scaling type: {rtype!r}")
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb) * attn_scale, jnp.sin(emb) * attn_scale


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jax.Array, k: jax.Array, cos: jax.Array, sin: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """q, k: [B, n_heads, S, hd]; cos/sin: [B, S, hd] (or broadcastable)."""
    cos = cos[:, None, :, :].astype(q.dtype)
    sin = sin[:, None, :, :].astype(q.dtype)
    q = q * cos + _rotate_half(q) * sin
    k = k * cos + _rotate_half(k) * sin
    return q, k


def proj_apply(x: jax.Array, p: Params, kind: str, use_pallas: bool = False) -> jax.Array:
    bias = p.get("bias")
    if kind == DENSE:
        if "kernel_q" in p:  # int8-quantized serving weights (ops.quant)
            from grasp_tpu.ops.quant import quant_matmul

            y = quant_matmul(x, p["kernel_q"], p["kernel_scale"])
            return y + bias if bias is not None else y
        if "kernel_q4" in p:  # nibble-packed int4 serving weights (ops.quant)
            from grasp_tpu.ops.quant import quant_matmul_int4

            y = quant_matmul_int4(x, p["kernel_q4"], p["kernel_scale"])
            return y + bias if bias is not None else y
        return dense_apply(x, p["kernel"], bias)
    if kind == SVD:
        return svd_apply(x, p["u"], p["s"], p["vh"], bias)
    if kind == LOWRANK:
        if "in_kernel_q" in p:
            from grasp_tpu.ops.quant import quant_matmul

            h = quant_matmul(x, p["in_kernel_q"], p["in_kernel_scale"])
            y = quant_matmul(h, p["out_kernel_q"], p["out_kernel_scale"])
            return y + bias if bias is not None else y
        if "in_kernel_q4" in p:
            from grasp_tpu.ops.quant import quant_matmul_int4

            h = quant_matmul_int4(x, p["in_kernel_q4"], p["in_kernel_scale"])
            y = quant_matmul_int4(h, p["out_kernel_q4"], p["out_kernel_scale"])
            return y + bias if bias is not None else y
        return lowrank_apply(x, p["in_kernel"], p["out_kernel"], bias, use_pallas=use_pallas)
    if kind == HYBRID:
        y = dense_apply(x, p["kernel"], None) + lowrank_apply(
            x, p["in_kernel"], p["out_kernel"], None, use_pallas=use_pallas
        )
        return y + bias if bias is not None else y
    raise ValueError(f"unknown projection kind {kind!r}")


def _attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    num_kv_groups: int,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
) -> jax.Array:
    """Scaled-dot-product attention with GQA KV repeat and fp32 softmax.

    q: [B, nh, S, hd], k/v: [B, nkv, T, hd], mask: [B, 1, S, T] additive.
    scale defaults to head_dim**-0.5 (Gemma-2 overrides with
    query_pre_attn_scalar**-0.5); softcap is Gemma-2's attn logit cap.
    """
    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=1)
        v = jnp.repeat(v, num_kv_groups, axis=1)
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if softcap is not None:  # Gemma-2: cap BEFORE the mask (HF order)
        scores = softcap * jnp.tanh(scores / softcap)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=q.dtype)


def _attention_q8(
    q: jax.Array,
    k8: jax.Array,
    k_scale: jax.Array,
    v8: jax.Array,
    v_scale: jax.Array,
    mask: Optional[jax.Array],
    num_kv_groups: int,
    scale: Optional[float] = None,
    softcap: Optional[float] = None,
) -> jax.Array:
    """Attention directly over the int8 KV cache — no materialized dequant.

    The per-key scale commutes out of the score contraction
    (q·(k8*s) = (q·k8)*s) and the per-value scale folds into the softmax
    weights (sum_t p_t*(v8_t*s_t) = sum_t (p_t*s_t)*v8_t), so both einsums
    read int8 from HBM.
    """
    if num_kv_groups > 1:
        k8 = jnp.repeat(k8, num_kv_groups, axis=1)
        v8 = jnp.repeat(v8, num_kv_groups, axis=1)
        k_scale = jnp.repeat(k_scale, num_kv_groups, axis=1)
        v_scale = jnp.repeat(v_scale, num_kv_groups, axis=1)
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k8.astype(q.dtype), preferred_element_type=jnp.float32
    )
    scores = scores * (k_scale[..., 0][:, :, None, :] * scale)
    if softcap is not None:  # Gemma-2: cap BEFORE the mask (HF order)
        scores = softcap * jnp.tanh(scores / softcap)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    weights = (probs * v_scale[..., 0][:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v8.astype(q.dtype), preferred_element_type=q.dtype)


def attn_mlp_residual(
    h: jax.Array,
    attn: jax.Array,
    lp: Params,
    kinds: Dict[str, str],
    config: ModelConfig,
    up: bool = False,
) -> jax.Array:
    """The post-attention half of a decoder layer, shared by EVERY decode
    body (full forward, paged decode, speculative verify, sequence-parallel)
    so family variants live in exactly one place.

    h: the residual stream BEFORE the attention residual add; attn: the
    o_proj output. Applies the Gemma-2 sandwich norms when the layer carries
    them (post_attention_layernorm on the attention OUTPUT pre-residual,
    pre/post_feedforward_layernorm around the MLP — HF Gemma2DecoderLayer),
    the plain LLaMA flow otherwise, with the MLP gate activation and (1+w)
    norm option config-driven. Returns the stream after the MLP residual."""
    if "pre_feedforward_layernorm" in lp:  # Gemma-2 sandwich
        attn = rms_norm(attn, lp["post_attention_layernorm"]["weight"],
                        config.rms_norm_eps, plus_one=config.norm_plus_one)
    h = h + attn

    pre_mlp = lp.get("pre_feedforward_layernorm") or lp["post_attention_layernorm"]
    x = rms_norm(h, pre_mlp["weight"], config.rms_norm_eps,
                 plus_one=config.norm_plus_one)
    if "moe" in lp:  # Mixtral-family sparse MoE block
        from grasp_tpu.models.moe import moe_apply

        return h + moe_apply(x, lp["moe"], config)
    mp = lp["mlp"]
    gate = proj_apply(x, mp["gate_proj"], kinds["gate_proj"], up)
    up_h = proj_apply(x, mp["up_proj"], kinds["up_proj"], up)
    mlp_out = proj_apply(mlp_act(config)(gate) * up_h, mp["down_proj"], kinds["down_proj"], up)
    if "post_feedforward_layernorm" in lp:  # Gemma-2 sandwich
        mlp_out = rms_norm(mlp_out, lp["post_feedforward_layernorm"]["weight"],
                           config.rms_norm_eps, plus_one=config.norm_plus_one)
    return h + mlp_out


def _layer_forward(
    lp: Params,
    layer_plan: LayerPlan,
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    config: ModelConfig,
    kv: Optional[Dict[str, jax.Array]] = None,
    cache_index: Optional[jax.Array] = None,
    flash_ok: bool = False,
) -> Tuple[jax.Array, Optional[Dict[str, jax.Array]]]:
    b, s, d = h.shape
    nh, nkv, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim_

    kinds = dict(zip(PROJ_ORDER, layer_plan))
    up = config.use_pallas_lowrank

    # --- self attention ---
    x = rms_norm(h, lp["input_layernorm"]["weight"], config.rms_norm_eps,
                 plus_one=config.norm_plus_one)
    ap = lp["self_attn"]
    q = proj_apply(x, ap["q_proj"], kinds["q_proj"], up).reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    k = proj_apply(x, ap["k_proj"], kinds["k_proj"], up).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = proj_apply(x, ap["v_proj"], kinds["v_proj"], up).reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    q, k = apply_rope(q, k, cos, sin)

    kv_scales = None
    if kv is not None:
        # decode/prefill with cache: write current k/v at cache_index
        if "k_scale" in kv:  # int8-quantized cache (init_kv_cache quantized=True)
            k8, ks = _quantize_kv(k)
            v8, vs = _quantize_kv(v)
            kv = {
                "k": jax.lax.dynamic_update_slice(kv["k"], k8, (0, 0, cache_index, 0)),
                "k_scale": jax.lax.dynamic_update_slice(kv["k_scale"], ks, (0, 0, cache_index, 0)),
                "v": jax.lax.dynamic_update_slice(kv["v"], v8, (0, 0, cache_index, 0)),
                "v_scale": jax.lax.dynamic_update_slice(kv["v_scale"], vs, (0, 0, cache_index, 0)),
            }
            k, v = kv["k"], kv["v"]
            kv_scales = (kv["k_scale"], kv["v_scale"])
        else:
            k_cache = jax.lax.dynamic_update_slice(kv["k"], k.astype(kv["k"].dtype), (0, 0, cache_index, 0))
            v_cache = jax.lax.dynamic_update_slice(kv["v"], v.astype(kv["v"].dtype), (0, 0, cache_index, 0))
            kv = {"k": k_cache, "v": v_cache}
            k, v = k_cache, v_cache

    a_scale = (config.query_pre_attn_scalar ** -0.5
               if config.query_pre_attn_scalar else None)
    a_cap = config.attn_logit_softcapping
    if kv_scales is not None:
        attn = _attention_q8(q, k, kv_scales[0], v, kv_scales[1], mask, nh // nkv,
                             scale=a_scale, softcap=a_cap)
    elif flash_ok and kv is None and config.use_flash_attention and jax.default_backend() != "cpu":
        # pure-causal full-sequence path: fused Pallas flash attention
        # (no [S,S] scores materialization, GQA via index maps)
        from grasp_tpu.ops.pallas_attention import flash_attention

        attn = flash_attention(q, k, v, nh // nkv)
    else:
        attn = _attention(q, k, v, mask, nh // nkv, scale=a_scale, softcap=a_cap)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, nh * hd)
    attn = proj_apply(attn, ap["o_proj"], kinds["o_proj"], up)
    return attn_mlp_residual(h, attn, lp, kinds, config, up), kv



def _lm_logits(h: jax.Array, params: Params,
               softcap: Optional[float] = None) -> jax.Array:
    """Final projection to vocab; supports int8-quantized lm_head (ops.quant).

    softcap is Gemma-2's final_logit_softcapping: logits = c*tanh(logits/c)."""
    if "lm_head" not in params:
        logits = jnp.dot(h, params["embed_tokens"]["weight"].T, preferred_element_type=h.dtype)
    else:
        head = params["lm_head"]
        if "kernel_q" in head:
            from grasp_tpu.ops.quant import quant_matmul

            logits = quant_matmul(h, head["kernel_q"], head["kernel_scale"])
        elif "kernel_q4" in head:
            from grasp_tpu.ops.quant import quant_matmul_int4

            logits = quant_matmul_int4(h, head["kernel_q4"], head["kernel_scale"])
        else:
            logits = dense_apply(h, head["kernel"])
    if softcap is not None:
        logits = softcap * jnp.tanh(logits / softcap)
    return logits


def _causal_mask(s: int, t: int, offset: int, dtype=jnp.float32,
                 window: Optional[int] = None) -> jax.Array:
    """Additive causal mask [1, 1, s, t]; query i attends keys <= i + offset.

    window (Mistral sliding attention, HF MistralModel mask semantics):
    query i additionally sees only keys > i + offset - window — the last
    `window` positions inclusive of itself."""
    qi = jnp.arange(s)[:, None] + offset
    ki = jnp.arange(t)[None, :]
    allow = ki <= qi
    if window is not None:
        allow &= ki > qi - window
    return jnp.where(allow, 0.0, jnp.finfo(dtype).min).astype(dtype)[None, None]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    input_ids: jax.Array,
    *,
    config: ModelConfig,
    plan: Optional[ModelPlan] = None,
    attention_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    output_hidden_states: bool = False,
    remat: bool = False,
    scan_layers: bool = True,
    split_layers: Tuple[int, ...] = (),
    start_layer: int = 0,
    stop_layer: Optional[int] = None,
    hidden_in: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Full-sequence forward pass.

    Returns dict with "logits" [B, S, V] and, if requested, "hidden_states":
    a list of L+1 arrays matching HF semantics exactly — entries 0..L-1 are the
    inputs to each decoder layer (entry 0 = embedding output) and the final
    entry is the *final-norm applied* output of the last layer. The reference's
    block-influence consumes this exact tuple (modeling_grasp.py:180-183).

    split_layers: layer ids forced OUT of any scan group (run unrolled).
    Essential when differentiating w.r.t. one layer's kernels under
    scan_layers: if the trainable layer sits inside a scan stack, the stack
    becomes differentiable and the backward materializes full-model-sized
    zero-gradient stacks (observed: 2x bf16[32,4096,11008] + 14 GiB
    fragmentation on the 7B = compile-time OOM). Splitting the layer keeps
    the stacks constant so their cotangents are never built.

    start_layer/stop_layer/hidden_in: run only layers [start_layer,
    stop_layer). With stop_layer set, returns {"hidden": h} — the input to
    layer stop_layer, no final norm/logits. With start_layer > 0, hidden_in
    supplies that boundary activation instead of the embedding. Splitting the
    forward at the lowest-compressed-layer boundary lets the sequential
    compression sweep skip (or cache) the prefix that no round ever modifies
    (reference sweeps re-run the full model per round, grasp.py:81-126).
    """
    if plan is None:
        plan = default_plan(config)
    b, s = input_ids.shape
    if start_layer > 0:
        assert hidden_in is not None, "start_layer > 0 requires hidden_in"
        h = hidden_in
    else:
        h = embed_lookup(params, input_ids, config)

    if positions is None:
        positions = jnp.arange(s)[None, :].repeat(b, axis=0)
    cos, sin = rope_cos_sin(positions, config.head_dim_, config.rope_theta,
                            scaling=config.rope_scaling)

    # one mask per distinct per-layer window (Gemma-2 alternates sliding and
    # full layers via layer_types; other families use a single window or none)
    pad = None
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min)
    _masks: Dict[Any, jax.Array] = {}

    def mask_for(w):
        if w not in _masks:
            m = _causal_mask(s, s, 0, window=w)
            _masks[w] = m + pad if pad is not None else m
        return _masks[w]

    hidden_states: List[jax.Array] = []

    # Group consecutive layers with identical plans and scan over the stacked
    # group: the layer body compiles ONCE per group instead of once per layer —
    # on a 22-layer 1.1B model this cuts trace+compile time by an order of
    # magnitude, which dominates wall-clock on the compression pipeline.
    # Heterogeneous (compressed) layers fall out into their own groups and
    # stay unrolled.
    groups: List[Tuple[LayerPlan, List[int]]] = []
    group_keys: List[Any] = []
    split = set(split_layers)
    stop = config.num_hidden_layers if stop_layer is None else stop_layer

    def _stack_key(li):
        # layers are stackable iff plan AND params pytree (structure + leaf
        # shapes) agree — params-keyed transforms (quantized or GRASP-
        # compressed MoE experts, models.moe) don't show up in the plan —
        # AND they attend with the same window (Gemma-2 alternates)
        leaves, treedef = jax.tree.flatten(params["layers"][li])
        return (plan[li], treedef, tuple(jnp.shape(x) for x in leaves),
                config.layer_window(li))

    for li in range(start_layer, stop):
        key = _stack_key(li)
        if (
            groups
            and group_keys[-1] == key
            and li not in split
            and groups[-1][1][-1] not in split
        ):
            groups[-1][1].append(li)
        else:
            groups.append((plan[li], [li]))
            group_keys.append(key)

    # flash kernel handles pure-causal, uncapped masks only; a sliding
    # window shorter than the sequence (or Gemma-2's logit softcap) needs
    # the dense attention path
    flash_base = attention_mask is None and config.attn_logit_softcapping is None

    for layer_plan, idxs in groups:
        w = config.layer_window(idxs[0])  # identical across the group (_stack_key)
        mask = mask_for(w)
        flash_ok = flash_base and (w is None or s <= w)

        def one_layer(lp, h_, _plan=layer_plan, mask=mask, flash_ok=flash_ok):
            return _layer_forward(lp, _plan, h_, cos, sin, mask, config, flash_ok=flash_ok)[0]

        body = jax.checkpoint(one_layer) if remat else one_layer

        if scan_layers and len(idxs) >= 2:
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[params["layers"][i] for i in idxs]
            )

            def scan_body(h_, lp):
                h_out = body(lp, h_)
                return h_out, (h_ if output_hidden_states else 0)

            h_final, h_ins = jax.lax.scan(scan_body, h, stacked)
            if output_hidden_states:
                hidden_states.extend(h_ins[i] for i in range(len(idxs)))
            h = h_final
        else:
            for i in idxs:
                if output_hidden_states:
                    hidden_states.append(h)
                h = body(params["layers"][i], h)

    if stop_layer is not None:
        return {"hidden": h}

    h = rms_norm(h, params["norm"]["weight"], config.rms_norm_eps,
                 plus_one=config.norm_plus_one)
    if output_hidden_states:
        hidden_states.append(h)

    logits = _lm_logits(h, params, softcap=config.final_logit_softcapping)

    out: Dict[str, Any] = {"logits": logits}
    if output_hidden_states:
        out["hidden_states"] = hidden_states
    return out


def hf_causal_lm_loss(logits: jax.Array, labels: jax.Array, ignore_index: int = -100) -> jax.Array:
    """HF CausalLM loss: internally shift logits[:-1] vs labels[1:], mean CE.

    NOTE the calibration loader *pre-shifts* labels one step (reference
    dataset/loader.py:33-36, 54-56) and HF shifts again here — the effective
    "predict t+2" objective is a reference quirk we replicate faithfully for
    parity (SURVEY.md §2 component 7).
    """
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)


def hf_causal_lm_loss_sum(
    logits: jax.Array, labels: jax.Array, ignore_index: int = -100
) -> jax.Array:
    """Unreduced HF CausalLM loss: fp32 CE *sum* over shifted valid positions.

    This is transformers' ``fixed_cross_entropy(reduction="sum")`` path — the
    numerator of the token-weighted gradient-accumulation loss, where the
    denominator is ``num_items_in_batch`` counted over the *unshifted* labels
    of the whole accumulation group (Trainer._get_num_items_in_batch). Used by
    ``train.recover.make_accum_train_step``.
    """
    shift_logits = logits[:, :-1, :].astype(jnp.float32)
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.where(valid, nll, 0.0).sum()


# ---------------------------------------------------------------------------
# KV-cache generation
# ---------------------------------------------------------------------------


def init_kv_cache(
    config: ModelConfig, batch: int, max_len: int, dtype=None, quantized: bool = False
) -> List[Dict[str, jax.Array]]:
    """KV cache; quantized=True stores K/V as int8 with one fp32 absmax scale
    per (batch, head, position) — ~half the HBM traffic, which dominates
    decode at long context. The scales commute out of both attention
    contractions (score scale per KEY position; value scale folds into the
    softmax weights), so attention runs directly on the int8 cache with no
    materialized dequant (beyond-reference serving extension)."""
    dtype = dtype or jnp.dtype(config.dtype)
    nkv, hd = config.num_key_value_heads, config.head_dim_
    if quantized:
        return [
            {
                "k": jnp.zeros((batch, nkv, max_len, hd), jnp.int8),
                "k_scale": jnp.ones((batch, nkv, max_len, 1), jnp.float32),
                "v": jnp.zeros((batch, nkv, max_len, hd), jnp.int8),
                "v_scale": jnp.ones((batch, nkv, max_len, 1), jnp.float32),
            }
            for _ in range(config.num_hidden_layers)
        ]
    return [
        {
            "k": jnp.zeros((batch, nkv, max_len, hd), dtype),
            "v": jnp.zeros((batch, nkv, max_len, hd), dtype),
        }
        for _ in range(config.num_hidden_layers)
    ]


def _quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(batch, head, position) symmetric absmax int8 over head_dim."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _forward_with_cache(
    params: Params,
    input_ids: jax.Array,
    cache: List[Dict[str, jax.Array]],
    cache_index: jax.Array,
    *,
    config: ModelConfig,
    plan: ModelPlan,
    length_mask: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
) -> Tuple[jax.Array, List[Dict[str, jax.Array]]]:
    """Run `s` tokens through the model, writing KV at [cache_index, ...).

    length_mask: optional [B, T] validity of cache slots (for left-padded
    prompts); combined with causality against absolute positions.
    positions: optional [B, s] RoPE positions override (left-padded batches
    need per-row positions starting at 0 at each row's first real token).
    """
    b, s = input_ids.shape
    t = cache[0]["k"].shape[2]
    h = embed_lookup(params, input_ids, config)

    if positions is None:
        positions = (jnp.arange(s)[None, :] + cache_index).repeat(b, axis=0)
    cos, sin = rope_cos_sin(positions, config.head_dim_, config.rope_theta,
                            scaling=config.rope_scaling)

    # queries sit at absolute cache slots cache_index + arange(s);
    # one mask per distinct per-layer window (Gemma-2 alternates)
    qi = jnp.arange(s)[:, None] + cache_index
    ki = jnp.arange(t)[None, :]
    pad = None
    if length_mask is not None:
        pad = jnp.where(length_mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min)
    _masks: Dict[Any, jax.Array] = {}

    def mask_for(w):
        if w not in _masks:
            allow = ki <= qi
            if w is not None:
                allow = allow & (ki > qi - w)
            m = jnp.where(allow, 0.0, jnp.finfo(jnp.float32).min)[None, None]
            _masks[w] = m + pad if pad is not None else m
        return _masks[w]

    new_cache = []
    for li in range(config.num_hidden_layers):
        h, kv = _layer_forward(
            params["layers"][li], plan[li], h, cos, sin,
            mask_for(config.layer_window(li)), config,
            kv=cache[li], cache_index=cache_index,
        )
        new_cache.append(kv)

    h = rms_norm(h, params["norm"]["weight"], config.rms_norm_eps,
                 plus_one=config.norm_plus_one)
    logits = _lm_logits(h, params, softcap=config.final_logit_softcapping)
    return logits, new_cache


def prefill(params, input_ids, cache, *, config, plan, length_mask=None, positions=None):
    """Process the whole prompt at cache position 0. Returns (logits, cache)."""
    return _forward_with_cache(
        params, input_ids, cache, jnp.asarray(0, jnp.int32),
        config=config, plan=plan, length_mask=length_mask, positions=positions,
    )


def decode_step(params, token_ids, cache, cache_index, *, config, plan, length_mask=None,
                positions=None):
    """One-token decode: token_ids [B, 1], cache_index scalar int32."""
    return _forward_with_cache(
        params, token_ids, cache, cache_index,
        config=config, plan=plan, length_mask=length_mask, positions=positions,
    )
