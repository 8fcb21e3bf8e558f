"""Int8 weight quantization for serving the compressed model.

Compounds GRASP's low-rank compression: projection kernels (dense and
low-rank factors) are stored as int8 with per-output-channel fp32 scales —
halving HBM weight traffic, which is the decode bottleneck. Activations stay
bf16/fp32; the matmul runs after an on-the-fly dequant (XLA fuses the
convert+scale into the dot).

No reference counterpart (the reference serves fp16 torch modules); this is a
TPU-native serving extension. Quantization is symmetric absmax per output
channel; an optional Pallas stochastic-rounding kernel (guide pattern) is
provided for on-device quantization of large tensors.

Quantized params keep the SAME pytree keys with a ``_q``/``_scale`` suffix
(e.g. ``kernel`` -> ``kernel_q`` + ``kernel_scale``), so jit specializes on the
pytree structure and the projection plan is unchanged.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from grasp_tpu.models.llama import ATTN_PROJS, MLP_PROJS, Params

_QUANTIZABLE = ("kernel", "in_kernel", "out_kernel")


def quantize_int8(w: jax.Array, axis: int = 0) -> Tuple[jax.Array, jax.Array]:
    """Symmetric absmax int8 quantization along `axis` (the contraction dim).

    Returns (values int8, scale fp32) with w ~= values * scale, scale shaped
    to broadcast over `axis`.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def quant_matmul(x: jax.Array, q: jax.Array, scale: jax.Array) -> jax.Array:
    """y = x @ (q * scale) with dequant fused into the dot by XLA.

    q: [in, out] int8, scale: [1, out] fp32 (per-output-channel) — the scale
    commutes out of the contraction: (x @ q) * scale.
    """
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def quantize_proj(proj: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize one projection's kernels in place-of (returns new dict)."""
    out: Dict[str, Any] = {}
    for key, val in proj.items():
        if key in _QUANTIZABLE:
            q, scale = quantize_int8(val, axis=0)
            out[key + "_q"] = q
            out[key + "_scale"] = scale
        else:
            out[key] = val
    return out


def quantize_model_weights(params: Params, quantize_lm_head: bool = True) -> Params:
    """Quantize every projection kernel (dense + low-rank) to int8.

    The lm_head (the largest per-token weight read at decode) is quantized by
    default; embeddings and norms stay in their original dtype (row-gather /
    accuracy-sensitive).
    """
    layers = []
    for layer in params["layers"]:
        new_layer = dict(layer)
        for group, names in (("self_attn", ATTN_PROJS), ("mlp", MLP_PROJS)):
            new_group = dict(layer[group])
            for name in names:
                new_group[name] = quantize_proj(layer[group][name])
            new_layer[group] = new_group
        layers.append(new_layer)
    out = {**params, "layers": layers}
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_proj(params["lm_head"])
    return out


def quantized_size_bytes(params: Params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


# ---------------------------------------------------------------------------
# Pallas on-device quantization with stochastic rounding (guide pattern)
# ---------------------------------------------------------------------------


def pallas_quantize_int8(w: jax.Array, seed: int = 0) -> Tuple[jax.Array, jax.Array]:
    """On-device int8 quantization with stochastic rounding (TPU Pallas).

    Per-output-channel absmax scales like quantize_int8 but rounding is
    unbiased — preferable when quantizing factors that will be fine-tuned.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    in_f, out_f = w.shape

    def kernel(seed_ref, w_ref, q_ref, scale_ref):
        pltpu.prng_seed(seed_ref[0])
        wf = w_ref[:].astype(jnp.float32)
        absmax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 127.0)
        scale_ref[:] = scale
        scaled = wf / scale
        bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
        # stochastic round: add uniform [0,1) then floor, clip to int8 range
        # (TPU can't cast uint32->f32 directly; go through a 24-bit int32)
        u = (bits >> 8).astype(jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))
        q_ref[:] = jnp.clip(jnp.floor(scaled + u), -127, 127).astype(jnp.int8)

    q, scale = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((in_f, out_f), jnp.int8),
            jax.ShapeDtypeStruct((1, out_f), jnp.float32),
        ),
    )(jnp.asarray([seed], jnp.int32), w)
    return q, scale
