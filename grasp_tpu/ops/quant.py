"""Int8 / int4 weight quantization for serving the compressed model.

Compounds GRASP's low-rank compression: projection kernels (dense and
low-rank factors) are stored as int8 with per-output-channel fp32 scales —
halving HBM weight traffic, which is the decode bottleneck — or as
nibble-packed int4 with group-wise scales (bits=4), halving it again.
Activations stay bf16/fp32; the matmul runs after an on-the-fly dequant (XLA
fuses the convert+scale into the dot; the int4 nibble unpack is elementwise
int8 shifts fused on the VPU).

No reference counterpart (the reference serves fp16 torch modules); this is a
TPU-native serving extension. Quantization is symmetric absmax; an optional
Pallas stochastic-rounding kernel (guide pattern) is provided for on-device
quantization of large tensors.

Quantized params keep the SAME pytree keys with a ``_q``/``_q4``/``_scale``
suffix (e.g. ``kernel`` -> ``kernel_q`` + ``kernel_scale``), so jit
specializes on the pytree structure and the projection plan is unchanged.
int4 storage deliberately avoids the S4 dtype: S4 arrays cannot cross the jit
boundary on the axon runtime (device_put relayout recursion), and packed int8
reads the same 4 bits/weight from HBM anyway.
"""

from __future__ import annotations

import functools as _functools
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
    """y = x @ (q * scale), int8 per-output-channel: q [in, out] int8,
    scale [1, out] fp32 — the scale commutes out of the contraction:
    (x @ q) * scale, and XLA fuses the convert into the dot."""
    y = jnp.dot(x, q.astype(x.dtype), preferred_element_type=jnp.float32)
    return (y * scale.astype(jnp.float32)).astype(x.dtype)


def quantize_int4(
    w: jax.Array, axis: int = 0, group_size: int = 128
) -> Tuple[jax.Array, jax.Array]:
    """Symmetric absmax int4 quantization, group-wise along the contraction
    axis (axis=0): values in [-7, 7], one fp32 scale per (group, out-channel).

    Storage is NIBBLE-PACKED into int8 (two values per byte), INTERLEAVED
    along the zero-padded contraction dim: byte i holds row 2i in its low
    nibble and row 2i+1 in its high nibble. This gives true 4-bit HBM
    footprint without the S4 dtype (whose arrays cannot cross the jit
    boundary on the axon runtime: device_put relayout of tiled S4 recurses,
    measured 2026-08-16), and matches the TPU's native nibble expansion:
    ``pltpu.bitcast(packed, int4)`` restores exactly this row order in
    hardware, which is what the Pallas decode kernel (ops/pallas_int4.py)
    relies on — zero unpack arithmetic.

    Group-wise scales recover most of the accuracy per-channel int4 loses;
    group_size 128 matches the TPU lane width. Returns
    (packed int8 [in_pad/2, out], scale fp32 [in_pad/gs, out]) with
    w ~= (unpack_int4(packed) * per-group scale)[:in].
    """
    assert axis == 0, "group-wise quantization is along the contraction axis"
    assert group_size % 2 == 0
    in_f, out_f = w.shape
    gs = group_size if in_f > group_size else _round_up(in_f, 2)
    in_pad = -(-in_f // gs) * gs
    g = in_pad // gs
    wf = jnp.zeros((in_pad, out_f), jnp.float32).at[:in_f].set(w.astype(jnp.float32))
    wf = wf.reshape(g, gs, out_f)
    absmax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)
    scale = jnp.where(absmax == 0, 1.0, absmax / 7.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int8).reshape(in_pad, out_f)
    lo, hi = q[0::2], q[1::2]
    packed = ((hi << 4) | (lo & 0xF)).astype(jnp.int8)
    return packed, scale.reshape(g, out_f)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Packed int8 [..., P, out] -> int4 values (as int8) [..., 2P, out].

    Interleaved order: out[2i] = low nibble of byte i (sign-extended),
    out[2i+1] = high nibble — the same order pltpu.bitcast(packed, int4)
    produces in hardware. Pure shifts — fuses on the VPU.
    """
    lo = jnp.left_shift(packed, 4) >> 4  # arithmetic shifts sign-extend
    hi = packed >> 4
    shape = (*packed.shape[:-2], 2 * packed.shape[-2], packed.shape[-1])
    return jnp.stack([lo, hi], axis=-2).reshape(shape)  # [..., P, 2, o] interleave


def quant_matmul_int4(x: jax.Array, packed: jax.Array, scale: jax.Array) -> jax.Array:
    """y = x @ dequant(packed, scale) with group-wise scales.

    On TPU, dense decode-shaped calls route to the fused Pallas kernel
    (ops/pallas_int4.py) that reads the packed weights straight from HBM —
    the XLA fallback materializes the unpacked int8, which is 2x the traffic.
    The scales never enter the dot: partial dots per contraction group, then
    the per-(group, out-channel) scales weight the sum.
    """
    in_f = x.shape[-1]
    g = scale.shape[0]
    in_pad = 2 * packed.shape[0]
    gs = in_pad // g
    m = 1
    for d in x.shape[:-1]:
        m *= d
    # decode-shaped calls on TPU: fused kernel, packed weights read once from
    # HBM (the fallback materializes the unpacked weights — 2x+ the traffic).
    # m <= 64: the kernel's per-block VMEM grows with m (pd accumulator is
    # [g, m, block_out] fp32 — at the flagship down_proj m=128 already
    # overflows VMEM), and beyond small batch the weight read amortizes so
    # the dequant-dense fallback is the right tool anyway (prefill is
    # compute-bound). GRASP_INT4_MIN_BYTES=0 (default) deliberately keeps
    # every eligible weight on the kernel: routing small/qkvo matrices to the
    # XLA fallback measured SLOWER (2.01 vs 1.32 ms/tok on the 1.1B decode).
    import os

    min_bytes = int(os.environ.get("GRASP_INT4_MIN_BYTES", "0"))
    if (
        jax.default_backend() == "tpu"
        and gs % 128 == 0
        and m <= 64
        and packed.size >= min_bytes
    ):
        from grasp_tpu.ops.pallas_int4 import pallas_int4_matmul

        return pallas_int4_matmul(x, packed, scale)
    # large-m / CPU fallback: dequantize once, one dense dot (weight read is
    # amortized over m; beats a grouped batched-matmul lowering by a lot)
    xp = x
    if in_pad != in_f:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, in_pad - in_f)]
        xp = jnp.pad(x, pad)
    w = unpack_int4(packed).astype(jnp.float32).reshape(g, gs, -1)
    w = (w * scale[:, None, :].astype(jnp.float32)).reshape(in_pad, -1).astype(x.dtype)
    y = jnp.dot(xp, w, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


@_functools.lru_cache(maxsize=None)
def _quant_jit(bits: int, group_size: int):
    if bits == 8:
        return jax.jit(lambda w: quantize_int8(w, axis=0))
    return jax.jit(lambda w: quantize_int4(w, axis=0, group_size=group_size))


_PRIMED_QUANT_SHAPES: set = set()


def _quantize_kernel(val: jax.Array, bits: int, group_size: int):
    """Quantize one kernel through a primed jit.

    Eager jnp quantization would hit the axon persistent-dispatch-copy trap
    (first dispatch per shape retains a copy of the bf16 kernel — GiBs across
    a 7B quantization) and materialize fp32 intermediates; a jit fuses the
    whole absmax/round/pack chain and priming (lower+compile before dispatch)
    keeps the dispatch cache copy-free. One compile per (shape, dtype, bits).
    """
    fn = _quant_jit(bits, group_size)
    key = (val.shape, str(val.dtype), bits, group_size)
    if key not in _PRIMED_QUANT_SHAPES:
        _PRIMED_QUANT_SHAPES.add(key)
        try:
            fn.lower(val).compile()
        except Exception:  # pragma: no cover - backend-dependent
            pass
    return fn(val)


def quantize_proj(proj: Dict[str, Any], bits: int = 8, group_size: int = 128) -> Dict[str, Any]:
    """Quantize one projection's kernels in place-of (returns new dict)."""
    out: Dict[str, Any] = {}
    for key, val in proj.items():
        if key in _QUANTIZABLE:
            if bits == 8:
                q, scale = _quantize_kernel(val, 8, group_size)
                out[key + "_q"] = q
            elif bits == 4:
                q, scale = _quantize_kernel(val, 4, group_size)
                out[key + "_q4"] = q
            else:
                raise ValueError(f"bits must be 4 or 8, got {bits}")
            out[key + "_scale"] = scale
        else:
            out[key] = val
    return out


def quantize_model_weights(
    params: Params, quantize_lm_head: bool = True, bits: int = 8, group_size: int = 128,
    consume: bool = False,
) -> Params:
    """Quantize every projection kernel (dense + low-rank) to int8 or int4.

    bits=8: per-output-channel absmax (serving default). bits=4: group-wise
    absmax along the contraction dim (group_size per scale) — halves weight
    HBM traffic again; decode roofline ~2x int8. The lm_head (the largest
    per-token weight read at decode) is quantized by default; embeddings and
    norms stay in their original dtype (row-gather / accuracy-sensitive).
    MoE layers quantize their stacked expert tensors per expert.

    consume=True releases each source layer as soon as its quantized copy is
    built (the input pytree is emptied in place). Required at 7B scale on a
    16 GiB chip: the non-consuming path holds bf16 (12.5 GiB) + int8
    (6.3 GiB) trees simultaneously and OOMs; consuming keeps the transient
    overhead to one layer (~0.2 GiB).
    """
    if consume and not isinstance(params.get("layers"), list):
        raise ValueError("consume=True requires a mutable params dict with a list of layers")
    layers = []
    src_layers = params["layers"]
    for li, layer in enumerate(src_layers):
        new_layer = dict(layer)
        groups = [("self_attn", ATTN_PROJS)]
        if "mlp" in layer:
            groups.append(("mlp", MLP_PROJS))
        for group, names in groups:
            new_group = dict(layer[group])
            for name in names:
                new_group[name] = quantize_proj(layer[group][name], bits, group_size)
            new_layer[group] = new_group
        if "moe" in layer:
            ex = layer["moe"]["experts"]
            qex: Dict[str, Any] = {}
            for w, stacked in ex.items():
                if bits == 8:
                    qs = [quantize_int8(stacked[e], axis=0) for e in range(stacked.shape[0])]
                    qex[w + "_q"] = jnp.stack([q for q, _ in qs])
                else:
                    qs = [
                        quantize_int4(stacked[e], axis=0, group_size=group_size)
                        for e in range(stacked.shape[0])
                    ]
                    qex[w + "_q4"] = jnp.stack([q for q, _ in qs])
                qex[w + "_scale"] = jnp.stack([s for _, s in qs])
            new_layer["moe"] = {"gate": layer["moe"]["gate"], "experts": qex}
        layers.append(new_layer)
        if consume:
            # drop every reference to the source layer's big kernels so the
            # runtime frees them before the next layer quantizes
            src_layers[li] = None
            jax.block_until_ready(new_layer)
    out = {**params, "layers": layers}
    if quantize_lm_head and "lm_head" in params:
        out["lm_head"] = quantize_proj(params["lm_head"], bits, group_size)
        if consume:
            params["lm_head"] = None
    if consume:
        params.clear()
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
