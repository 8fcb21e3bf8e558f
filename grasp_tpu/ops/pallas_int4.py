"""Fused nibble-packed int4 matmul (TPU Pallas) for serving decode.

Decode is HBM-bandwidth-bound: the weight read dominates. XLA cannot fuse the
nibble unpack into a dot (dots read materialized operands), so the fallback in
ops/quant.quant_matmul_int4 materializes the unpacked weights — 2x+ the
traffic int4 should cost, and its grouped batched-matmul lowering measured
17.3 ms/tok on the 1.1B flagship vs the 0.78 ms int4 roofline. This kernel
reads the PACKED int8 straight from HBM and expands nibbles in hardware.

Layout contract (ops/quant.quantize_int4): contraction dim zero-padded to a
``gs`` multiple; byte i holds row 2i (low nibble) and row 2i+1 (high nibble)
— exactly the row order the TPU's native nibble expansion
``pltpu.bitcast(packed, int4)`` produces (probed on v5e: Mosaic legalizes the
bitcast + int4→float convert natively, while ``arith.shli`` on int8 vectors
does not legalize at all). The dequant is therefore a single hardware convert;
the per-(group, channel) scales never touch the [in, out] weight tile — they
weight the per-group dot results ([g, m, bo] elements, gs x fewer):

    y[:, ob] = sum_g (x_g @ nibble_expand(packed)_g) * scale[g]

Single-pass grid over out-blocks only (no reduction axis, no accumulator):
the full contraction dim lives in VMEM per step (worst flagship case
5632x256 int8 = 1.4 MB packed), keeping the grid tiny (8-125 steps) so DMA
stays saturated instead of grid-overhead-bound.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512 measured best on v5e (1.319 ms/tok vs 1.432 at 256 on the 1.1B decode;
# 2 MB packed + ~6 MB VMEM dequant temporaries at the worst 5632-contraction)
_BLOCK_OUT = int(os.environ.get("GRASP_INT4_BO", "512"))


def _expand_nibbles(p, compute_dtype, interpret):
    """[P, bo] packed int8 -> [2P, bo] values in compute_dtype."""
    if not interpret:
        return pltpu.bitcast(p, jnp.int4).astype(compute_dtype)
    # interpret mode (CPU tests): pltpu.bitcast int8->int4 is TPU-only; the
    # XLA unpack produces the identical interleaved layout
    from grasp_tpu.ops.quant import unpack_int4

    return unpack_int4(p).astype(compute_dtype)


def _kernel(x_ref, p_ref, s_ref, o_ref, *, groups, gs, compute_dtype, interpret):
    bo = p_ref.shape[-1]
    q = _expand_nibbles(p_ref[:], compute_dtype, interpret)  # [in_pad, bo]
    rhs = q.reshape(groups, gs, bo)
    # batched per-group dots: [g, m, gs] x [g, gs, bo] -> [g, m, bo]
    dims = (((2,), (1,)), ((0,), (0,)))
    pd = jax.lax.dot_general(x_ref[:], rhs, dims, preferred_element_type=jnp.float32)
    sc = s_ref[:, 0, :][:, None, :]  # [g, 1, bo] fp32
    o_ref[:] = jnp.sum(pd * sc, axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_int4_matmul(
    x: jax.Array, packed: jax.Array, scale: jax.Array, interpret: bool = False
) -> jax.Array:
    """y = x @ dequant(packed, scale); x [..., in], interleaved nibble-packed
    int8 [in_pad/2, out], scale [g, out] fp32. Returns [..., out] in x.dtype."""
    lead = x.shape[:-1]
    in_f = x.shape[-1]
    p_rows, out_f = packed.shape
    g = scale.shape[0]
    in_pad = 2 * p_rows
    gs = in_pad // g
    m = 1
    for d in lead:
        m *= d

    xm = x.reshape(m, in_f)
    if in_pad != in_f:  # quantize-time zero pad rows contribute nothing
        xm = jnp.pad(xm, ((0, 0), (0, in_pad - in_f)))
    x3 = xm.reshape(m, g, gs).transpose(1, 0, 2)  # [g, m, gs] per-group batch

    bo = min(_BLOCK_OUT, out_f)
    n_ob = -(-out_f // bo)

    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=g, gs=gs, compute_dtype=x.dtype, interpret=interpret
        ),
        grid=(n_ob,),
        in_specs=[
            pl.BlockSpec((g, m, gs), lambda ob: (0, 0, 0)),
            pl.BlockSpec((p_rows, bo), lambda ob: (0, ob)),
            # scale as [g, 1, bo]: a sublane dim of 1 must equal the full
            # array dim to satisfy TPU block tiling
            pl.BlockSpec((g, 1, bo), lambda ob: (0, 0, ob)),
        ],
        out_specs=pl.BlockSpec((m, bo), lambda ob: (0, ob)),
        out_shape=jax.ShapeDtypeStruct((m, out_f), x.dtype),
        interpret=interpret,
    )(x3, packed, scale[:, None, :])
    return out.reshape(*lead, out_f)
