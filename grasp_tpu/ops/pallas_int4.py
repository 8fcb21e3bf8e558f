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

# The kernel is CONVERT-bound, not HBM-bound — measured on v5e (2026-08-17,
# idle machine, 4000-call chained slope at 4096x4096):
#   - int4->bf16 nibble expand runs at 1 elem/lane/cycle on the VPU:
#     16.8M elements = 17.4 us, measured 17us via expand-only kernel
#     (DMA+int8-read "touch" 24.6 us monolithic, expand+sum 58.2, expand+dot
#     26.0 — the dot itself is MXU-cheap).
#   - grid pipeline 18.5 us/call (482 GB/s), manual double-buffered DMA
#     18.2 us at 1 MB chunks (490 GB/s): statistically a wash — both sit on
#     the convert floor, so the HBM "819 GB/s roofline" is the wrong bound;
#     the right one is bytes/convert-time = 483 GB/s, and we are at ~100%.
#   - escape routes probed and closed: int8 x int4 MXU dot does not legalize
#     in Mosaic (compile-helper crash); int4->int8->int8-dot still pays the
#     same 1/cycle convert (17.6 us measured). Only W4A8 with a native int4
#     MXU operand would beat this, and the hardware path doesn't exist here.
# Manual-DMA variant kept for A/B (GRASP_INT4_KERNEL=dma, chunk below).
_CHUNK_KB = int(os.environ.get("GRASP_INT4_CHUNK_KB", "1024"))
# kernel selection: "grid" (block pipeline, default — handles every shape),
# "dma" (manual double buffering; TPU + lane-aligned out dims only)
_KERNEL = os.environ.get("GRASP_INT4_KERNEL", "grid")


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


def _dma_kernel(x_ref, p_hbm, s_ref, o_ref, acc, scratch, sems, *,
                n_chunks, gpc, gs, compute_dtype):
    """Single-invocation kernel: packed weight stays in HBM; contiguous
    row-chunks (whole quant groups) are double-buffered into VMEM with
    explicit DMAs so chunk c's dequant+dot overlaps chunk c+1's copy.

    x_ref [g, m, gs] VMEM · p_hbm [p_rows, out] HBM · s_ref [g, 1, out] VMEM
    acc [m, out] fp32 VMEM · scratch [2, rpc, out] int8 VMEM · sems DMA[2]
    """
    rpc = scratch.shape[1]
    out_f = o_ref.shape[-1]

    def chunk_dma(slot, c):
        return pltpu.make_async_copy(
            p_hbm.at[pl.ds(c * rpc, rpc), :], scratch.at[slot], sems.at[slot]
        )

    chunk_dma(0, 0).start()
    acc[:] = jnp.zeros(acc.shape, acc.dtype)

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < n_chunks)
        def _prefetch():
            chunk_dma(jax.lax.rem(c + 1, 2), c + 1).start()

        chunk_dma(slot, c).wait()
        q = _expand_nibbles(scratch[slot], compute_dtype, False)  # [2rpc, out]
        rhs = q.reshape(gpc, gs, out_f)
        xg = x_ref[pl.ds(c * gpc, gpc)]  # [gpc, m, gs]
        dims = (((2,), (1,)), ((0,), (0,)))
        pd = jax.lax.dot_general(xg, rhs, dims, preferred_element_type=jnp.float32)
        sc = s_ref[pl.ds(c * gpc, gpc), 0, :][:, None, :]  # [gpc, 1, out]
        acc[:] += jnp.sum(pd * sc, axis=0)
        return _

    jax.lax.fori_loop(0, n_chunks, body, None)
    o_ref[:] = acc[:].astype(o_ref.dtype)


def _dma_chunking(g, gs, out_f):
    """Pick groups-per-chunk: a divisor of g with chunk bytes near _CHUNK_KB."""
    chunk_kb = int(os.environ.get("GRASP_INT4_CHUNK_KB", str(_CHUNK_KB)))
    bytes_per_group = (gs // 2) * out_f
    want = max(1, (chunk_kb * 1024) // bytes_per_group)
    gpc = min(want, g)
    while g % gpc:
        gpc -= 1
    return gpc, g // gpc


def _int4_matmul_dma(x3, packed, scale3, m, out_f, g, gs, dtype):
    gpc, n_chunks = _dma_chunking(g, gs, out_f)
    rpc = packed.shape[0] // n_chunks
    return pl.pallas_call(
        functools.partial(
            _dma_kernel, n_chunks=n_chunks, gpc=gpc, gs=gs, compute_dtype=dtype
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; DMA'd manually
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, out_f), dtype),
        scratch_shapes=[
            pltpu.VMEM((m, out_f), jnp.float32),
            pltpu.VMEM((2, rpc, out_f), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(x3, packed, scale3)


@functools.partial(jax.jit, static_argnames=("interpret", "kernel"))
def pallas_int4_matmul(
    x: jax.Array,
    packed: jax.Array,
    scale: jax.Array,
    interpret: bool = False,
    kernel: str | None = None,
) -> jax.Array:
    """y = x @ dequant(packed, scale); x [..., in], interleaved nibble-packed
    int8 [in_pad/2, out], scale [g, out] fp32. Returns [..., out] in x.dtype.

    kernel: "dma" (manual double-buffered DMA; TPU + lane-aligned out only)
    or "grid" (block pipeline); default GRASP_INT4_KERNEL env, "grid"."""
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

    if (
        not interpret
        and (kernel or _KERNEL) == "dma"
        and out_f % 128 == 0
        and jax.default_backend() == "tpu"
    ):
        out = _int4_matmul_dma(x3, packed, scale[:, None, :], m, out_f, g, gs, x.dtype)
        return out.reshape(*lead, out_f)

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
