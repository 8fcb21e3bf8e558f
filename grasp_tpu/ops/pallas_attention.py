"""Flash attention (Pallas/TPU) for the full-sequence (prefill/calibration)
path.

Causal online-softmax attention that never materializes the [S, S] scores
matrix (the XLA fallback in models.llama._attention does): KV is streamed in
tiles with running (m, l, acc) statistics held in VMEM scratch, and entire KV
tiles above the causal diagonal are skipped. GQA is handled in the kernel's
BlockSpec index maps (kv head = q head // group) — no materialized KV repeat.

Backward: custom_vjp with dedicated dKV and dQ Pallas kernels over saved
(o, m, l) residuals — p is recomputed tile-by-tile from the softmax
statistics, ds = p*(do·vᵀ − di) with di = Σ o·do precomputed once, so the
[S, S] scores matrix is never materialized in the backward either
(fwd+bwd measured 15% faster than XLA at 4k seq with O(S) memory; grads match
XLA within the 2e-2 rel fp32 gate enforced by the tests - measured ~6e-3,
MXU-pass rounding). TPU-only: the CPU path in models.llama never routes here.

Used when ModelConfig.use_flash_attention is set, there is no padding mask,
and q/k cover the same full sequence (self-attention without cache).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

# single source of block sizes: the backward reuses the forward residuals
# (m, l), whose padded length is derived from these. Env-tunable for block
# sweeps (scripts/sweep_flash_blocks.py); 256/256 measured best at 4k on v5e.
import os as _os

_BLOCK_Q = int(_os.environ.get("GRASP_FLASH_BQ", "256"))
_BLOCK_K = int(_os.environ.get("GRASP_FLASH_BK", "256"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, m_out_ref, l_out_ref, m_ref, l_ref, acc_ref,
            *, sm_scale, block_q, block_k, kv_tiles):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    # skip KV tiles entirely above the causal diagonal
    should_run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0]  # [block_q, hd]
        k = k_ref[0]  # [block_k, hd]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k]
        s = s * sm_scale

        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
        s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)

        m_prev, l_prev = m_ref[:], l_ref[:]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:], l_ref[:] = m_next, l_next

        v = v_ref[0]  # [block_k, hd]
        acc_ref[:] = acc_ref[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(ki == kv_tiles - 1)
    def _store():
        l = l_ref[:]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[:] * l_inv).astype(o_ref.dtype)
        # residuals for the backward pass (per q row)
        m_out_ref[:] = m_ref[:].reshape(1, -1, 1)
        l_out_ref[:] = l_ref[:].reshape(1, -1, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_kv_groups: int = 1, sm_scale: Optional[float] = None) -> jax.Array:
    """Causal flash attention. q: [B, nh, S, hd]; k/v: [B, nkv, S, hd]."""
    out, _, _, _ = _flash_fwd_impl(q, k, v, num_kv_groups, sm_scale)
    return out


def _flash_fwd_impl(q, k, v, num_kv_groups, sm_scale, block_q=_BLOCK_Q, block_k=_BLOCK_K):
    b, nh, s, hd = q.shape
    nkv = k.shape[1]
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(hd)

    s_pad = _round_up(s, max(block_q, block_k))
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    q_tiles = s_pad // block_q
    kv_tiles = s_pad // block_k
    grid = (b * nh, q_tiles, kv_tiles)

    q4 = q.reshape(b * nh, s_pad, hd)
    k4 = k.reshape(b * nkv, s_pad, hd)
    v4 = v.reshape(b * nkv, s_pad, hd)

    def q_map(bh, qi, ki):
        return (bh, qi, 0)

    def kv_map(bh, qi, ki):
        # GQA: q head bh -> kv row (batch * nkv + (head // groups))
        batch = bh // nh
        head = bh % nh
        return (batch * nkv + head // num_kv_groups, ki, 0)

    def row_map(bh, qi, ki):
        return (bh, qi, 0)

    out, m_res, l_res = pl.pallas_call(
        functools.partial(_kernel, sm_scale=scale, block_q=block_q, block_k=block_k, kv_tiles=kv_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), q_map),
            pl.BlockSpec((1, block_k, hd), kv_map),
            pl.BlockSpec((1, block_k, hd), kv_map),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), q_map),
            pl.BlockSpec((1, block_q, 1), row_map),
            pl.BlockSpec((1, block_q, 1), row_map),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * nh, s_pad, hd), q.dtype),
            jax.ShapeDtypeStruct((b * nh, s_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((b * nh, s_pad, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q4, k4, v4)

    out = out.reshape(b, nh, s_pad, hd)[:, :, :s, :]
    return out, m_res, l_res, s_pad


def _xla_reference(q, k, v, num_kv_groups, sm_scale):
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(q.shape[-1])
    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=1)
        v = jnp.repeat(v, num_kv_groups, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    qlen, klen = s.shape[-2], s.shape[-1]
    mask = jnp.arange(klen)[None, :] <= jnp.arange(qlen)[:, None]
    s = jnp.where(mask[None, None], s, DEFAULT_MASK_VALUE)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v, preferred_element_type=q.dtype)


# ---------------------------------------------------------------------------
# backward: dKV and dQ Pallas kernels over saved (o, m, l) residuals
# (pattern per jax.experimental.pallas.ops.tpu flash attention; simplified
# single-level tiling to match the forward). GQA is handled kernel-side like
# the forward: KV stays unexpanded, q heads map onto kv heads via index maps,
# and the dKV kernel sums each group's contributions in its VMEM accumulator.
# ---------------------------------------------------------------------------


def _softmax_residual_terms(q, k, v, do, m, l, di, qi, block_q, block_k, ki, sm_scale):
    """Shared p / ds recomputation for both backward kernels."""
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0) + qi * block_q
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + ki * block_k
    causal = col <= row
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    p = jnp.where(causal, jnp.exp(s - m) * l_inv, 0.0)  # [bq, bk]
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [bq, bk]
    ds = p * (dp - di) * sm_scale
    return p, ds


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
                dk_ref, dv_ref, dk_acc, dv_acc,
                *, sm_scale, block_q, block_k, q_tiles, groups):
    ki = pl.program_id(1)
    inner = pl.program_id(2)          # iterates groups * q_tiles
    qi = inner % q_tiles

    @pl.when(inner == 0)
    def _init():
        dk_acc[:] = jnp.zeros(dk_acc.shape, jnp.float32)
        dv_acc[:] = jnp.zeros(dv_acc.shape, jnp.float32)

    # q tile contributes iff its bottom row reaches the kv tile's first column
    should_run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        do = do_ref[0]
        p, ds = _softmax_residual_terms(
            q, k_ref[0], v_ref[0], do,
            m_ref[0].reshape(block_q, 1), l_ref[0].reshape(block_q, 1),
            di_ref[0].reshape(block_q, 1), qi, block_q, block_k, ki, sm_scale,
        )
        dv_acc[:] += jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)  # [bk, hd]
        dk_acc[:] += jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)  # [bk, hd]

    @pl.when(inner == groups * q_tiles - 1)
    def _store():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, do_ref, m_ref, l_ref, di_ref,
               dq_ref, dq_acc, *, sm_scale, block_q, block_k, kv_tiles):
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros(dq_acc.shape, jnp.float32)

    should_run = (qi + 1) * block_q - 1 >= ki * block_k

    @pl.when(should_run)
    def _run():
        k = k_ref[0]
        _, ds = _softmax_residual_terms(
            q_ref[0], k, v_ref[0], do_ref[0],
            m_ref[0].reshape(block_q, 1), l_ref[0].reshape(block_q, 1),
            di_ref[0].reshape(block_q, 1), qi, block_q, block_k, ki, sm_scale,
        )
        dq_acc[:] += jnp.dot(ds.astype(k.dtype), k, preferred_element_type=jnp.float32)

    @pl.when(ki == kv_tiles - 1)
    def _store():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_impl(q, k, v, o, m_res, l_res, g, num_kv_groups, sm_scale):
    """dq [B, nh, S, hd]; dk/dv [B, nkv, S, hd] — KV never expanded."""
    b, nh, s, hd = q.shape
    nkv = k.shape[1]
    groups = num_kv_groups
    block_q, block_k = _BLOCK_Q, _BLOCK_K
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(hd)
    s_pad = _round_up(s, max(block_q, block_k))

    di = jnp.sum(o.astype(jnp.float32) * g.astype(jnp.float32), axis=-1)  # [b, nh, s]
    if s_pad != s:
        pad4 = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        g = jnp.pad(g, pad4)
        di = jnp.pad(di, ((0, 0), (0, 0), (0, s_pad - s)))

    q4 = q.reshape(b * nh, s_pad, hd)
    k4 = k.reshape(b * nkv, s_pad, hd)
    v4 = v.reshape(b * nkv, s_pad, hd)
    g4 = g.reshape(b * nh, s_pad, hd)
    di3 = di.reshape(b * nh, s_pad, 1)
    q_tiles = s_pad // block_q
    kv_tiles = s_pad // block_k

    # ---- dKV: grid over kv heads; inner dim sweeps (group member, q tile) ----
    def q_row_dkv(bhkv, ki, inner):
        # q head for this kv head and group member (matches the forward's
        # head // groups mapping: q heads [kv*groups, (kv+1)*groups))
        batch = bhkv // nkv
        kv_head = bhkv % nkv
        return (batch * nh + kv_head * groups + inner // q_tiles, inner % q_tiles, 0)

    def kv_row_dkv(bhkv, ki, inner):
        return (bhkv, ki, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sm_scale=scale, block_q=block_q, block_k=block_k,
                          q_tiles=q_tiles, groups=groups),
        grid=(b * nkv, kv_tiles, groups * q_tiles),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), q_row_dkv),      # q
            pl.BlockSpec((1, block_k, hd), kv_row_dkv),     # k
            pl.BlockSpec((1, block_k, hd), kv_row_dkv),     # v
            pl.BlockSpec((1, block_q, hd), q_row_dkv),      # do
            pl.BlockSpec((1, block_q, 1), q_row_dkv),       # m
            pl.BlockSpec((1, block_q, 1), q_row_dkv),       # l
            pl.BlockSpec((1, block_q, 1), q_row_dkv),       # di
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, hd), kv_row_dkv),
            pl.BlockSpec((1, block_k, hd), kv_row_dkv),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * nkv, s_pad, hd), k.dtype),
            jax.ShapeDtypeStruct((b * nkv, s_pad, hd), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, hd), jnp.float32),
            pltpu.VMEM((block_k, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q4, k4, v4, g4, m_res, l_res, di3)

    # ---- dQ: grid over q heads; kv tiles via the forward's GQA index map ----
    def q_row_dq(bh, qi, ki):
        return (bh, qi, 0)

    def kv_row_dq(bh, qi, ki):
        batch = bh // nh
        head = bh % nh
        return (batch * nkv + head // groups, ki, 0)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, sm_scale=scale, block_q=block_q, block_k=block_k,
                          kv_tiles=kv_tiles),
        grid=(b * nh, q_tiles, kv_tiles),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), q_row_dq),
            pl.BlockSpec((1, block_k, hd), kv_row_dq),
            pl.BlockSpec((1, block_k, hd), kv_row_dq),
            pl.BlockSpec((1, block_q, hd), q_row_dq),
            pl.BlockSpec((1, block_q, 1), q_row_dq),
            pl.BlockSpec((1, block_q, 1), q_row_dq),
            pl.BlockSpec((1, block_q, 1), q_row_dq),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), q_row_dq),
        out_shape=jax.ShapeDtypeStruct((b * nh, s_pad, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, hd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q4, k4, v4, g4, m_res, l_res, di3)

    dq = dq.reshape(b, nh, s_pad, hd)[:, :, :s]
    dk = dk.reshape(b, nkv, s_pad, hd)[:, :, :s]
    dv = dv.reshape(b, nkv, s_pad, hd)[:, :, :s]
    return dq, dk, dv


def _fwd(q, k, v, num_kv_groups, sm_scale):
    out, m_res, l_res, _ = _flash_fwd_impl(q, k, v, num_kv_groups, sm_scale)
    return out, (q, k, v, out, m_res, l_res)


def _bwd(num_kv_groups, sm_scale, res, g):
    q, k, v, o, m_res, l_res = res
    return _flash_bwd_impl(q, k, v, o, m_res, l_res, g, num_kv_groups, sm_scale)


flash_attention.defvjp(_fwd, _bwd)
