"""Flash attention (Pallas/TPU) for the full-sequence (prefill/calibration)
path.

Causal online-softmax attention that never materializes the [S, S] scores
matrix (the XLA fallback in models.llama._attention does): KV is streamed in
tiles with running (m, l, acc) statistics held in VMEM scratch, and entire KV
tiles above the causal diagonal are skipped. GQA is handled in the kernel's
BlockSpec index maps (kv head = q head // group) — no materialized KV repeat.

Forward-only kernel; gradients recompute through the XLA reference
implementation via custom_vjp (the calibration grad sweep's memory is bounded
by remat at the layer level, so a bespoke backward kernel is not on the
critical path yet).

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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, sm_scale, block_q, block_k, kv_tiles):
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    num_kv_groups: int = 1, sm_scale: Optional[float] = None) -> jax.Array:
    """Causal flash attention. q: [B, nh, S, hd]; k/v: [B, nkv, S, hd]."""
    return _flash_fwd_impl(q, k, v, num_kv_groups, sm_scale)


def _flash_fwd_impl(q, k, v, num_kv_groups, sm_scale, block_q=256, block_k=256):
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

    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=scale, block_q=block_q, block_k=block_k, kv_tiles=kv_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), q_map),
            pl.BlockSpec((1, block_k, hd), kv_map),
            pl.BlockSpec((1, block_k, hd), kv_map),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), q_map),
        out_shape=jax.ShapeDtypeStruct((b * nh, s_pad, hd), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, hd), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q4, k4, v4)

    return out.reshape(b, nh, s_pad, hd)[:, :, :s, :]


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


def _fwd(q, k, v, num_kv_groups, sm_scale):
    return _flash_fwd_impl(q, k, v, num_kv_groups, sm_scale), (q, k, v)


def _bwd(num_kv_groups, sm_scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_reference(q_, k_, v_, num_kv_groups, sm_scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
