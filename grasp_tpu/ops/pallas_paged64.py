"""Paged-attention decode kernel for head_dim < 128 (TPU Pallas).

jax's fused paged-attention kernel requires lane-aligned head_dim
(probed on v5e: hd=64 fails Mosaic block-shape checks for every head
combination — CLAUDE.md), so TinyLlama-class models (hd=64) fall back to the
XLA gather path, which materializes a [B, nkv, T, hd] copy of the live KV —
~2x the KV HBM traffic decode should cost. This kernel closes that gap for
hd=64: pages are read IN PLACE (the page table is a scalar-prefetch operand
driving the k/v BlockSpec index maps), and the softmax runs online
(flash-style m/l/acc scratch carried across a sequence's page steps), so KV
bytes are touched exactly once.

Scope: single-query decode (q_len 1), fp pages (the int8 pool path keeps the
gather fallback), GQA folded as [nkv, gqa] query groups. Grid is
(batch, pages_per_seq) — sequential on TPU, so scratch carries across the
page axis; each sequence's output lands at its last page step.

Correctness gate: bit-equal (fp tolerance) to the XLA gather path on random
pools/tables/lengths — tests/test_pallas.py::test_paged64_* (TPU-gated,
interpret-mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tables_ref, lengths_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref, *, page_size, gqa, scale):
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nkv, ps, hd = k_ref.shape[0], k_ref.shape[2], k_ref.shape[3]
    k = k_ref[:, 0]                    # [nkv, ps, hd]
    v = v_ref[:, 0]
    q = q_ref[0]                       # [nh, hd]
    qg = q.reshape(nkv, gqa, hd)

    # scores [nkv, gqa, ps] — contract hd
    s = jax.lax.dot_general(
        qg.astype(jnp.float32), k.astype(jnp.float32),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale

    # mask: absolute slot index vs this sequence's live length
    length = lengths_ref[b]
    slot = p * page_size + jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps), 2)
    s = jnp.where(slot < length, s, -jnp.inf)

    # online softmax update
    m_prev = m_ref[...]                          # [nkv, gqa, 1]
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)   # [nkv, gqa, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    # fully-masked pages produce -inf maxima; keep the math NaN-free
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p_exp = jnp.exp(s - m_safe)                  # [nkv, gqa, ps]
    p_exp = jnp.where(jnp.isfinite(s), p_exp, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)

    l_new = alpha * l_prev + jnp.sum(p_exp, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p_exp, v.astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                            # [nkv, gqa, hd]
    acc_new = alpha[..., 0][..., None] * acc_ref[...] + pv

    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc_new

    @pl.when(p == n_pages - 1)
    def _emit():
        out = acc_new / jnp.maximum(l_new, 1e-30)
        o_ref[0] = out.reshape(nkv * gqa, hd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def paged_attention_hd64(
    q: jax.Array,          # [B, nh, hd] (UNscaled)
    k_pages: jax.Array,    # [nkv, P, ps, hd]
    v_pages: jax.Array,
    lengths: jax.Array,    # [B] int32 — live tokens incl. the one this step
    tables: jax.Array,     # [B, pages_per_seq] int32 physical page ids
    interpret: bool = False,
    scale: float = None,   # score scale; default head_dim**-0.5
) -> jax.Array:
    """Decode paged attention for sub-lane head dims. Returns [B, nh, hd]."""
    b, nh, hd = q.shape
    nkv, num_pages, ps, _ = k_pages.shape
    pages_per_seq = tables.shape[1]
    gqa = nh // nkv
    if scale is None:
        scale = 1.0 / np.sqrt(hd)

    grid = (b, pages_per_seq)

    def q_map(bi, pi, tables_ref, lengths_ref):
        return (bi, 0, 0)

    def kv_map(bi, pi, tables_ref, lengths_ref):
        return (0, tables_ref[bi, pi], 0, 0)

    def o_map(bi, pi, tables_ref, lengths_ref):
        return (bi, 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel, page_size=ps, gqa=gqa, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, nh, hd), q_map),
                pl.BlockSpec((nkv, 1, ps, hd), kv_map),
                pl.BlockSpec((nkv, 1, ps, hd), kv_map),
            ],
            out_specs=pl.BlockSpec((1, nh, hd), o_map),
            scratch_shapes=[
                pltpu.VMEM((nkv, gqa, 1), jnp.float32),
                pltpu.VMEM((nkv, gqa, 1), jnp.float32),
                pltpu.VMEM((nkv, gqa, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nh, hd), q.dtype),
        interpret=interpret,
    )(tables.astype(jnp.int32), lengths.astype(jnp.int32), q, k_pages, v_pages)
    return out


# ---------------------------------------------------------------------------
# Multi-query (chunk) variant — speculative verification.
#
# The speculative target verifies gamma+1 positions per row in one forward;
# for greedy speculation to emit the EXACT stream the plain engine would,
# every verified position's logits must be bit-identical to what the plain
# single-token decode computes, which means the verify attention must use the
# SAME kernel with the same per-row reduction order. This variant folds the
# chunk axis into the query-group rows: each (kv head, chunk, gqa) row runs
# the identical per-page online-softmax update the single-query kernel runs
# (same dot shapes, same max/exp/sum order over the same page sequence), so
# per-row outputs are bit-equal to C separate single-query calls — pinned by
# tests/test_paged_serving.py::test_paged64_chunk_matches_single_query.
# Causality: chunk query c (0-based) sees slots < base_length + c.
# ---------------------------------------------------------------------------


def _kernel_chunk(tables_ref, base_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, page_size, gqa, scale):
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_pages = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    nkv, ps = k_ref.shape[0], k_ref.shape[2]
    k = k_ref[:, 0]                    # [nkv, ps, hd]
    v = v_ref[:, 0]
    qg = q_ref[0]                      # [nkv, R, hd], row j = c*gqa + g

    s = jax.lax.dot_general(
        qg.astype(jnp.float32), k.astype(jnp.float32),
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                          # [nkv, R, ps]

    # per-row causal length: row j belongs to chunk position c = j // gqa and
    # sees slots < base + c (base = live length incl. the chunk's first token)
    base = base_ref[b]
    r = s.shape[1]
    slot = p * page_size + jax.lax.broadcasted_iota(jnp.int32, (1, r, ps), 2)
    row_c = jax.lax.broadcasted_iota(jnp.int32, (1, r, ps), 1) // gqa
    s = jnp.where(slot < base + row_c, s, -jnp.inf)

    m_prev = m_ref[...]                          # [nkv, R, 1]
    l_prev = l_ref[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p_exp = jnp.exp(s - m_safe)
    p_exp = jnp.where(jnp.isfinite(s), p_exp, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)

    l_new = alpha * l_prev + jnp.sum(p_exp, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p_exp, v.astype(jnp.float32),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    acc_new = alpha[..., 0][..., None] * acc_ref[...] + pv

    m_ref[...] = m_new
    l_ref[...] = l_new
    acc_ref[...] = acc_new

    @pl.when(p == n_pages - 1)
    def _emit():
        o_ref[0] = (acc_new / jnp.maximum(l_new, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "scale"))
def paged_attention_hd64_chunk(
    q: jax.Array,           # [B, C, nh, hd] (UNscaled), C = chunk length
    k_pages: jax.Array,     # [nkv, P, ps, hd]
    v_pages: jax.Array,
    base_lengths: jax.Array,  # [B] int32 — live tokens incl. chunk token 0
    tables: jax.Array,      # [B, pages_per_seq] int32
    interpret: bool = False,
    scale: float = None,    # score scale; default head_dim**-0.5
) -> jax.Array:
    """Chunked paged attention for sub-lane head dims. Returns [B, C, nh, hd];
    row (b, c) is bit-equal to paged_attention_hd64 at length base+c."""
    b, c_len, nh, hd = q.shape
    nkv, num_pages, ps, _ = k_pages.shape
    pages_per_seq = tables.shape[1]
    gqa = nh // nkv
    r = c_len * gqa
    if scale is None:
        scale = 1.0 / np.sqrt(hd)

    # [B, C, nkv, gqa, hd] -> [B, nkv, C*gqa, hd] with row j = c*gqa + g
    qr = q.reshape(b, c_len, nkv, gqa, hd).transpose(0, 2, 1, 3, 4)
    qr = qr.reshape(b, nkv, r, hd)

    grid = (b, pages_per_seq)

    def q_map(bi, pi, tables_ref, base_ref):
        return (bi, 0, 0, 0)

    def kv_map(bi, pi, tables_ref, base_ref):
        return (0, tables_ref[bi, pi], 0, 0)

    out = pl.pallas_call(
        functools.partial(_kernel_chunk, page_size=ps, gqa=gqa, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, nkv, r, hd), q_map),
                pl.BlockSpec((nkv, 1, ps, hd), kv_map),
                pl.BlockSpec((nkv, 1, ps, hd), kv_map),
            ],
            out_specs=pl.BlockSpec((1, nkv, r, hd), q_map),
            scratch_shapes=[
                pltpu.VMEM((nkv, r, 1), jnp.float32),
                pltpu.VMEM((nkv, r, 1), jnp.float32),
                pltpu.VMEM((nkv, r, hd), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, nkv, r, hd), q.dtype),
        interpret=interpret,
    )(tables.astype(jnp.int32), base_lengths.astype(jnp.int32), qr,
      k_pages, v_pages)
    out = out.reshape(b, nkv, c_len, gqa, hd).transpose(0, 2, 1, 3, 4)
    return out.reshape(b, c_len, nh, hd)
