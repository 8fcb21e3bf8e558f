"""Fused low-rank projection kernel (Pallas/TPU).

The compiled GRASP module computes ``y = (x @ A) @ B`` with a small rank
r = in*out*(1-ratio)/(in+out) (reference SVDLinear's two nn.Linears,
modeling_grasp.py:57-59). Two separate XLA dots round-trip the intermediate
``h = x @ A`` ([tokens, r]) through HBM; this kernel keeps ``h`` in VMEM
scratch and streams only x/B tiles:

  grid (i over token tiles, j over output tiles), j minor:
    j == 0:  h_scratch = x_tile @ A            (A resident in VMEM across j)
    all j:   y_tile    = h_scratch @ B_tile    (fp32 MXU accumulation)

The rank dimension is zero-padded to a 128 multiple at call time (exact —
padded columns contribute 0). Backward pass is standard XLA (custom_vjp):
the fusion matters for inference/serving, while training still gets correct
gradients for A and B (recovery fine-tuning trains these factors).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, a_ref, b_ref, y_ref, h_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        h_ref[:] = jnp.dot(x_ref[:], a_ref[:], preferred_element_type=jnp.float32)

    y_ref[:] = jnp.dot(
        h_ref[:].astype(x_ref.dtype), b_ref[:], preferred_element_type=jnp.float32
    ).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_n"))
def _fused_fwd(x2d: jax.Array, a: jax.Array, b: jax.Array, tile_m: int = 256, tile_n: int = 512):
    m, k = x2d.shape
    r = a.shape[1]
    n = b.shape[1]
    r_pad = _round_up(r, 128)
    m_pad = _round_up(m, tile_m)
    n_pad = _round_up(n, tile_n)

    if r_pad != r:
        a = jnp.pad(a, ((0, 0), (0, r_pad - r)))
        b = jnp.pad(b, ((0, r_pad - r), (0, 0)))
    if m_pad != m:
        x2d = jnp.pad(x2d, ((0, m_pad - m), (0, 0)))
    if n_pad != n:
        b = jnp.pad(b, ((0, 0), (0, n_pad - n)))

    grid = (m_pad // tile_m, n_pad // tile_n)
    y = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, r_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_pad, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), x2d.dtype),
        scratch_shapes=[pltpu.VMEM((tile_m, r_pad), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * k * r_pad + 2 * m_pad * r_pad * n_pad,
            bytes_accessed=(m_pad * k + k * r_pad + r_pad * n_pad + m_pad * n_pad) * x2d.dtype.itemsize,
            transcendentals=0,
        ),
    )(x2d, a, b)
    return y[:m, :n]


@jax.custom_vjp
def fused_lowrank(x: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """y = (x @ a) @ b with the intermediate kept in VMEM. x: [..., K]."""
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    y = _fused_fwd(x2d, a, b)
    return y.reshape(*lead, b.shape[1])


def _fwd(x, a, b):
    return fused_lowrank(x, a, b), (x, a, b)


def _bwd(res, g):
    x, a, b = res
    lead = x.shape[:-1]
    x2d = x.reshape(-1, x.shape[-1])
    g2d = g.reshape(-1, g.shape[-1])
    h = jnp.dot(x2d, a, preferred_element_type=jnp.float32)
    gh = jnp.dot(g2d, b.T, preferred_element_type=jnp.float32)
    dx = jnp.dot(gh.astype(x.dtype), a.T, preferred_element_type=jnp.float32).astype(x.dtype)
    da = jnp.dot(x2d.T, gh.astype(x.dtype), preferred_element_type=jnp.float32).astype(a.dtype)
    db = jnp.dot(h.astype(x.dtype).T, g2d, preferred_element_type=jnp.float32).astype(b.dtype)
    return dx.reshape(*lead, x.shape[-1]), da, db


fused_lowrank.defvjp(_fwd, _bwd)
