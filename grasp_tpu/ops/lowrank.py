"""Projection apply functions: dense, full-SVD (trainable S), and low-rank.

These are the forward kernels behind every q/k/v/o/gate/up/down projection.
TPU-native design notes:

- The reference's GRASPLayer reconstructs the dense W = U diag(S) Vh on every
  forward (modeling_grasp.py:75-79) — an O(out*r*in) matmul per call just to
  keep S in the autograd graph. We instead compute
  ``y = ((x @ Vh^T) * S) @ U^T`` which never materializes W, has identical
  gradients w.r.t. S, and is two MXU matmuls + one VPU row-scale.

- The compiled low-rank module is ``y = (x @ in_kernel) @ out_kernel`` —
  the reference's SVDLinear two-Linear chain (modeling_grasp.py:57-59) with
  the kernels pre-transposed at compile time so runtime is transpose-free.

XLA fuses the scale into the matmul epilogue; an optional fused Pallas kernel
for the low-rank pair lives in grasp_tpu.ops.pallas_lowrank and is used for
shapes where it wins (see that module's benchmarks).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def dense_apply(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ kernel (+ bias); kernel is [in, out] (JAX layout)."""
    y = jnp.dot(x, kernel, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    return y


def svd_apply(
    x: jax.Array,
    u: jax.Array,
    s: jax.Array,
    vh: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Full-SVD projection with trainable S: y = ((x @ Vh^T) * S) @ U^T.

    Mathematically identical (incl. dL/dS) to the reference's explicit
    reconstruction x @ (U diag(S) Vh)^T at modeling_grasp.py:75-79.
    U: [out, r], S: [r], Vh: [r, in].
    """
    h = jnp.dot(x, vh.T, preferred_element_type=x.dtype)
    h = h * s.astype(h.dtype)
    y = jnp.dot(h, u.T, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    return y


def lowrank_apply(
    x: jax.Array,
    in_kernel: jax.Array,
    out_kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> jax.Array:
    """Compiled low-rank projection: y = (x @ in_kernel) @ out_kernel (+ bias).

    in_kernel: [in, r], out_kernel: [r, out] (sigma already fused — see
    grasp_tpu.ops.svd.lowrank_factors). Equivalent to reference SVDLinear
    forward (modeling_grasp.py:57-59).

    use_pallas=True routes big-batch calls through the fused VMEM-resident
    Pallas kernel (grasp_tpu.ops.pallas_lowrank) — measured ~16% faster than
    XLA's two dots at GRASP shapes on v5e; decode-sized calls (few rows) stay
    on XLA where tile padding would dominate.
    """
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if use_pallas and rows >= 256 and jax.default_backend() != "cpu":
        from grasp_tpu.ops.pallas_lowrank import fused_lowrank

        y = fused_lowrank(x, in_kernel, out_kernel)
    else:
        h = jnp.dot(x, in_kernel, preferred_element_type=x.dtype)
        y = jnp.dot(h, out_kernel, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    return y
