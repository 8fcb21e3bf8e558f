"""Ring attention — context parallelism over the device mesh.

The reference has no long-context parallelism (SURVEY.md §5: LongBench prompts
are simply truncated). This module adds the TPU-native upgrade: the sequence
dimension is sharded over a mesh axis, each device holds one contiguous
Q/K/V block, and KV blocks rotate around the ring via ``jax.lax.ppermute``
while an online softmax accumulates — attention over the FULL sequence with
O(S/n) activation memory per device and compute/communication overlap left to
XLA's async collectives.

Causality is handled by absolute positions: rotation step i brings device
``(idx - i) mod n``'s KV block; entire blocks strictly above the diagonal
contribute nothing (their contribution is masked, and XLA's masked exp(-big)
path keeps numerics clean).

Usable standalone via :func:`ring_attention` (inside shard_map) or through
:func:`context_parallel_attention` which wraps shard_map over a mesh axis.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    causal: bool = True,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
) -> jax.Array:
    """Attention over a sequence sharded on `axis_name` (call inside shard_map).

    q, k, v: local blocks [B, H, S_local, D]; device i holds sequence block i.
    Returns the local output block [B, H, S_local, D].

    window: sliding attention (Mistral/Gemma-2) — query i sees keys
    (i-window, i], applied blockwise from the absolute positions.
    softcap: Gemma-2 attention logit cap c*tanh(s/c), applied after the
    scale and BEFORE the mask (HF eager order).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, h, s_local, d = q.shape
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(d)

    q_pos = idx * s_local + jnp.arange(s_local)  # absolute positions of local queries
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, i):
        k_cur, v_cur, m, l, acc = carry
        src = (idx - i) % n  # whose KV block we currently hold
        kv_pos = src * s_local + jnp.arange(s_local)

        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur, preferred_element_type=jnp.float32) * scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        if causal or window is not None:
            allow = (kv_pos[None, :] <= q_pos[:, None]) if causal else jnp.bool_(True)
            if window is not None:
                allow = allow & (kv_pos[None, :] > q_pos[:, None] - window)
            s = jnp.where(allow[None, None], s, MASK_VALUE)

        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m, m_curr)
        alpha = jnp.exp(m - m_next)
        p = jnp.exp(s - m_next)
        l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_next = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur, preferred_element_type=jnp.float32
        )

        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (k_nxt, v_nxt, m_next, l_next, acc_next), None

    # derive the init carries from q so they carry the same varying-axes type
    # as the loop outputs (shard_map tracks which values vary per device)
    zero_col = q[..., :1].astype(jnp.float32) * 0.0
    m0 = zero_col - jnp.inf
    l0 = zero_col
    acc0 = q.astype(jnp.float32) * 0.0
    (k_f, v_f, m_f, l_f, acc_f), _ = jax.lax.scan(
        step, (k, v, m0, l0, acc0), jnp.arange(n)
    )
    l_inv = jnp.where(l_f == 0.0, 1.0, 1.0 / l_f)
    return (acc_f * l_inv).astype(q.dtype)


def context_parallel_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    causal: bool = True,
    num_kv_groups: int = 1,
) -> jax.Array:
    """Full-sequence attention with the sequence sharded over `axis`.

    q: [B, nh, S, hd], k/v: [B, nkv, S, hd] (GQA repeated here — the ring
    rotates the already-expanded KV). S must divide by the axis size.
    """
    if num_kv_groups > 1:
        k = jnp.repeat(k, num_kv_groups, axis=1)
        v = jnp.repeat(v, num_kv_groups, axis=1)

    spec = P(None, None, axis, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=axis, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
