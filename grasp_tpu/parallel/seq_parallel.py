"""Sequence-parallel model forward — ring attention wired through the stack.

For contexts that exceed one device's activation memory, the whole forward
runs under shard_map with the SEQUENCE dimension sharded over a mesh axis:
embeddings, norms and projections are position-local (no communication), and
attention is the ring kernel (grasp_tpu.parallel.ring_attention) — KV blocks
rotate via ppermute with online-softmax accumulation. Per-device activation
memory is O(S/n); the reference's only answer to long context is truncation
(SURVEY.md §5).

Gradients flow through the whole path — shard_map, the ppermute ring and the
online-softmax scan are all differentiable (ppermute transposes to the
inverted permutation; the scan backward rotates KV gradients back around the
ring), so long-context TRAINING works sequence-parallel too:
:func:`seq_parallel_loss` / :func:`make_seq_parallel_train_step`. Grads match
the single-device forward bit-for-bit within fp tolerance
(tests/test_seq_parallel.py::test_seq_parallel_grads_match). Use remat=True to
rematerialize each layer in the backward (activation memory O(S/n) again
instead of the scan's saved carries).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import (
    ATTN_PROJS,
    MLP_PROJS,
    ModelPlan,
    PROJ_ORDER,
    Params,
    _lm_logits,
    apply_rope,
    attn_mlp_residual,
    default_plan,
    embed_lookup,
    proj_apply,
    rms_norm,
    rope_cos_sin,
)
from grasp_tpu.parallel.ring_attention import ring_attention


def _local_layer(lp, layer_plan, h, cos, sin, config, axis_name, window=None):
    b, s_local, d = h.shape
    nh, nkv, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim_
    kinds = dict(zip(PROJ_ORDER, layer_plan))

    x = rms_norm(h, lp["input_layernorm"]["weight"], config.rms_norm_eps,
                 plus_one=config.norm_plus_one)
    ap = lp["self_attn"]
    q = proj_apply(x, ap["q_proj"], kinds["q_proj"]).reshape(b, s_local, nh, hd).transpose(0, 2, 1, 3)
    k = proj_apply(x, ap["k_proj"], kinds["k_proj"]).reshape(b, s_local, nkv, hd).transpose(0, 2, 1, 3)
    v = proj_apply(x, ap["v_proj"], kinds["v_proj"]).reshape(b, s_local, nkv, hd).transpose(0, 2, 1, 3)
    q, k = apply_rope(q, k, cos, sin)

    groups = nh // nkv
    if groups > 1:
        k = jnp.repeat(k, groups, axis=1)
        v = jnp.repeat(v, groups, axis=1)
    sm_scale = (config.query_pre_attn_scalar ** -0.5
                if config.query_pre_attn_scalar else None)
    attn = ring_attention(q, k, v, axis_name, sm_scale=sm_scale,
                          window=window, softcap=config.attn_logit_softcapping)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s_local, nh * hd)
    attn = proj_apply(attn, ap["o_proj"], kinds["o_proj"])
    return attn_mlp_residual(h, attn, lp, kinds, config)


def seq_parallel_logits(
    params: Params,
    input_ids: jax.Array,
    mesh: Mesh,
    config: ModelConfig,
    plan: Optional[ModelPlan] = None,
    axis: str = "data",
    remat: bool = False,
) -> jax.Array:
    """Logits [B, S, V] for a sequence sharded over `axis` (S % axis_size == 0)."""
    plan = plan or default_plan(config)

    def local_forward(params, ids):
        # ids: local block [B, S/n]; absolute positions via the ring index
        idx = jax.lax.axis_index(axis)
        b, s_local = ids.shape
        positions = (idx * s_local + jnp.arange(s_local))[None, :].repeat(b, axis=0)
        cos, sin = rope_cos_sin(positions, config.head_dim_, config.rope_theta,
                                scaling=config.rope_scaling)

        h = embed_lookup(params, ids, config)
        for li in range(config.num_hidden_layers):
            layer_fn = functools.partial(
                _local_layer, layer_plan=plan[li], cos=cos, sin=sin,
                config=config, axis_name=axis,
                window=config.layer_window(li),
            )
            if remat:
                layer_fn = jax.checkpoint(layer_fn)
            h = layer_fn(params["layers"][li], h=h)
        h = rms_norm(h, params["norm"]["weight"], config.rms_norm_eps,
                     plus_one=config.norm_plus_one)
        return _lm_logits(h, params, softcap=config.final_logit_softcapping)

    fn = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(None, axis)),
        out_specs=P(None, axis, None),
    )
    return fn(params, input_ids)


def seq_parallel_loss(
    params: Params,
    input_ids: jax.Array,
    labels: jax.Array,
    mesh: Mesh,
    config: ModelConfig,
    plan: Optional[ModelPlan] = None,
    axis: str = "data",
    remat: bool = False,
) -> jax.Array:
    """HF CausalLM loss with the sequence sharded over `axis`. Differentiable:
    jax.grad of this matches grads of the regular single-device forward."""
    from grasp_tpu.models.llama import hf_causal_lm_loss

    logits = seq_parallel_logits(params, input_ids, mesh, config, plan, axis, remat=remat)
    return hf_causal_lm_loss(logits, labels)


def make_seq_parallel_train_step(
    config: ModelConfig,
    plan: ModelPlan,
    optimizer,
    mesh: Mesh,
    axis: str = "data",
    remat: bool = False,
):
    """One jitted long-context SGD step with ring attention in the backward:
    (params, opt_state, input_ids, labels) -> (params, opt_state, loss)."""
    import optax

    def step(params, opt_state, input_ids, labels):
        def loss_fn(p):
            return seq_parallel_loss(p, input_ids, labels, mesh, config, plan, axis, remat)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
