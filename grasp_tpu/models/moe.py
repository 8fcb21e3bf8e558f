"""Sparse Mixture-of-Experts MLP block (Mixtral-family).

Beyond-reference model family: the reference compresses only dense
LLaMA-family MLPs (its target names are hardcoded to gate/up/down_proj,
modeling_grasp.py:248), so MoE support has no reference counterpart. Routing
semantics replicate HF ``MixtralSparseMoeBlock`` exactly (fp32 softmax over
ALL router logits, top-k, renormalize over the selected k) and are
golden-tested against the executing ``MixtralForCausalLM``
(tests/test_moe.py).

TPU-native design: expert weights are STACKED on a leading [num_experts]
axis (w1/w3: [E, D, F], w2: [E, F, D]) so that

- the whole block is three einsums over the expert axis — MXU-batched, no
  per-expert Python loop, no ragged shapes;
- expert parallelism is one PartitionSpec: shard the leading E axis over the
  "model"/"expert" mesh axis and XLA (GSPMD) turns the combine-sum into the
  EP all-reduce (parallel/mesh.moe specs, tests/test_moe.py::test_ep);
- per-token sparsity is applied as a [T, E] combine-weight matrix (zero for
  unselected experts). Every expert computes every token — at top-2-of-8 that
  is 4x the selected-expert FLOPs, the classic dense-MoE tradeoff that is
  optimal for small expert counts/batches on the MXU (no sort/scatter, no
  capacity drops, bitwise-deterministic). A capacity-based dispatch/combine
  path for large-scale training is ROADMAP work.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from grasp_tpu.configs import ModelConfig

MOE_PARTS = ("w1", "w2", "w3")  # HF Mixtral naming: w1=gate, w2=down, w3=up


def init_moe_params(rng: jax.Array, config: ModelConfig, scale: float = 0.02) -> Dict[str, Any]:
    """One layer's MoE block params: router gate + stacked experts."""
    d, f, e = config.hidden_size, config.intermediate_size, config.num_local_experts
    dtype = jnp.dtype(config.dtype)
    kg, k1, k2, k3 = jax.random.split(rng, 4)

    def w(key, shape):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "gate": {"kernel": w(kg, (d, e))},
        "experts": {
            "w1": w(k1, (e, d, f)),
            "w3": w(k3, (e, d, f)),
            "w2": w(k2, (e, f, d)),
        },
    }


def router_weights(logits: jax.Array, top_k: int) -> jax.Array:
    """[T, E] fp32 router logits -> [T, E] combine weights (0 for unselected).

    HF MixtralSparseMoeBlock semantics: softmax over ALL experts in fp32,
    take top-k, renormalize the k weights to sum to 1.
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)  # torch.topk tie order
    top_vals = top_vals / jnp.sum(top_vals, axis=-1, keepdims=True)
    combine = jnp.zeros_like(probs)
    t = jnp.arange(probs.shape[0])[:, None]
    return combine.at[t, top_idx].set(top_vals)


def moe_apply(x: jax.Array, mp: Dict[str, Any], config: ModelConfig) -> jax.Array:
    """Sparse-MoE MLP: x [B, S, D] -> [B, S, D].

    y_t = sum_e combine[t, e] * (silu(x_t w1_e) * (x_t w3_e)) w2_e
    """
    b, s, d = x.shape
    xt = x.reshape(b * s, d)
    logits = jnp.dot(xt, mp["gate"]["kernel"], preferred_element_type=jnp.float32)
    combine = router_weights(logits, config.num_experts_per_tok).astype(x.dtype)

    ex = mp["experts"]
    if any(p + "_a" in ex for p in MOE_PARTS):
        # GRASP-compressed experts (core.engine compress_round on a MoE
        # layer): part p replaced by stacked low-rank factors p_a [E, in, k],
        # p_b [E, k, out] — two batched MXU einsums per part; uncompressed
        # parts stay dense. Mixing with quantized expert forms is unsupported
        # (quantize-after-compress is a serving-side follow-up).
        if any(p + "_q" in ex or p + "_q4" in ex for p in MOE_PARTS):
            raise NotImplementedError(
                "experts mixing GRASP low-rank and quantized parts"
            )

        def lmm(xin, p):
            eq_in = "etf,efk->etk" if xin.ndim == 3 else "td,edk->etk"
            if p + "_a" in ex:
                h_ = jnp.einsum(eq_in, xin, ex[p + "_a"], preferred_element_type=x.dtype)
                return jnp.einsum("etk,eko->eto", h_, ex[p + "_b"], preferred_element_type=x.dtype)
            return jnp.einsum(eq_in, xin, ex[p], preferred_element_type=x.dtype)

        g = lmm(xt, "w1")
        u = lmm(xt, "w3")
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        y_e = lmm(h, "w2")
        y = jnp.einsum("etd,te->td", y_e, combine, preferred_element_type=x.dtype)
        return y.reshape(b, s, d)

    if "w1_q4" in ex:  # nibble-packed int4 experts (ops.quant): scales [E, G, out]
        from grasp_tpu.ops.quant import unpack_int4

        def eqmm4(xin, w):
            packed, scale = ex[w + "_q4"], ex[w + "_scale"]
            e_, p_, out_ = packed.shape
            g = scale.shape[1]
            in_pad = 2 * p_  # contraction dim, zero-padded to a group multiple
            gs = in_pad // g
            if in_pad != xin.shape[-1]:  # pad activations to match (zeros x 0-rows)
                pad = [(0, 0)] * (xin.ndim - 1) + [(0, in_pad - xin.shape[-1])]
                xin = jnp.pad(xin, pad)
            qr = unpack_int4(packed).reshape(e_, g, gs, out_).astype(x.dtype)
            if xin.ndim == 2:  # token activations [T, D]
                xr = xin.reshape(-1, g, gs)
                pd = jnp.einsum("tgi,egio->etgo", xr, qr, preferred_element_type=jnp.float32)
            else:  # per-expert hidden [E, T, F]
                xr = xin.reshape(e_, -1, g, gs)
                pd = jnp.einsum("etgi,egio->etgo", xr, qr, preferred_element_type=jnp.float32)
            y = jnp.sum(pd * scale[:, None].astype(jnp.float32), axis=-2)
            return y.astype(x.dtype)

        g = eqmm4(xt, "w1")
        u = eqmm4(xt, "w3")
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        y_e = eqmm4(h, "w2")
        y = jnp.einsum("etd,te->td", y_e, combine, preferred_element_type=x.dtype)
        return y.reshape(b, s, d)

    if "w1_q" in ex:  # int8-quantized experts (ops.quant): scales [E, 1, out]
        def eqmm(xin, w):
            y = jnp.einsum(
                "etd,edf->etf" if xin.ndim == 3 else "td,edf->etf",
                xin, ex[w + "_q"].astype(x.dtype), preferred_element_type=jnp.float32,
            )
            return (y * ex[w + "_scale"].astype(jnp.float32)).astype(x.dtype)

        g = eqmm(xt, "w1")
        u = eqmm(xt, "w3")
        h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
        y_e = eqmm(h, "w2")
        y = jnp.einsum("etd,te->td", y_e, combine, preferred_element_type=x.dtype)
        return y.reshape(b, s, d)

    # all experts on all tokens, batched over the (shardable) expert axis
    g = jnp.einsum("td,edf->etf", xt, ex["w1"], preferred_element_type=x.dtype)
    u = jnp.einsum("td,edf->etf", xt, ex["w3"], preferred_element_type=x.dtype)
    h = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype) * u
    y_e = jnp.einsum("etf,efd->etd", h, ex["w2"], preferred_element_type=x.dtype)
    # scale AFTER the down-proj exactly like HF (fp scalars do not commute
    # through matmuls bitwise); the weighted sum over e is one contraction ->
    # one GSPMD all-reduce under expert parallelism
    y = jnp.einsum("etd,te->td", y_e, combine, preferred_element_type=x.dtype)
    return y.reshape(b, s, d)
