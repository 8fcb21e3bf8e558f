"""Decompose the headline 8x511 forward: where do the non-MXU milliseconds go?

bench.py's fwd_ms_8x511 on the compressed TinyLlama-1.1B sits at ~42% MFU.
This script measures each component of a dense layer at the bench shapes
(B=8, S=511, d=2048, f=5632, nh=32, nkv=4, hd=64) as an in-jit chained loop
(per-iteration cost = (t_n - t_1) / (n - 1), which cancels the 35-40 ms axon
dispatch tax and any loop-invariant setup), then compares the component sum
against the measured full-layer and full-model forwards.

Components: MLP block, QKVO projections, attention op (XLA repeat-KV path vs
Pallas flash), lm_head, rms_norm+rope overhead.

Usage: python scripts/profile_fwd.py [--quick]
Writes /tmp/profile_fwd.json and prints it.
"""

import dataclasses
import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def _timed(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def _chained(body, x0, iters, extra=()):
    """Per-iteration seconds of `body` via an in-jit chained fori_loop slope."""

    def make(n):
        @jax.jit
        def run(x, *extra):
            def step(_, c):
                return body(c, *extra)

            out = jax.lax.fori_loop(0, n, step, x)
            return jnp.sum(out[0] if isinstance(out, tuple) else out)

        return run

    lo, hi = 1, iters
    f_lo, f_hi = make(lo), make(hi)
    # compile both, then time
    float(f_lo(x0, *extra))
    float(f_hi(x0, *extra))
    t_lo = _timed(lambda: float(f_lo(x0, *extra)))
    t_hi = _timed(lambda: float(f_hi(x0, *extra)))
    return (t_hi - t_lo) / (hi - lo)


def main():
    quick = "--quick" in sys.argv
    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.models.llama import (_attention, forward, init_params,
                                        rms_norm)

    config = dataclasses.replace(ModelConfig.tinyllama_1_1b(), dtype="bfloat16")
    B, S = 8, 511
    d, f = config.hidden_size, config.intermediate_size
    nh, nkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                   config.head_dim_)
    V = config.vocab_size
    L = config.num_hidden_layers
    iters = 4 if quick else 8

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jnp.asarray(
        rng.standard_normal((B, S, d)), dtype=jnp.bfloat16))

    def w(shape):
        return jax.device_put(jnp.asarray(
            rng.standard_normal(shape) * 0.02, dtype=jnp.bfloat16))

    out = {"shapes": f"B={B} S={S} d={d} f={f} nh={nh} nkv={nkv} hd={hd} V={V} L={L}",
           "components_ms": {}, "tflops": {}}
    comp = out["components_ms"]
    tf = out["tflops"]
    tok = B * S

    # --- MLP block: gate+up+silu*mul+down -------------------------------
    wg, wu, wd = w((d, f)), w((d, f)), w((f, d))

    def mlp_body(c, wg, wu, wd):
        g = jnp.dot(c, wg, preferred_element_type=c.dtype)
        u = jnp.dot(c, wu, preferred_element_type=c.dtype)
        o = jnp.dot(jax.nn.silu(g) * u, wd, preferred_element_type=c.dtype)
        return c + o * 1e-6

    t = _chained(mlp_body, x, iters, (wg, wu, wd))
    comp["mlp_block"] = round(t * 1e3, 3)
    tf["mlp_block"] = round(2 * 3 * tok * d * f / t / 1e12, 1)

    # --- QKVO projections (separate dots, as the model issues them) -----
    wq, wk, wv, wo = w((d, nh * hd)), w((d, nkv * hd)), w((d, nkv * hd)), w((nh * hd, d))

    def qkvo_body(c, wq, wk, wv, wo):
        q = jnp.dot(c, wq, preferred_element_type=c.dtype)
        k = jnp.dot(c, wk, preferred_element_type=c.dtype)
        v = jnp.dot(c, wv, preferred_element_type=c.dtype)
        o = jnp.dot(q, wo, preferred_element_type=c.dtype)
        return c + (o + jnp.pad(k + v, ((0, 0), (0, 0), (0, d - nkv * hd)))) * 1e-6

    t = _chained(qkvo_body, x, iters, (wq, wk, wv, wo))
    comp["qkvo_projs"] = round(t * 1e3, 3)
    fl = 2 * tok * d * (nh * hd * 2 + nkv * hd * 2)
    tf["qkvo_projs"] = round(fl / t / 1e12, 1)

    # --- attention op: XLA repeat-KV path at bench shapes ----------------
    q0 = jax.device_put(jnp.asarray(
        rng.standard_normal((B, nh, S, hd)), dtype=jnp.bfloat16))
    k0 = jax.device_put(jnp.asarray(
        rng.standard_normal((B, nkv, S, hd)), dtype=jnp.bfloat16))
    v0 = jax.device_put(jnp.asarray(
        rng.standard_normal((B, nkv, S, hd)), dtype=jnp.bfloat16))
    mask = jnp.where(
        np.tril(np.ones((S, S), dtype=bool))[None, None], 0.0, -1e9
    ).astype(jnp.float32)

    def attn_body(c, k, v, mask):
        o = _attention(c, k, v, mask, nh // nkv)
        return c + o * 1e-6

    t = _chained(attn_body, q0, iters, (k0, v0, mask))
    comp["attention_xla"] = round(t * 1e3, 3)
    attn_fl = 2 * 2 * B * nh * S * S * hd
    tf["attention_xla"] = round(attn_fl / t / 1e12, 1)

    # --- attention op: Pallas flash at bench shapes ----------------------
    if jax.default_backend() != "cpu":
        from grasp_tpu.ops.pallas_attention import flash_attention

        def flash_body(c, k, v):
            o = flash_attention(c, k, v, nh // nkv)
            return c + o * 1e-6

        try:
            t = _chained(flash_body, q0, iters, (k0, v0))
            comp["attention_flash"] = round(t * 1e3, 3)
            tf["attention_flash"] = round(attn_fl / t / 1e12, 1)
        except Exception as e:  # noqa: BLE001
            comp["attention_flash"] = f"error: {type(e).__name__}"

    # --- lm_head ----------------------------------------------------------
    wl = w((d, V))

    def head_body(c, wl):
        logits = jnp.dot(c, wl, preferred_element_type=c.dtype)
        return c + logits[..., :d] * 1e-6

    t = _chained(head_body, x, iters, (wl,))
    comp["lm_head"] = round(t * 1e3, 3)
    tf["lm_head"] = round(2 * tok * d * V / t / 1e12, 1)

    # --- norm overhead (2 rms_norms at layer width) ----------------------
    gamma = jnp.ones((d,), dtype=jnp.bfloat16)

    def norm_body(c, gamma):
        a = rms_norm(c, gamma, config.rms_norm_eps)
        b2 = rms_norm(a, gamma, config.rms_norm_eps)
        return c + b2 * 1e-6

    t = _chained(norm_body, x, iters, (gamma,))
    comp["two_rms_norms"] = round(t * 1e3, 3)

    # --- full dense layer & full dense model ----------------------------
    params = init_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)
    ids = jnp.asarray(rng.integers(0, V, size=(B, S)))

    for name, cfg in (("model_fwd_dense", config),
                      ("model_fwd_dense_flash",
                       dataclasses.replace(config, use_flash_attention=True))):
        if name.endswith("flash") and jax.default_backend() == "cpu":
            continue

        @jax.jit
        def fwd(p, i, cfg=cfg):
            return jnp.sum(forward(p, i, config=cfg)["logits"].astype(jnp.float32) * 1e-9)

        float(fwd(params, ids))
        t = _timed(lambda: float(fwd(params, ids)))
        comp[name] = round(t * 1e3, 2)
        dense_fl = 2 * tok * (L * (d * (nh * hd * 2 + nkv * hd * 2) + 3 * d * f)
                              + d * V) + L * attn_fl
        tf[name] = round(dense_fl / t / 1e12, 1)
        out.setdefault("mfu", {})[name] = round(dense_fl / t / 1e12 / PEAK_TFLOPS, 3)

    # --- roofline accounting ---------------------------------------------
    per_layer = (comp["mlp_block"] + comp["qkvo_projs"] + comp["attention_xla"]
                 + comp["two_rms_norms"])
    implied = per_layer * L + comp["lm_head"]
    out["per_layer_component_sum_ms"] = round(per_layer, 3)
    out["implied_model_ms"] = round(implied, 2)
    out["residual_vs_measured_ms"] = round(comp["model_fwd_dense"] - implied, 2)

    print(json.dumps(out, indent=2))
    with open("/tmp/profile_fwd.json", "w") as fh:
        json.dump(out, fh, indent=2)


if __name__ == "__main__":
    main()
