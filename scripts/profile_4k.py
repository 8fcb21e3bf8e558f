"""Profile the 4k-sequence forward: where does the long-context path lose?

Round-2 verdict flagged fwd_4k_flash = 190 ms at batch 1 with remat
(~25% MFU) vs 42% MFU at seq 511, benched apples-to-oranges (batch 1 +
remat vs batch 8 no-remat). This script separates the axes on the real
chip: batch in {1, 4, 8} x flash on/off x remat on/off on the DENSE
TinyLlama-1.1B plan, each timed honestly (scalar reduction inside jit,
float() on the result — block_until_ready lies through the axon tunnel),
plus an isolated attention-op microbench (flash kernel vs XLA reference
attention at 4k) to split attention cost from projection cost.

Usage: python scripts/profile_4k.py [--quick]
Writes /tmp/profile_4k.json and prints it.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def _median(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.time()
        fn()
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    quick = "--quick" in sys.argv
    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.models.llama import forward, init_params
    from grasp_tpu.perf import estimate_forward_flops

    import dataclasses

    config = dataclasses.replace(ModelConfig.tinyllama_1_1b(), dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)
    rng = np.random.default_rng(0)

    out = {"model": "tinyllama-1.1b dense bf16", "seq": 4096, "grid": []}
    combos = [(1, False, True), (1, True, True), (1, True, False),
              (4, True, False), (8, True, False), (8, False, False)]
    if quick:
        combos = [(1, True, True), (8, True, False)]
    for batch, flash, remat in combos:
        cfg = dataclasses.replace(config, use_flash_attention=flash)
        ids = jnp.asarray(rng.integers(0, config.vocab_size, size=(batch, 4096)))

        @jax.jit
        def fwd(p, i):
            logits = forward(p, i, config=cfg, remat=remat)["logits"]
            return jnp.sum(logits[:, -1].astype(jnp.float32))

        try:
            fwd.lower(params, ids).compile()
            float(fwd(params, ids))  # warm dispatch
            t = _median(lambda: float(fwd(params, ids)), n=3 if quick else 5)
        except Exception as e:
            out["grid"].append({"batch": batch, "flash": flash, "remat": remat,
                                "error": str(e)[:200]})
            continue
        fl = estimate_forward_flops(params, config, seq_len=4096)["flops"] * batch
        tflops = fl / t / 1e12
        out["grid"].append({
            "batch": batch, "flash": flash, "remat": remat,
            "ms": round(t * 1e3, 1), "tflops": round(tflops, 1),
            "mfu": round(tflops / PEAK_TFLOPS, 3),
        })
        print(out["grid"][-1], file=sys.stderr)

    # ---- isolated attention op at 4k: flash kernel vs XLA fallback --------
    from grasp_tpu.ops.pallas_attention import flash_attention

    b, s = 1, 4096
    h, kvh, hd = config.num_attention_heads, config.num_key_value_heads, config.head_dim_
    q = jnp.asarray(rng.standard_normal((b, h, s, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, kvh, s, hd)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, kvh, s, hd)), jnp.bfloat16)

    @jax.jit
    def att_flash(q, k, v):
        o = flash_attention(q, k, v, h // kvh, hd ** -0.5)
        return jnp.sum(o[:, :, -1].astype(jnp.float32))

    try:
        att_flash.lower(q, k, v).compile()
        float(att_flash(q, k, v))
        t_fl = _median(lambda: float(att_flash(q, k, v)), n=5)
        # attention flops: 2 matmuls, causal half window
        att_fl = 2 * 2 * b * h * s * (s / 2) * hd * 2  # fwd only, qk+pv
        out["attn_flash_4k"] = {
            "ms": round(t_fl * 1e3, 2),
            "tflops": round(att_fl / t_fl / 1e12, 1),
        }
        print("attn flash:", out["attn_flash_4k"], file=sys.stderr)
    except Exception as e:
        out["attn_flash_4k"] = {"error": str(e)[:200]}

    with open("/tmp/profile_4k.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
