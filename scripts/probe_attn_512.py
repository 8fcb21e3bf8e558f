"""Short-sequence attention shootout: XLA vs flash blocks at S~512.

CLAUDE.md records the S=511 forward's only slow op as attention
(0.68 ms/layer, 25 TF/s, fp32-softmax-bound) and that flash was SLOWER at
that length (1.04 ms) with the default 256/256 blocks — 1024 tiny programs.
At S=512 a 512/512 block config is a single KV tile per (batch, head): the
whole score row lives in VMEM, no inter-tile m/l state, 256 programs. This
script measures the isolated op (chained-slope, honest scalar reduce) for
XLA and several flash block pairs, fwd and fwd+bwd, TinyLlama geometry.

Blocks are bound at ops/pallas_attention import, so each config runs in a
subprocess (same pattern as sweep_flash_blocks.py).

Usage: python scripts/probe_attn_512.py [seq]
"""

import json
import os
import subprocess
import sys

WORKER = r"""
import sys, time, functools
import jax, jax.numpy as jnp, numpy as np

mode, bq, bk, S = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])

B, NH, NKV, HD = 8, 32, 4, 64  # TinyLlama attention geometry
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, NH, S, HD)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, NKV, S, HD)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, NKV, S, HD)).astype(np.float32)).astype(jnp.bfloat16)

if mode == "xla":
    from grasp_tpu.models.llama import _attention
    neg = jnp.finfo(jnp.float32).min
    causal = jnp.where(
        np.tril(np.ones((S, S), bool))[None, None], 0.0, neg
    ).astype(jnp.float32)
    op = lambda q, k, v: _attention(q, k, v, causal, NH // NKV)
else:
    from grasp_tpu.ops.pallas_attention import flash_attention
    op = lambda q, k, v: flash_attention(q, k, v, NH // NKV)

def loss(q, k, v):
    return op(q, k, v).astype(jnp.float32).sum()

grad = jax.grad(loss, argnums=(0, 1, 2))

def chained(fn, reps):
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            out = fn(q + acc.astype(q.dtype) * 0, k, v)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(x.astype(jnp.float32).sum() for x in leaves)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    float(run(q, k, v))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(q, k, v)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

res = {"mode": mode, "bq": bq, "bk": bk, "S": S}
t4, t12 = chained(op, 4), chained(op, 12)
res["fwd_ms"] = (t12 - t4) / 8 * 1e3
t4, t12 = chained(grad, 4), chained(grad, 12)
res["fwdbwd_ms"] = (t12 - t4) / 8 * 1e3
print("RESULT " + __import__("json").dumps(res))
"""


def main():
    seq = int(sys.argv[1]) if len(sys.argv) > 1 else 511
    configs = [("xla", 0, 0)] + [
        ("flash", bq, bk)
        for bq, bk in [(256, 256), (512, 512), (128, 512), (512, 256), (256, 512)]
    ]
    results = []
    for mode, bq, bk in configs:
        env = dict(os.environ)
        if mode == "flash":
            env["GRASP_FLASH_BQ"] = str(bq)
            env["GRASP_FLASH_BK"] = str(bk)
        out = subprocess.run(
            [sys.executable, "-c", WORKER, mode, str(bq), str(bk), str(seq)],
            capture_output=True, text=True, env=env, timeout=1200,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if line:
            r = json.loads(line[0][7:])
            results.append(r)
            print(json.dumps(r))
        else:
            print(json.dumps({"mode": mode, "bq": bq, "bk": bk,
                              "error": out.stderr.strip()[-400:]}))
    return results


if __name__ == "__main__":
    main()
