"""Sweep flash-attention block sizes + batch for the 4k forward (VERDICT #5).

Times the ISOLATED flash op (chained-slope, honest scalar reduction) and the
full 1.1B forward at seq 4096 for several (block_q, block_k) pairs and
batch sizes, on the real chip. Each config runs in a subprocess because the
blocks are bound at import (ops/pallas_attention module constants drive the
backward residual layout too).

Usage: python scripts/sweep_flash_blocks.py            # full sweep
"""

import itertools
import json
import os
import subprocess
import sys

WORKER = r"""
import os, sys, time, dataclasses
import jax, jax.numpy as jnp, numpy as np

bq, bk, batch = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import forward, init_params
from grasp_tpu.ops.pallas_attention import flash_attention
from grasp_tpu.perf import estimate_forward_flops

# default: TinyLlama geometry; GRASP_SWEEP_HD=128 switches to the
# LLaMA-2-class head geometry (16 x 128, same hidden size) — the r4 block
# tables were tuned on hd=64 shapes only (r4 verdict #6)
HD = int(os.environ.get("GRASP_SWEEP_HD", "64"))
S, NH, NKV = 4096, 2048 // HD, 4
rng = np.random.default_rng(0)

# --- isolated op ---
q = jnp.asarray(rng.normal(size=(1, NH, S, HD)).astype(np.float32)).astype(jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(1, NKV, S, HD)).astype(np.float32)).astype(jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(1, NKV, S, HD)).astype(np.float32)).astype(jnp.bfloat16)

def op_loop(reps):
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            o = flash_attention(q, k, v, num_kv_groups=NH // NKV)
            return acc + o.astype(jnp.float32).sum()
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    float(run(q, k, v))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run(q, k, v)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

t1, t2 = op_loop(4), op_loop(12)
per_op = (t2 - t1) / 8

# --- full forward at (batch, 4096) ---
config = dataclasses.replace(ModelConfig.tinyllama_1_1b(), dtype="bfloat16",
                             use_flash_attention=True,
                             num_attention_heads=NH, num_key_value_heads=NKV)
params = init_params(jax.random.PRNGKey(0), config)
ids = jnp.asarray(rng.integers(0, config.vocab_size, (batch, S)), jnp.int32)

@jax.jit
def fwd(p, i):
    return forward(p, i, config=config, remat=True)["logits"].astype(jnp.float32).mean()

float(fwd(params, ids))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); float(fwd(params, ids)); ts.append(time.perf_counter() - t0)
fwd_s = float(np.median(ts))
fl = estimate_forward_flops(params, config, seq_len=S)
tflops = fl["flops"] * batch / fwd_s / 1e12
print(json.dumps({"bq": bq, "bk": bk, "batch": batch,
                  "op_ms": round(per_op * 1e3, 2),
                  "fwd_ms": round(fwd_s * 1e3, 1),
                  "fwd_tflops": round(tflops, 1)}))
""".replace("import json", "import json")

WORKER = "import json\n" + WORKER


def main():
    results = []
    combos = [(256, 256), (512, 512), (128, 512), (512, 1024), (1024, 512),
              (256, 1024)]
    quick = os.environ.get("GRASP_SWEEP_QUICK") == "1"
    if quick:  # bounded pass for tunnel-budgeted sessions
        combos = [(256, 256), (512, 512), (512, 1024), (1024, 512)]
    for (bq, bk), batch in itertools.product(combos, (1,) if quick else (1, 4)):
        env = {**os.environ, "GRASP_FLASH_BQ": str(bq), "GRASP_FLASH_BK": str(bk)}
        proc = subprocess.run([sys.executable, "-u", "-c", WORKER,
                               str(bq), str(bk), str(batch)],
                              env=env, capture_output=True, text=True, timeout=1200)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if line:
            r = json.loads(line[-1])
            results.append(r)
            print(r, flush=True)
        else:
            print({"bq": bq, "bk": bk, "batch": batch,
                   "error": proc.stderr.strip()[-200:]}, flush=True)
    out_path = os.environ.get("GRASP_SWEEP_OUT", "/tmp/flash_sweep.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
