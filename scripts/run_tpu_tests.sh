#!/usr/bin/env bash
# Run the TPU-only kernel tests on the real chip (CI forces the CPU backend;
# these are skipped there). Usage: bash scripts/run_tpu_tests.sh
set -euo pipefail
cd "$(dirname "$0")/.."
# do NOT let conftest force CPU: run the TPU-marked tests via a direct driver
python - <<'EOF'
import numpy as np
import jax
import jax.numpy as jnp

assert any(d.platform == "tpu" for d in jax.devices()), "no TPU visible"
failures = []

# pallas fused low-rank exactness (ragged M)
from grasp_tpu.ops.pallas_lowrank import fused_lowrank
rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal((777, 2048)), jnp.bfloat16)
a = jnp.asarray(rng.standard_normal((2048, 204)) * 0.02, jnp.bfloat16)
b = jnp.asarray(rng.standard_normal((204, 5632)) * 0.02, jnp.bfloat16)
y = fused_lowrank(x, a, b)
ref = jnp.dot(jnp.dot(x, a, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
              b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"fused_lowrank ragged parity: {err:.4f}")
if err > 1e-3: failures.append("fused_lowrank")

# pallas flash attention parity (ragged S, GQA)
from grasp_tpu.ops.pallas_attention import flash_attention, _xla_reference
q = jnp.asarray(rng.standard_normal((1, 8, 511, 64)), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((1, 2, 511, 64)), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((1, 2, 511, 64)), jnp.bfloat16)
y = flash_attention(q, k, v, 4)
ref = _xla_reference(q, k, v, 4, None)
err = float(jnp.max(jnp.abs(y.astype(jnp.float32) - ref.astype(jnp.float32))))
print(f"flash_attention ragged/GQA parity: {err:.4f}")
if err > 5e-2: failures.append("flash_attention")

# pallas stochastic quantize
from grasp_tpu.ops.quant import pallas_quantize_int8, dequantize
w = jnp.asarray(rng.standard_normal((256, 128)) * 0.02, jnp.float32)
qv, scale = pallas_quantize_int8(w, seed=0)
rec = np.asarray(dequantize(qv, scale, jnp.float32))
ulp = float(np.abs(rec - np.asarray(w)).max() / np.asarray(scale).max())
print(f"pallas stochastic quantize max err: {ulp:.3f} ulp")
if ulp > 1.001: failures.append("pallas_quantize")

# flash attention backward kernels (dKV + dQ) vs XLA grads
qf = q.astype(jnp.float32); kf = k.astype(jnp.float32); vf = v.astype(jnp.float32)
gf = jax.grad(lambda a, b_, c: jnp.sum(flash_attention(a, b_, c, 4) ** 2), argnums=(0, 1, 2))(qf, kf, vf)
gx = jax.grad(lambda a, b_, c: jnp.sum(_xla_reference(a, b_, c, 4, None) ** 2), argnums=(0, 1, 2))(qf, kf, vf)
errs = [float(jnp.abs(x - y).max() / (jnp.abs(y).max() + 1e-9)) for x, y in zip(gf, gx)]
print(f"flash backward dq/dk/dv rel errs: {[f'{e:.1e}' for e in errs]}")
if max(errs) > 2e-2: failures.append("flash_backward")

assert not failures, f"TPU kernel tests FAILED: {failures}"
print("ALL TPU KERNEL TESTS PASSED")
EOF
