"""Int4 kernel isolation bench: effective HBM GB/s via the chained slope.

Times a jitted fori_loop of k chained pallas_int4_matmul calls at two loop
lengths and takes the slope (per-call time with the dispatch latency
subtracted — the axon tunnel charges ~35-40 ms per dispatch, so single-call
wall times are meaningless here). Effective bandwidth = packed weight bytes /
per-call time; the v5e HBM roofline is 819 GB/s.

Round-2 grid-pipeline kernel measured 527 GB/s (64%) at 4096x4096 BO=512;
this script A/Bs it against the manual-DMA double-buffered kernel
(GRASP_INT4_KERNEL=dma, chunk size GRASP_INT4_CHUNK_KB).

Usage: python scripts/bench_int4_kernel.py [dma|grid] [chunk_kb ...]
"""

import functools
import os
import sys
import time

if len(sys.argv) > 1:
    os.environ["GRASP_INT4_KERNEL"] = sys.argv[1]

import jax
import jax.numpy as jnp
import numpy as np

ROOFLINE_GBS = 819.0


def measure(shape=(4096, 4096), m=1, k_small=500, k_large=4500, reps=5):
    from grasp_tpu.ops.pallas_int4 import pallas_int4_matmul
    from grasp_tpu.ops.quant import quantize_int4

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=shape), jnp.float32)
    q, scale = quantize_int4(w)
    # chain: y feeds back so calls serialize (square matrices only)
    x0 = jnp.asarray(rng.normal(size=(m, shape[0])), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(x, k):
        def body(_, xc):
            y = pallas_int4_matmul(xc, q, scale)
            return (y * 1e-3).astype(jnp.bfloat16)  # keep magnitudes sane

        return jax.lax.fori_loop(0, k, body, x).astype(jnp.float32).sum()

    float(chain(x0, k_small))  # compile both
    float(chain(x0, k_large))

    def timed(k):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(x0, k))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_s, t_l = timed(k_small), timed(k_large)
    per_call = (t_l - t_s) / (k_large - k_small)
    bytes_read = q.size + scale.size * 4  # packed int8 + fp32 scales
    gbs = bytes_read / per_call / 1e9
    return per_call * 1e6, gbs


def main():
    kern = os.environ.get("GRASP_INT4_KERNEL", "grid")
    chunks = [int(a) for a in sys.argv[2:]] or [None]
    for ck in chunks:
        if ck is not None:
            os.environ["GRASP_INT4_CHUNK_KB"] = str(ck)
            # re-import with new chunk size
            for mod in list(sys.modules):
                if "pallas_int4" in mod:
                    del sys.modules[mod]
        us, gbs = measure()
        ck_s = os.environ.get("GRASP_INT4_CHUNK_KB", "default")
        print(
            f"kernel={kern} chunk_kb={ck_s}: {us:.1f} us/call, "
            f"{gbs:.0f} GB/s = {gbs / ROOFLINE_GBS:.0%} of roofline",
            flush=True,
        )


if __name__ == "__main__":
    main()
