"""Per-batch timing of the BI sweep on the headline bench config.

BENCH_LAST.json's best clean run recorded bi_sweep=126.28 s for 4 batches of
8x511 on the 1.1B — ~31 s/batch where the steady-state forward is 62 ms and
the 6x-bigger 7B BI sweep ran 0.71 s/batch. This script reproduces exactly
bench.py's BI stage with per-call wall times (cold prime, each batch, then a
second pass on the SAME engine to separate compile/tunnel artifacts from
steady state).

Usage: python scripts/probe_bi.py
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.core.engine import GraspEngine


def main():
    config = ModelConfig.tinyllama_1_1b()
    config = dataclasses.replace(config, dtype="bfloat16")
    from grasp_tpu.models.llama import init_params

    t0 = time.time()
    params = init_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)
    print(json.dumps({"stage": "init", "s": round(time.time() - t0, 2)}))

    rng = np.random.default_rng(0)
    seqs = rng.integers(0, config.vocab_size, size=(4, 8, 512))
    batches = [
        {"input_ids": jnp.asarray(s[:, :-1]), "labels": jnp.asarray(s[:, 1:])}
        for s in seqs
    ]

    engine = GraspEngine(params, config)

    # instrument: same loop shape as engine.compute_bi but timed per batch
    for rep in range(2):
        t0 = time.time()
        imps, layers = engine.compute_bi(num_prune_layers=2, calibration_batches=_timed(batches))
        print(json.dumps({
            "stage": f"compute_bi_pass{rep}",
            "total_s": round(time.time() - t0, 2),
            "stage_times": {k: round(v, 2) for k, v in engine.stage_times.items()},
            "layers": layers,
        }))
        engine.stage_times.clear()


def _timed(batches):
    t_prev = time.time()
    for i, b in enumerate(batches):
        yield b
        now = time.time()
        print(json.dumps({"batch": i, "s": round(now - t_prev, 3)}))
        t_prev = now


if __name__ == "__main__":
    main()
