"""Headline benchmark: end-to-end GRASP compression wall-clock on TPU.

Config mirrors BASELINE.json config 1 scaled to the paper pipeline:
TinyLlama-1.1B architecture (random init — no model weights are downloadable
in this environment), 2 redundant layers, compression ratio 0.9 (paper
setting), taylor saliency, 32 calibration samples x 512 tokens, sequential
(reference-faithful) sweep with host SVDs prefetched/overlapped. The torch
reference baseline for the identical workload, measured on this machine's
CPU by the actual reference code (scripts/measure_reference_baseline.py), is
stored in reference_baseline.json. NOTE: wall-clock on this container varies
run-to-run (observed 220-420 s) — the remote XLA-compile service latency
dominates and fluctuates; the best observed is 220 s (10.1x).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from grasp_tpu.configs import GraspConfig, ModelConfig
    from grasp_tpu.core.engine import GraspEngine
    from grasp_tpu.models.llama import init_params

    config = ModelConfig.tinyllama_1_1b()
    config = __import__("dataclasses").replace(config, dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)

    rng = np.random.default_rng(0)
    seqs = rng.integers(0, config.vocab_size, size=(4, 8, 512))
    batches = [
        {"input_ids": jnp.asarray(s[:, :-1]), "labels": jnp.asarray(s[:, 1:])} for s in seqs
    ]

    engine = GraspEngine(params, config)
    cfg = GraspConfig(
        num_prune_layers=2,
        compression_ratio=0.9,
        metric="taylor",
        sweep="sequential",
    )
    t0 = time.time()
    summary = engine.run(batches, cfg)
    wall = time.time() - t0

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "reference_baseline.json")
    vs = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_wall = ref.get("tinyllama_e2e_compress_wall_s")
        if ref_wall:
            vs = ref_wall / wall  # >1 == we are faster than the torch reference

    print(json.dumps({
        "metric": "tinyllama_1.1b_e2e_compress_wall_clock",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": round(vs, 2) if vs else None,
    }))


if __name__ == "__main__":
    main()
