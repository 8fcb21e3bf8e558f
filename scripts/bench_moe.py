"""Tiny-Mixtral on-chip benchmark: the MoE/EP path's measured numbers.

The MoE family (models/moe.py — stacked-expert Mixtral block, a
beyond-reference extension: the reference's targets are hardcoded to dense
gate/up/down_proj, modeling_grasp.py:248) is golden-tested against the
executing MixtralForCausalLM but until now had no on-chip perf record. This
script gives it two:

  1. GRASP compression e2e of a 1.3B-class mixtral-mini (8 experts, top-2,
     hd=128) at the paper ratio — the stacked w1/w2/w3 parts go through the
     batched [E]-leading gram-eigh selection (ops/svd.ufree_select) alongside
     the dense attention projections.
  2. Paged continuous-batching decode of the compressed model (slope +
     engine wall clock, same methodology as scripts/bench_7b_serving.py).
     hd=128 so decode exercises the fused paged-attention kernel.

Writes BENCH_MOE.json at the repo root; bench.py attaches it to the round
artifact. Run on an otherwise idle machine:
    python scripts/bench_moe.py
CPU smoke (tests/test_bench_moe_smoke.py): GRASP_BENCH_MOE_TINY=1.
"""

import dataclasses
import json
import logging
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(message)s")
log = logging.getLogger("bench_moe")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def mixtral_mini():
    """1.3B-class Mixtral-family config: every architectural trait of
    mixtral_8x7b (8 experts, top-2 routing, GQA, hd=128) at shapes that fit
    one v5e chip next to a compression sweep."""
    from grasp_tpu.configs import ModelConfig

    return dataclasses.replace(
        ModelConfig.mixtral_8x7b(),
        hidden_size=1024,
        intermediate_size=3584,
        num_hidden_layers=12,
        num_attention_heads=8,
        num_key_value_heads=4,
        max_position_embeddings=4096,
        dtype="bfloat16",
    )


def main(tiny=None):
    import grasp_tpu
    from grasp_tpu.configs import GraspConfig
    from grasp_tpu.core.engine import GraspEngine
    from grasp_tpu.models.llama import init_params
    from grasp_tpu.perf import count_params, device_memory, reset_hbm_peak

    grasp_tpu.enable_compilation_cache()  # $GRASP_COMPILE_CACHE opt-in

    tiny = tiny if tiny is not None else bool(
        int(os.environ.get("GRASP_BENCH_MOE_TINY", "0")))
    if tiny:
        from grasp_tpu.configs import ModelConfig

        config = ModelConfig.tiny(
            vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=3, num_attention_heads=4,
            num_key_value_heads=2, num_local_experts=4,
            num_experts_per_tok=2)
        samples, seq_len, batch, prune = 8, 24, 2, 1
    else:
        config = mixtral_mini()
        samples = int(os.environ.get("GRASP_BENCH_MOE_SAMPLES", 128))
        seq_len, batch, prune = 512, 8, 3

    out = {
        "model": f"mixtral-mini {config.num_hidden_layers}L "
                 f"h{config.hidden_size} E{config.num_local_experts} "
                 f"top{config.num_experts_per_tok} (random init, bf16)"
                 if not tiny else "tiny smoke",
        "backend": jax.default_backend(),
        "run_date": time.strftime("%Y-%m-%d"),
        "config": {"num_prune_layers": prune, "compression_ratio": 0.9,
                   "metric": "taylor", "num_samples": samples,
                   "seq_len": seq_len, "batch": batch},
    }

    if jax.default_backend() == "tpu":
        from grasp_tpu.perf import tunnel_health
        out.update(tunnel_health())  # h2d provenance (CLAUDE.md protocol)

    reset_hbm_peak()
    params = init_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)
    out["params_b"] = round(count_params(params) / 1e9, 3)

    rng = np.random.default_rng(0)
    batches = [
        {"input_ids": jnp.asarray(s[:, :-1], jnp.int32),
         "labels": jnp.asarray(s[:, 1:], jnp.int32)}
        for s in rng.integers(0, config.vocab_size,
                              (max(samples // batch, 1), batch, seq_len))
    ]

    engine = GraspEngine(params, config, svd_method="gram_device")
    # parallel fast path by default: ONE multi-layer grad graph instead of
    # 2*prune per-round graphs — the r4 sequential run was compile-bound
    # (grad_compile 72 s + serial eigh compiles = 61% of its 318.8 s e2e
    # through the erratic remote-compile tunnel). GRASP_BENCH_MOE_MODE
    # restores sequential for reference-faithful comparison.
    mode = os.environ.get("GRASP_BENCH_MOE_MODE", "parallel")
    out["config"]["sweep"] = mode
    cfg = GraspConfig(
        num_prune_layers=prune, compression_ratio=0.9, metric="taylor",
        num_samples=samples, seq_len=seq_len, batch_size=batch, sweep=mode,
    )
    t0 = time.time()
    summary = engine.run(batches, cfg)
    out["compress_e2e_s"] = round(time.time() - t0, 1)
    out["stage_times_s"] = summary["stage_times_s"]
    out["redundant_layers"] = summary["redundant_layers"]
    out["n_compressed_modules"] = len(summary["rank_dict"])
    out["moe_modules"] = sorted(
        k for k in summary["rank_dict"] if "block_sparse_moe" in k)[:3]
    out["params_after_b"] = round(count_params(engine.params) / 1e9, 3)
    if jax.default_backend() == "tpu":
        out["peak_hbm_gib"] = round(
            device_memory()["peak_bytes_in_use"] / 2**30, 2)

    # --- paged decode of the compressed model --------------------------
    from bench_7b_serving import engine_wall_clock, paged_decode_slope

    dec = {}
    try:
        step_s, agg, det = paged_decode_slope(
            engine.params, config, engine.plan, batch=batch,
            page_size=16 if tiny else 128,
            pages_per_seq=2, prefix_len=4 if tiny else 128,
            ks=(2, 10) if tiny else (8, 40))
        dec["decode_ms_per_step_device"] = round(step_s * 1e3, 2)
        dec["decode_tok_s_aggregate_device"] = round(agg, 1)
        dec.update(det)
        # HBM roofline context: dense-MoE decode reads every expert's bytes
        weights_gib = sum(x.size * x.dtype.itemsize
                          for x in jax.tree.leaves(engine.params)) / 2**30
        dec["weights_gib"] = round(weights_gib, 2)
        dec["hbm_roofline_ms"] = round(weights_gib * 2**30 / 819e9 * 1e3, 2)
    except Exception as e:  # pragma: no cover - diagnostic path
        dec["slope_error"] = f"{type(e).__name__}: {e}"[:300]
    try:
        tok_s, det = engine_wall_clock(
            engine.params, config, engine.plan, batch=batch,
            prompt_len=8 if tiny else 128, max_new=8 if tiny else 256,
            num_pages=12 if tiny else 40,
            page_size=16 if tiny else 128,
            pages_per_seq=2 if tiny else 4)
        dec["engine_tok_s_aggregate_wall"] = round(tok_s, 1)
        dec.update(det)
    except Exception as e:  # pragma: no cover - diagnostic path
        dec["engine_error"] = f"{type(e).__name__}: {e}"[:300]
    out["paged_decode_compressed"] = dec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH_MOE.json")
    if not tiny:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        log.info("wrote %s", path)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
