"""7B-class speculative serving benchmark on one v5e chip (16 GiB HBM).

Completes the 7B serving story (BENCH_7B_SERVING.json covers plain paged
continuous batching): the GRASP-compressed 5.46B model (paper plan, 7 layers
low-rank at ratio 0.9 — reference scripts/params_script.sh:10-27) served
through SpeculativeServingEngine with quantized self-speculation:

  - target: compressed 5.46B, int8 weights (~5.2 GiB)
  - draft:  the SAME compressed weights, int4   (~2.9 GiB)
  - both KV pools int8-paged (shared page tables/allocator)

Quantized self-speculation is the only draft/target pairing with realistic
acceptance in this no-weights container (random init): the draft is the same
function at lower weight precision, so argmax agreement is high, and a draft
decode step reads ~56% of the target's HBM bytes.

Numbers are wall-clock aggregate tok/s of ServingEngine.run() (batch 8),
plain vs speculative, plus the measured acceptance rate. On this container
every dispatch pays the ~35-40 ms axon tunnel tax; the speculative macro-step
is 2 dispatches (fused gamma-step draft + chunked verify) for ~(accepted+1)
tokens/row vs 1 dispatch/token plain, so the tax amortizes ~(E+1)/2 deeper —
recorded per-config so the chip-rate and the tax can be separated.

Output identity note: at hd=128 the plain engine decodes through jax's fused
paged-attention kernel while speculative verify uses the gather path (the
kernel has no multi-query form), so greedy outputs can diverge at fp ties;
the bench records the per-row agreement instead of asserting identity (the
bit-identity contract is pinned at test scale in tests/test_spec_paged.py).

Writes BENCH_7B_SPEC.json at the repo root. Run on an otherwise idle machine:
    python scripts/bench_7b_spec.py
"""

import dataclasses
import json
import logging
import os
import sys
import time

import jax
import numpy as np

logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(message)s")
log = logging.getLogger("bench7b_spec")

sys.path.append(os.path.dirname(os.path.abspath(__file__)))


def _bytes(tree):
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def _gib(tree):
    return round(_bytes(tree) / 2**30, 2)


def main(batch=8, prompt_len=128, max_new=64, gamma=4, seed=0):
    tiny = os.environ.get("GRASP_BENCH_SPEC_TINY") == "1"  # CPU smoke mode
    if tiny:
        jax.config.update("jax_platforms", "cpu")

    from bench_7b_serving import synthetic_compressed_7b

    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.ops.quant import quantize_model_weights
    from grasp_tpu.perf import device_memory
    from grasp_tpu.serving.paged import ServingEngine
    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    if tiny:
        config = dataclasses.replace(
            ModelConfig.tiny(), dtype="float32")
        batch, prompt_len, max_new = 2, 16, 8
    else:
        config = dataclasses.replace(ModelConfig.llama2_7b(), dtype="bfloat16")

    # synthetic_compressed_7b is deterministic for a fixed key, so the bf16
    # source can be rebuilt between quantizations. Quantizing with consume=True
    # both times caps peak HBM at bf16 + ONE quantized tree (~13.1 GiB bf16+int4
    # co-residency left no headroom for jit temporaries on the 16 GiB chip).
    nprune = 1 if tiny else 7
    probe = {}
    if jax.default_backend() == "tpu":
        from grasp_tpu.perf import tunnel_health
        log.info("tunnel probe (pays the per-process d2h warm-up)...")
        probe = tunnel_health()  # BEFORE the chip fills: its pilot
        # device_puts OOMed when issued next to q4+q8 residency
        log.info("tunnel: %s", probe)
    log.info("build compressed model (paper plan)...")
    cp, cplan, target_layers = synthetic_compressed_7b(
        config, jax.random.PRNGKey(1), num_prune_layers=nprune)
    log.info("quantize draft int4 (consume bf16)...")
    q4 = quantize_model_weights(cp, bits=4, consume=True)
    del cp
    jax.block_until_ready(q4)
    log.info("live after draft int4: %.2f GiB",
             device_memory()["bytes_in_use"] / 2**30)
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # the 12.55 GiB bf16 rebuild next to the resident 2.89 GiB int4
        # tree OOMed the 16 GiB chip (first on-chip run of this script) —
        # park the draft in host RAM for the rebuild, one d2h/h2d round
        # trip OUTSIDE every timed wave (~2.9 GiB; the d2h leg dominates
        # when that direction is sick — it rides the already-paid warm-up)
        log.info("park int4 draft on host for the bf16 rebuild...")
        t_park = time.time()
        q4 = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), q4)
        log.info("parked (%.1f s)", time.time() - t_park)
    log.info("rebuild bf16 source (same key)...")
    cp, _, _ = synthetic_compressed_7b(
        config, jax.random.PRNGKey(1), num_prune_layers=nprune)
    log.info("quantize target int8 (consume bf16)...")
    q8 = quantize_model_weights(cp, bits=8, consume=True)
    del cp
    jax.block_until_ready(q8)
    if on_tpu:
        log.info("restore int4 draft to device...")
        q4 = jax.tree.map(jax.device_put, q4)
        jax.block_until_ready(q4)

    if jax.default_backend() == "tpu":
        log.info("live after target int8: %.2f GiB",
                 device_memory()["bytes_in_use"] / 2**30)
    rng = np.random.default_rng(seed)
    prompts = [rng.integers(1, config.vocab_size, size=prompt_len).tolist()
               for _ in range(batch)]
    kw = dict(num_pages=40, page_size=128, max_batch=batch,
              max_pages_per_seq=2, quantized_kv=True)

    out = {
        "model": "llama2-7b -> GRASP 5.46B (paper plan, random init)",
        "backend": jax.default_backend(),
        "batch": batch, "prompt_len": prompt_len, "max_new": max_new,
        "gamma": gamma,
        "target": f"compressed int8 weights ({_gib(q8)} GiB)",
        "draft": f"same compressed weights int4 ({_gib(q4)} GiB)",
        "kv": "int8 paged pools (shared allocator)",
        "note": ("wall-clock aggregate incl. the ~35-40 ms/dispatch axon "
                 "tunnel tax; the speculative macro-step is 2 dispatches for "
                 "~(accepted+1) tokens/row, the plain engine 1 per token."),
    }

    out.update(probe)  # h2d/d2h provenance (probed before model build)

    def wave(eng):
        """Submit one batch wave and drive it to completion on ``eng``."""
        rids = [eng.submit(p, max_new_tokens=max_new) for p in prompts]
        t0 = time.time()
        outs = eng.run()
        dt = time.time() - t0
        n_tok = sum(len(outs[r]) for r in rids)
        return [outs[r] for r in rids], n_tok, dt

    gammas = [int(g) for g in os.environ.get(
        "GRASP_BENCH_SPEC_GAMMAS", str(gamma)).split(",")]
    results = {}
    configs = [("plain", None)] + [(f"spec_g{g}", g) for g in gammas]
    for label, g in configs:
        # ONE engine per config: the jits live per instance, so the warmup
        # wave must run on the same engine that is timed — a fresh engine in
        # the timed region would recompile every prefill/decode/draft/verify
        # graph inside the measurement (minutes/shape through the axon
        # remote-compile tunnel) and the artifact would measure compilation.
        # gamma is a SHAPE of the draft/verify graphs, so each gamma is its
        # own engine + warmup wave.
        if g is None:
            eng = ServingEngine(q8, config, plan=cplan, **kw)
        else:
            eng = SpeculativeServingEngine(
                q8, config, q4, config, plan=cplan, draft_plan=cplan,
                gamma=g, **kw)
        log.info("%s: warmup wave (compiles all graphs)...", label)
        wave(eng)
        if g is not None:
            # acceptance_rate must cover only the measured wave
            eng.last_stats = {"chunks": 0, "drafted": 0, "accepted": 0}
        log.info("%s: timed wave (same engine, warm jits)...", label)
        outs, n_tok, dt = wave(eng)
        results[label] = outs
        out[f"{label}_tok_s_aggregate_wall"] = round(n_tok / dt, 1)
        out[f"{label}_wall_s"] = round(dt, 2)
        if g is not None:
            out[f"{label}_acceptance_rate"] = round(eng.acceptance_rate, 3)
            out[f"{label}_chunks"] = int(eng.last_stats.get("chunks", 0))
        out[f"hbm_gib_after_{label}"] = round(
            device_memory()["bytes_in_use"] / 2**30, 2)
        del eng
    out["draft_bytes_over_target"] = round(_bytes(q4) / _bytes(q8), 2)

    # Greedy speculation is target-identical by construction ONLY when the
    # verify-time logits equal decode-time logits bitwise (pinned on CPU by
    # tests/test_spec_paged.py). On the MXU the gamma-token chunked verify
    # forward and the one-token decode forward tile differently, so bf16
    # accumulation order differs and near-tie argmaxes can flip. Quantify
    # per gamma: rows identical + where they first diverge; surface length
    # mismatches explicitly instead of folding them into the stats.
    best = None
    for label, g in configs[1:]:
        plain, spec = results["plain"], results[label]
        rows_same = sum(p == s for p, s in zip(plain, spec))
        out[f"{label}_rows_identical"] = f"{rows_same}/{len(plain)}"
        mism = [(len(p), len(s)) for p, s in zip(plain, spec)
                if len(p) != len(s)]
        if mism:
            out[f"{label}_row_length_mismatches"] = mism
        first_div = [
            next((i for i, (a, b) in enumerate(zip(p, s)) if a != b),
                 min(len(p), len(s)))
            for p, s in zip(plain, spec) if p != s
        ]
        if first_div:
            out[f"{label}_first_divergence_tok_mean"] = round(
                float(np.mean(first_div)), 1)
        sp = round(out[f"{label}_tok_s_aggregate_wall"]
                   / out["plain_tok_s_aggregate_wall"], 2)
        out[f"{label}_speedup_wall"] = sp
        if best is None or sp > best[1]:
            best = (g, sp)
    out["best_gamma"], out["speedup_wall"] = best

    # ---- regime map: where does speculation WIN on this hardware? -------
    # Per macro-step the engine pays T_macro(g) = g*d + v wall (fused
    # g-token draft + chunked verify, 2 dispatches incl. tunnel tax) for
    # E(alpha, g) = (1 - alpha^(g+1)) / (1 - alpha) expected tokens/row
    # (standard greedy-speculation yield). Speedup = E * T_plain_step /
    # T_macro. With >=2 gammas, fit (d, v) from the measured macro-step
    # times and solve the crossover acceptance alpha* per gamma — the
    # random-init acceptance (int4 draft vs int8 target near-tie argmax
    # flips) sits well below alpha*; real weights' peaked logits sit above
    # it, which is exactly what this map quantifies.
    try:
        t_plain_step = out["plain_wall_s"] / max_new
        meas = []
        for label, g in configs[1:]:
            ch = out.get(f"{label}_chunks")
            if ch:
                # last_stats["chunks"] counts ROW-chunks (one per live row
                # per macro-step; the dispatches themselves are batched) —
                # batch-wide macro-steps = chunks / batch
                meas.append((g, out[f"{label}_wall_s"] / (ch / batch)))
        if len(meas) >= 2:
            A = np.array([[g, 1.0] for g, _ in meas])
            y = np.array([t for _, t in meas])
            (d_fit, v_fit), *_ = np.linalg.lstsq(A, y, rcond=None)
            grid = np.arange(0.30, 0.991, 0.05)
            rm = {"draft_ms_per_token_fit": round(float(d_fit) * 1e3, 2),
                  "verify_ms_per_macro_fit": round(float(v_fit) * 1e3, 2),
                  "plain_ms_per_step": round(t_plain_step * 1e3, 2)}
            for g in sorted({g for g, _ in meas}):
                t_macro = g * d_fit + v_fit
                su = [(round(float(a), 2),
                       round(float((1 - a ** (g + 1)) / (1 - a)
                                   * t_plain_step / t_macro), 2))
                      for a in grid]
                rm[f"speedup_vs_alpha_g{g}"] = su
                cross = next((a for a, s in su if s >= 1.0), None)
                rm[f"crossover_alpha_g{g}"] = cross
            out["regime_map"] = rm
    except Exception as e:  # the map must never sink the artifact
        out["regime_map_error"] = f"{type(e).__name__}: {e}"[:200]

    # best-gamma aliases (stable keys for bench.py / the smoke test)
    bl = f"spec_g{best[0]}"
    out["acceptance_rate"] = out.get(f"{bl}_acceptance_rate")
    out["spec_tok_s_aggregate_wall"] = out[f"{bl}_tok_s_aggregate_wall"]
    out["spec_wall_s"] = out[f"{bl}_wall_s"]
    agree = [sum(a == b for a, b in zip(p, s)) / max(len(p), 1)
             for p, s in zip(results["plain"], results[bl])]
    out["greedy_agreement_mean"] = round(float(np.mean(agree)), 4)
    out["outputs_identical"] = results["plain"] == results[bl]
    out["date"] = time.strftime("%Y-%m-%d")

    if not tiny:  # the smoke mode must never overwrite the chip artifact
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        path = os.path.join(repo, "BENCH_7B_SPEC.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        log.info("wrote %s", path)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
