"""On-chip benchmark: prefix caching + chunked prefill (serving admission).

Measures, on the real TPU with the TinyLlama-1.1B-class bf16 model:

  1. admission wall-clock of a long prompt (16 pages x 128 = 2047 tokens)
     COLD vs with a full prefix-cache HIT (only the 1-page suffix prefills) —
     the per-request saving every chat request with a shared system prompt
     gets (`ServingEngine(prefix_cache=True)`);
  2. the worst single engine-step wall-clock while that long prompt admits
     all-at-once vs chunked (`prefill_chunk=512`) — the head-of-line latency
     bound other requests in the batch see.

Writes BENCH_PREFIX.json; bench.py attaches it to the headline record as
details["prefix_recorded"]. Wall-clock of step() is meaningful here: every
admission ends in _pick_tokens, which materializes the picked token on host.
"""

import dataclasses
import json
import os
import time

import jax
import numpy as np


def main():
    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.models import init_params
    from grasp_tpu.models.llama import default_plan
    from grasp_tpu.serving.paged import ServingEngine

    config = ModelConfig.tinyllama_1_1b()
    config = dataclasses.replace(config, dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), config)
    jax.block_until_ready(params)
    plan = default_plan(config)

    rng = np.random.default_rng(0)
    PS, PAGES = 128, 16
    long_a = rng.integers(1, config.vocab_size, size=(PAGES * PS - 1,))
    long_b = rng.integers(1, config.vocab_size, size=(PAGES * PS - 1,))

    def make(**kw):
        return ServingEngine(params, config, plan, num_pages=64, page_size=PS,
                             max_batch=2, max_pages_per_seq=PAGES + 2, **kw)

    out = {"model": "tinyllama-1.1b (random init, bf16)",
           "backend": jax.default_backend(),
           "prompt_tokens": int(PAGES * PS - 1), "page_size": PS}

    if jax.default_backend() == "tpu":
        from grasp_tpu.perf import tunnel_health
        out.update(tunnel_health())  # h2d provenance (CLAUDE.md protocol)

    def timed_admit(srv, prompt):
        rid = srv.submit(prompt, 2)
        t0 = time.perf_counter()
        while not any(r is not None and r.rid == rid for r in srv._live):
            srv.step()
        dt = time.perf_counter() - t0
        while srv.has_work():
            srv.step()
        srv.collect()
        return dt

    # --- prefix cache: cold vs hit ---
    srv = make(prefix_cache=True)
    timed_admit(srv, long_b)   # compile warmup: cold path
    timed_admit(srv, long_b)   # compile warmup: hit path (gather + suffix)
    out["cold_admit_s"] = round(timed_admit(srv, long_a), 4)
    hits = [timed_admit(srv, long_a) for _ in range(3)]
    out["hit_admit_s"] = round(float(np.median(hits)), 4)
    out["prefix_tokens_saved"] = int(srv.prefix_tokens_saved)
    out["admit_speedup"] = round(out["cold_admit_s"] / out["hit_admit_s"], 2)
    out["note"] = ("wall times include the axon tunnel's ~30-40 ms/dispatch "
                   "tax on BOTH paths (cold: prefill+scatter+sample; hit: "
                   "gather+suffix-prefill+scatter+sample), so the chip-side "
                   "prefill saving is larger than the wall ratio shows")

    # --- chunked prefill: worst step latency during a long admission ---
    def worst_step(srv, prompt):
        # a short request decodes while the long prompt admits; the worst
        # step() wall is the head-of-line latency its tokens suffer
        short = rng.integers(1, config.vocab_size, size=(8,))
        rs = srv.submit(short, 24)
        srv.step()
        rid = srv.submit(prompt, 2)
        worst = 0.0
        while srv.has_work():
            t0 = time.perf_counter()
            srv.step()
            worst = max(worst, time.perf_counter() - t0)
            srv.collect()
        return worst

    srv = make()
    worst_step(srv, long_b)  # warmup compiles
    out["block_admit_worst_step_s"] = round(worst_step(srv, long_a), 4)
    srv = make(prefill_chunk=512)
    worst_step(srv, long_b)
    out["chunked_worst_step_s"] = round(worst_step(srv, long_a), 4)
    out["hol_latency_reduction"] = round(
        out["block_admit_worst_step_s"] / out["chunked_worst_step_s"], 2)
    out["date"] = time.strftime("%Y-%m-%d")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH_PREFIX.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
