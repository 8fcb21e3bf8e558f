"""7B GRASP* recovery-training step benchmark on one v5e chip.

Completes the north-star story's third leg (compression: BENCH_7B.json,
serving: BENCH_7B_SERVING.json): recovery fine-tuning of the compressed
LLaMA-2-7B (paper plan — 7 low-rank layers at ratio 0.9) on a single 16 GiB
chip. Feasible ONLY with grad_scope="layers" (train/recover.py
make_subtree_train_step): the full-tree gradient pytree alone is a second
10.9 GiB resident. Differentiating just the redundant layers' subtree makes
grads ~0.3 GiB and keeps the 25 frozen layers inside forward scan stacks.

Measures per-optimizer-step wall time via the chained-slope method (the
fori_loop chains K steps on device, two chain lengths subtract the ~35-40 ms
axon dispatch tax — CLAUDE.md "Timing"), plus tokens/s and peak HBM. Random
init + synthetic batches: step time depends on shapes only.

Writes BENCH_7B_RECOVER.json; bench.py attaches it to the round artifact.
Run on an otherwise idle machine: python scripts/bench_7b_recover.py
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
log = logging.getLogger("bench7b_recover")


def main(micro_bs=None, seq=None, steps=(2, 6), reps=3):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_7b_serving import synthetic_compressed_7b

    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.perf import device_memory
    from grasp_tpu.train.recover import _subtree_split, make_optimizer

    micro_bs = int(micro_bs or os.environ.get("GRASP_BENCH_7B_RECOVER_BS", 4))
    seq = int(seq or os.environ.get("GRASP_BENCH_7B_RECOVER_SEQ", 512))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    config = dataclasses.replace(ModelConfig.llama2_7b(), dtype="bfloat16")
    log.info("build compressed 7B (paper plan)...")
    params, plan, redundant = synthetic_compressed_7b(config, jax.random.PRNGKey(0))
    jax.block_until_ready(params)

    optimizer = make_optimizer(3e-4, total_steps=1000, warmup_steps=100, mask=None)
    sub, _ = _subtree_split(params, tuple(redundant))
    opt_state = optimizer.init(sub)
    n_train = sum(int(x.size) for x in jax.tree.leaves(sub))
    n_total = sum(int(x.size) for x in jax.tree.leaves(params))

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, config.vocab_size, (micro_bs, seq)), jnp.int32)
    labels = jnp.asarray(np.where(rng.random((micro_bs, seq)) < 0.1, -100,
                                  rng.integers(1, config.vocab_size, (micro_bs, seq))),
                         jnp.int32)

    # chained K-step probe: K optimizer steps in ONE dispatch via fori_loop;
    # the two-length slope is the chip's true step time. The carry holds only
    # the trainable SUBTREE + opt state (~1.7 GiB) — carrying the full params
    # tree would double-resident the 10.9 GiB model and OOM; the frozen
    # layers ride along read-only as a jit argument. make_subtree_train_step
    # runs the identical math single-dispatch in recovery_train.
    from grasp_tpu.models.llama import forward, hf_causal_lm_loss
    import optax

    redundant_t = tuple(sorted(int(i) for i in redundant))
    train0, merge = _subtree_split(params, redundant_t)

    runs = {}
    for k in steps:
        @jax.jit
        def run(params, train0, opt_state, ids, labels, _k=k):
            def body(i, c):
                tr, s, acc = c

                def loss_fn(tr):
                    # scan_layers=False: the 25-layer stack temp (~10 GiB)
                    # next to the params would OOM (recover._auto_scan_layers
                    # makes the same call at these shapes)
                    logits = forward(
                        merge(tr, params), ids, config=config, plan=plan,
                        remat=True, scan_layers=False,
                        split_layers=redundant_t)["logits"]
                    return hf_causal_lm_loss(logits, labels)

                loss, grads = jax.value_and_grad(loss_fn)(tr)
                updates, s = optimizer.update(grads, s, tr)
                tr = optax.apply_updates(tr, updates)
                return (tr, s, acc + loss)

            _, _, acc = jax.lax.fori_loop(
                0, _k, body, (train0, opt_state, jnp.float32(0)))
            return acc
        runs[k] = run

    out = {
        "model": "llama2-7b compressed 5.46B (paper plan, random init, bf16)",
        "backend": jax.default_backend(),
        "grad_scope": "layers",
        "micro_bs": micro_bs, "seq": seq, "remat": True,
        "trainable_params_m": round(n_train / 1e6, 1),
        "total_params_b": round(n_total / 1e9, 3),
        "trainable_pct": round(100 * n_train / n_total, 2),
    }

    if jax.default_backend() == "tpu":
        from grasp_tpu.perf import tunnel_health
        out.update(tunnel_health())  # h2d provenance (CLAUDE.md protocol)

    times = {}
    for k in steps:
        log.info("compile chain k=%d ...", k)
        t0 = time.time()
        try:
            runs[k].lower(params, train0, opt_state, ids, labels).compile()
        except Exception as e:
            log.info("prime failed: %s", e)
        out[f"compile_{k}_s"] = round(time.time() - t0, 1)
        float(runs[k](params, train0, opt_state, ids, labels))  # warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(runs[k](params, train0, opt_state, ids, labels))
            ts.append(time.perf_counter() - t0)
        times[k] = float(np.median(ts))
        log.info("chain %d: %.3fs", k, times[k])

    k1, k2 = min(steps), max(steps)
    step_s = (times[k2] - times[k1]) / (k2 - k1)
    out["step_s_device"] = round(step_s, 4)
    out["tokens_per_s"] = round(micro_bs * seq / step_s, 1)
    out["per_call_overhead_ms"] = round((times[k1] - step_s * k1) * 1e3, 1)
    out["hbm_gib_after"] = round(device_memory()["bytes_in_use"] / 2**30, 2)
    # 1-epoch Alpaca extrapolation: ~52k examples, ~10.6M train tokens at the
    # reference's cutoff/packing — wall ~= tokens / tokens_per_s
    out["alpaca_epoch_est_min"] = round(10.6e6 / out["tokens_per_s"] / 60, 1)

    path = os.path.join(repo, "BENCH_7B_RECOVER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    log.info("wrote %s", path)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
