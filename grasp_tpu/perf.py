"""Performance measurement: params / FLOPs / throughput / memory / profiling.

Replaces the reference's tools/time_func.py (which is broken as shipped — its
relative import and zero-arg __main__ call fail, time_func.py:8,77):

  - :func:`count_params` / :func:`estimate_forward_flops` — analytic counts
    per projection kind (dense vs low-rank), replacing calflops;
  - :func:`generation_benchmark` — tokens/sec + device memory for prefill and
    decode through the jitted KV-cache generator (reference eff_eval,
    time_func.py:32-68);
  - :func:`device_memory` — live/peak HBM bytes (replaces
    torch.cuda.memory_allocated / max_memory_allocated);
  - :func:`trace` — context manager around jax.profiler for TPU traces
    (the reference has no tracer at all, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from grasp_tpu.configs import ModelConfig
from grasp_tpu.models.llama import ATTN_PROJS, MLP_PROJS, ModelPlan, Params, default_plan

logger = logging.getLogger("grasp_tpu")


def _prime(fn, *args, **kwargs) -> None:
    """AOT-compile a jitted fn before its first dispatch.

    Same trap as core.engine._prime: on the axon runtime the jit
    compile-dispatch path retains a PERSISTENT copy of every large argument,
    so benchmarking a 7B-class model (10.9 GiB params) through a plain
    ``fn(params, ...)`` first call would double-resident the params and OOM.
    Lowering + compiling ahead of time populates the dispatch cache; the
    subsequent call is a cache hit with no copies. Best-effort.
    """
    try:
        fn.lower(*args, **kwargs).compile()
    except Exception as e:  # pragma: no cover - backend-dependent
        logger.debug("perf prime failed (falling back to dispatch): %s", e)


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def estimate_forward_flops(
    params: Params, config: ModelConfig, plan: Optional[ModelPlan] = None, seq_len: int = 1
) -> Dict[str, float]:
    """Analytic forward FLOPs/MACs per token-position times seq_len.

    Dense projection: 2*in*out per token; low-rank: 2*r*(in+out); attention
    score+value matmuls: 4*S*hd per head per query token (full causal window).
    """
    plan = plan or default_plan(config)
    d = config.hidden_size
    macs = 0.0
    for li, layer in enumerate(params["layers"]):
        groups = [("self_attn", ATTN_PROJS)]
        if "mlp" in layer:
            groups.append(("mlp", MLP_PROJS))
        for group, names in groups:
            for name in names:
                mod = layer[group][name]
                if "kernel" in mod or "kernel_q" in mod or "kernel_q4" in mod:
                    if "kernel_q4" in mod:  # nibble-packed: rows = in/2
                        p2, out_f = mod["kernel_q4"].shape
                        in_f = 2 * p2
                    else:
                        in_f, out_f = mod.get("kernel", mod.get("kernel_q")).shape
                    macs += in_f * out_f
                elif "in_kernel" in mod or "in_kernel_q" in mod or "in_kernel_q4" in mod:
                    if "in_kernel_q4" in mod:
                        in_f = 2 * mod["in_kernel_q4"].shape[0]
                        r = mod["in_kernel_q4"].shape[1]
                        out_f = mod["out_kernel_q4"].shape[1]
                        macs += r * (in_f + out_f)
                        continue
                    in_k = mod.get("in_kernel", mod.get("in_kernel_q"))
                    out_k = mod.get("out_kernel", mod.get("out_kernel_q"))
                    in_f, r = in_k.shape
                    macs += r * (in_f + out_k.shape[1])
                else:  # svd form
                    out_f, r = mod["u"].shape
                    in_f = mod["vh"].shape[1]
                    macs += r * (in_f + out_f) + r  # two matmuls + scale
        if "moe" in layer:
            # dense-MoE design: every expert computes every token
            # (models/moe.py); use config dims — robust across fp/int8/int4
            # (nibble-packed) expert storage
            ex = layer["moe"]["experts"]
            e = next(iter(ex.values())).shape[0]
            dd, f = config.hidden_size, config.intermediate_size
            macs += e * 3 * dd * f + dd * e  # experts + router gate
        # attention: q@k^T and probs@v, averaged causal window S/2
        macs += 2 * config.num_attention_heads * config.head_dim_ * (seq_len / 2)
    # embeddings out / lm head
    macs += d * config.vocab_size
    macs_total = macs * seq_len
    return {
        "params": count_params(params),
        "macs": macs_total,
        "flops": 2 * macs_total,
        "seq_len": seq_len,
    }


# High-water mark across device_memory() samples — the axon PJRT plugin
# returns None from memory_stats() (and device_memory_profile() fatally
# aborts the process — never call it there), so "peak" on that runtime is
# the max over explicit samples: call device_memory() at stage boundaries.
_hbm_peak_bytes: int = 0


def _live_device_bytes(device) -> int:
    """Sum of live jax.Array bytes resident on `device`.

    Fallback telemetry for runtimes without allocator stats. Uses ONLY
    sharding metadata — never touches shard *data*: on the axon runtime,
    accessing `shard.data` retains a persistent per-array copy, so a
    telemetry walk was silently duplicating the entire resident model
    (measured: a second 12.55 GiB of 7B params after each sampled stage,
    OOMing the compression pipeline it was meant to observe). Per-device
    bytes = shard_shape elements x itemsize when the device participates
    (exact for replicated and sharded layouts alike). Under-counts XLA temp
    buffers inside a running executable — combine with
    :func:`executable_memory` for those.
    """
    total = 0
    for arr in jax.live_arrays():
        try:
            sharding = arr.sharding
            if device not in sharding.device_set:
                continue
            shard_shape = sharding.shard_shape(arr.shape)
            n = 1
            for d in shard_shape:
                n *= int(d)
            total += n * arr.dtype.itemsize
        except Exception:  # deleted/donated arrays can race the walk
            continue
    return total


def device_memory(device=None) -> Dict[str, int]:
    """Live/peak HBM bytes for a device.

    Uses PJRT allocator stats when the runtime provides them; otherwise
    (axon) walks live arrays and maintains a process-level high-water mark
    across calls. Replaces torch.cuda.memory_allocated/max_memory_allocated
    (reference time_func.py:40-68).
    """
    global _hbm_peak_bytes
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)() or {}
    in_use = int(stats.get("bytes_in_use", 0))
    peak = int(stats.get("peak_bytes_in_use", 0))
    if in_use == 0 and peak == 0:  # allocator stats unavailable (axon)
        in_use = _live_device_bytes(device)
        _hbm_peak_bytes = max(_hbm_peak_bytes, in_use)
        peak = _hbm_peak_bytes
    return {
        "bytes_in_use": in_use,
        "peak_bytes_in_use": peak,
        "bytes_limit": int(stats.get("bytes_limit", 0)),
    }


def reset_hbm_peak() -> None:
    """Reset the sampled high-water mark (axon live-walk fallback only)."""
    global _hbm_peak_bytes
    _hbm_peak_bytes = 0


def tunnel_health(probe_mib: int = 32) -> Dict[str, float]:
    """Measure host->device transfer health for bench provenance.

    This container reaches its one TPU chip through an HTTP tunnel whose
    bandwidth swings wildly between runs (measured 73 -> 3 MB/s over four
    hours); a wall-clock number recorded without the tunnel state alongside
    it cannot be compared across runs. Every bench artifact should therefore
    carry ``h2d_mb_s_measured`` — call this once near the run and merge the
    dict into the artifact. Cheap: one warm-up + one ``probe_mib`` upload.
    """
    probe = np.zeros((probe_mib << 20,), np.uint8)
    jax.block_until_ready(jax.device_put(probe[: 1 << 20]))  # warm the path
    t0 = time.time()
    dev = jax.device_put(probe)
    jax.block_until_ready(dev)
    dt = max(time.time() - t0, 1e-9)
    out = {"h2d_mb_s_measured": round(probe.nbytes / dt / 2**20, 1)}
    # d2h moves the gram bases / grad offloads; its health is INDEPENDENT of
    # h2d through this tunnel (one direction has been seen sick while the
    # other measured healthy), so record both. Probe adaptively: two pilot
    # sizes (256 KiB + 2 MiB) first — when d2h is sick (0.2 MB/s measured
    # 2026-08-20) the full 32 MiB leg alone would cost ~160 s, which this
    # health check must not add to every bench process. Two sizes because
    # the tunnel charges a fixed ~35-40 ms latency PER CALL: a single tiny
    # pilot folds that latency into its bandwidth estimate and reads a
    # healthy 250+ MB/s direction as ~5-7 MB/s, wrongly postponing
    # transfer-heavy benches (advisor r4). The size delta cancels the
    # latency. Dedicated device_put pilot arrays, never a slice of a live
    # device array (eager slicing retains a persistent dispatch copy and
    # the first call pays a remote slice-compile — both axon traps).
    p_small = jax.device_put(np.zeros((1 << 18,), np.uint8))  # 256 KiB
    p_big = jax.device_put(np.zeros((1 << 21,), np.uint8))  # 2 MiB
    jax.block_until_ready((p_small, p_big))
    t0 = time.time()
    np.asarray(jax.device_get(p_small))
    small_s = max(time.time() - t0, 1e-9)
    t0 = time.time()
    np.asarray(jax.device_get(p_big))
    big_s = max(time.time() - t0, 1e-9)
    out["d2h_pilot_s"] = [round(small_s, 4), round(big_s, 4)]
    delta = big_s - small_s
    if delta > 1e-3:
        bw = (p_big.nbytes - p_small.nbytes) / delta  # latency-cancelled
    else:  # delta in timer noise: latency-dominated; whole-call lower bound
        bw = p_big.nbytes / big_s
    # Widen to the full probe only when the slope projects it affordable.
    # (A fast pilot does NOT guarantee a fast bulk leg — 2026-08-20 the
    # pilot passed and the 32 MiB get then crawled for minutes. Keep the
    # widen threshold strict; small payloads ride cheaper tunnel frames.)
    if probe_mib * 2**20 / bw < 2.0:
        t0 = time.time()
        np.asarray(jax.device_get(dev))
        out["d2h_mb_s_measured"] = round(
            probe.nbytes / max(time.time() - t0, 1e-9) / 2**20, 1)
    else:
        out["d2h_mb_s_measured"] = round(bw / 2**20, 2)
        out["d2h_probe_mib"] = 2.0
    return out


def executable_memory(compiled) -> Dict[str, int]:
    """XLA-reported memory footprint of a compiled executable.

    `compiled` is the result of `jax.jit(f).lower(*args).compile()`. The
    returned `peak_bytes` is the compiler's buffer-assignment peak — the
    authoritative HBM requirement of one invocation (arguments + outputs +
    live temporaries), independent of runtime telemetry.
    """
    ma = compiled.memory_analysis()
    peak = int(getattr(ma, "peak_memory_in_bytes", 0)) or (
        int(ma.argument_size_in_bytes)
        + int(ma.output_size_in_bytes)
        + int(ma.temp_size_in_bytes)
        - int(ma.alias_size_in_bytes)
    )
    return {
        "peak_bytes": peak,
        "argument_bytes": int(ma.argument_size_in_bytes),
        "output_bytes": int(ma.output_size_in_bytes),
        "temp_bytes": int(ma.temp_size_in_bytes),
        "alias_bytes": int(ma.alias_size_in_bytes),
        "code_bytes": int(ma.generated_code_size_in_bytes),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/grasp_tpu_trace"):
    """jax.profiler trace context — view with tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def generation_benchmark(
    params: Params,
    config: ModelConfig,
    plan: Optional[ModelPlan] = None,
    prompt_len: int = 128,
    gen_len: int = 128,
    warmup: int = 1,
    iters: int = 3,
    seed: int = 0,
) -> Dict[str, Any]:
    """Prefill + decode throughput and memory on the current default device.

    Reference counterpart: eff_eval's token/sec + CUDA memory probe
    (time_func.py:32-68).
    """
    from grasp_tpu.eval.generate import Generator

    rng = np.random.default_rng(seed)
    prompt = rng.integers(0, config.vocab_size, size=(prompt_len,))
    gen = Generator(params, config, plan)

    # warmup MUST use the same gen_len: the decode while_loop compiles per
    # (cache_len, max_new) and a mismatched warmup leaves the compile inside
    # the timed region
    for _ in range(warmup):
        gen.greedy(prompt, gen_len)

    t0 = time.time()
    n_tokens = 0
    for _ in range(iters):
        out = gen.greedy(prompt, gen_len)
        n_tokens += len(out)
    dt = time.time() - t0

    mem = device_memory()
    result = {
        "decode_tokens_per_s": n_tokens / dt,
        "total_time_s": dt,
        "tokens_generated": n_tokens,
        "prompt_len": prompt_len,
        "peak_hbm_gib": mem["peak_bytes_in_use"] / 2**30,
        "hbm_in_use_gib": mem["bytes_in_use"] / 2**30,
    }
    logger.info("generation benchmark: %s", result)
    return result


def decode_device_benchmark(
    params: Params,
    config: ModelConfig,
    plan: Optional[ModelPlan] = None,
    cache_len: int = 512,
    prefill_len: int = 64,
    k_small: int = 32,
    k_large: int = 96,
    reps: int = 5,
    batch: int = 1,
) -> Dict[str, Any]:
    """DEVICE-side decode cost via the two-length slope method.

    Times two on-device chained-decode loops (k_small and k_large greedy
    steps inside one jitted fori_loop, scalar-reduced so the tunnel cannot
    lie) and takes the slope: per-token time with the per-call dispatch
    latency subtracted out. On this container the axon tunnel charges
    ~35-40 ms per dispatched call, which at gen_len 128 inflates apparent
    decode time by ~0.3-40 ms/token depending on loop structure — the slope
    isolates what the chip actually does. Measured 1.1B bf16: 2.50 ms/tok =
    399 tok/s vs the 2.49 ms HBM roofline (2.04 GB / 819 GB/s) — decode is
    bandwidth-bound at speed-of-light; int8 1.43 ms/tok = 702 tok/s (93% of
    its 1.33 ms roofline).
    """
    import jax

    from grasp_tpu.models.llama import decode_step, init_kv_cache, prefill

    if plan is None:
        from grasp_tpu.models.llama import default_plan

        plan = default_plan(config)

    cache0 = init_kv_cache(config, batch=batch, max_len=cache_len)
    ids = jnp.ones((batch, prefill_len), jnp.int32)
    pf = jax.jit(lambda p, i, c: prefill(p, i, c, config=config, plan=plan))
    _prime(pf, params, ids, cache0)
    _, cache0 = pf(params, ids, cache0)

    def timed(k):
        @jax.jit
        def run(p, cache):
            def body(i, state):
                tok, cache, acc = state
                logits, cache = decode_step(
                    p, tok[:, None], cache, prefill_len + i,
                    config=config, plan=plan,
                )
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                return nxt, cache, acc + logits.astype(jnp.float32).sum()

            tok0 = jnp.ones((ids.shape[0],), jnp.int32)
            # use the passed-in cache, not the closure — closing over cache0
            # bakes the whole KV cache into the executable as a constant
            _, _, acc = jax.lax.fori_loop(0, k, body, (tok0, cache, jnp.float32(0)))
            return acc

        _prime(run, params, cache0)
        float(run(params, cache0))  # warm (cache hit after prime)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, cache0))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_small, t_large = timed(k_small), timed(k_large)
    per_tok_s = max((t_large - t_small) / (k_large - k_small), 1e-9)
    result = {
        "decode_ms_per_token_device": per_tok_s * 1e3,
        "decode_tokens_per_s_device": 1.0 / per_tok_s,
        "decode_tokens_per_s_aggregate": batch / per_tok_s,
        "per_call_overhead_ms": max(t_small - k_small * per_tok_s, 0.0) * 1e3,
        "k_small": k_small,
        "k_large": k_large,
        "batch": batch,
    }
    logger.info("device decode benchmark: %s", result)
    return result


def forward_device_benchmark(
    params: Params,
    config: ModelConfig,
    ids: jnp.ndarray,
    plan: Optional[ModelPlan] = None,
    labels: Optional[jnp.ndarray] = None,
    k_small: int = 1,
    k_large: int = 5,
    reps: int = 5,
) -> Dict[str, Any]:
    """DEVICE-side full-sequence forward cost via the two-length slope method.

    Same methodology as decode_device_benchmark: run k chained forwards
    inside ONE jitted fori_loop (each iteration re-derives its input ids from
    the previous logits so XLA cannot CSE the chain), scalar-reduce, and take
    the slope between k_small and k_large. On this container the axon tunnel
    charges ~30-40 ms per dispatched call, which a single-dispatch timing of
    a ~60-100 ms forward inflates by 30-50% — measured on the dense
    TinyLlama-1.1B at 8x511: 94 ms single-dispatch vs 62.8 ms slope
    (140.6 TFLOP/s = 71% MFU; the per-layer chained component sum — MLP
    1.50 ms at 186 TF/s, QKVO 0.47 ms at 164 TF/s, attention 0.68 ms — agrees
    with the slope to ~2%, so the slope is the chip's true time).

    labels: when given, each iteration also computes the HF causal-LM loss
    (the calibration-sweep forward's real epilogue) and folds it into the
    chained scalar.
    """
    import jax

    from grasp_tpu.models.llama import forward

    if plan is None:
        from grasp_tpu.models.llama import default_plan

        plan = default_plan(config)
    vocab = config.vocab_size

    def timed(k):
        @jax.jit
        def run(p, ids0):
            def body(_, state):
                ids_c, acc = state
                out = forward(p, ids_c, config=config, plan=plan)
                logits = out["logits"]
                if labels is not None:
                    from grasp_tpu.models.llama import hf_causal_lm_loss

                    acc = acc + hf_causal_lm_loss(logits, labels)
                else:
                    acc = acc + jnp.sum(logits.astype(jnp.float32)) * 1e-9
                # chain: derive the next ids from this iteration's logits
                bump = jnp.argmax(logits[:, :1, :32], axis=-1).astype(ids_c.dtype)
                return (ids_c + bump) % vocab, acc

            _, acc = jax.lax.fori_loop(0, k, body, (ids0, jnp.float32(0)))
            return acc

        _prime(run, params, ids)
        float(run(params, ids))  # warm (cache hit after prime)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(params, ids))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t_small, t_large = timed(k_small), timed(k_large)
    per_fwd_s = max((t_large - t_small) / (k_large - k_small), 1e-9)
    result = {
        "fwd_s_device": per_fwd_s,
        "per_call_overhead_ms": max(t_small - k_small * per_fwd_s, 0.0) * 1e3,
        "k_small": k_small,
        "k_large": k_large,
    }
    logger.info("device forward benchmark: %s", result)
    return result
