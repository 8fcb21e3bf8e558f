"""Measure (not assume) the v5e-8 projection divisors on the virtual 8-CPU mesh.

BENCH_7B.json projects the single-chip e2e onto a v5e-8 by dividing the sweep
stages by 8 (dp sharding) and the per-round selection by 3.5 (per-matrix
fan-out capped by matrices per round). Those divisors were arithmetic; this
script backs (or corrects) them with XLA's own per-partition cost model at a
mid-size config on a REAL 8-device mesh (virtual CPU devices — the standard
no-pod answer; GSPMD partitioning is identical on real chips):

  1. sweep division — lower the exact dense-grad sweep executable unsharded
     vs dp=8-sharded and compare the per-partition flops/bytes
     cost_analysis. GSPMD reports PER-PARTITION numbers, so the ratio IS the
     per-chip work division a pod would see.
  2. dispatch counts — run the engine end-to-end on the mesh and record the
     per-stage dispatch counts (stage_counts): compiles/dispatches do NOT
     divide, which the projection keeps serial.
  3. selection fan-out — per (round, shape) group of the paper plan, the
     gram eigh stack fans across devices only up to the group's width
     (ops/svd._device_svd_sharded semantics); compute the realized average
     division over the 7B paper plan's 14 rounds (the /3.5 claim) from the
     group structure actually produced by _gram_select_groups.

Writes V5E8_DIVISION.json at the repo root; bench_7b.py's projection note
cites it. CPU-only (~minutes):
    python scripts/measure_v5e8_division.py
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _cost(compiled):
    try:
        c = compiled.cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return {"flops": float(c.get("flops", 0.0)),
                "bytes": float(c.get("bytes accessed", 0.0))}
    except Exception as e:  # pragma: no cover - backend-dependent
        return {"error": str(e)[:120]}


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from grasp_tpu.configs import GraspConfig, ModelConfig
    from grasp_tpu.core.engine import (
        GraspEngine,
        _gram_select_groups,
        module_name,
    )
    from grasp_tpu.models.llama import init_params
    from grasp_tpu.parallel import make_mesh

    out = {"devices": jax.device_count(), "backend": jax.default_backend()}
    assert jax.device_count() == 8, "needs the 8-device virtual mesh"

    # mid-size config (not tiny): real GQA geometry, multi-layer plan
    config = ModelConfig.tiny(
        vocab_size=2048, hidden_size=512, intermediate_size=1408,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=2,
        max_position_embeddings=512)
    params = init_params(jax.random.PRNGKey(0), config)
    rng = np.random.default_rng(0)
    batch, seq, nbatches = 8, 128, 4
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (batch, seq))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (batch, seq))),
    } for _ in range(nbatches)]

    # ---- 1. sweep executable division (the /8 claim) --------------------
    engine = GraspEngine(jax.tree.map(jnp.array, params), config)
    split = (config.num_hidden_layers - 1,)
    names = [module_name(split[0], p) for p in ("gate_proj", "up_proj", "down_proj")]
    gf = engine._make_dense_grad_fn(engine.plan, split)
    k_dict = {n: engine._get_proj(n)["kernel"] for n in names}
    b0 = batches[0]
    args1 = (k_dict, engine.params, None, b0["input_ids"], None, b0["labels"], k_dict)
    c1 = gf.lower(*args1).compile()
    out["sweep_single"] = _cost(c1)

    mesh = make_mesh((8, 1))
    from grasp_tpu.parallel.mesh import shard_params

    sp = shard_params(jax.tree.map(jnp.array, params), mesh, config)
    eng8 = GraspEngine(sp, config, mesh=mesh)
    gf8 = eng8._make_dense_grad_fn(eng8.plan, split)
    kd8 = {n: eng8._get_proj(n)["kernel"] for n in names}
    dsh = NamedSharding(mesh, P("data", None))
    ids8 = jax.device_put(b0["input_ids"], dsh)
    lab8 = jax.device_put(b0["labels"], dsh)
    c8 = gf8.lower(kd8, eng8.params, None, ids8, None, lab8, kd8).compile()
    out["sweep_dp8"] = _cost(c8)
    if "flops" in out["sweep_single"] and "flops" in out["sweep_dp8"]:
        out["sweep_flops_division"] = round(
            out["sweep_single"]["flops"] / max(out["sweep_dp8"]["flops"], 1.0), 2)
        out["sweep_bytes_division"] = round(
            out["sweep_single"]["bytes"] / max(out["sweep_dp8"]["bytes"], 1.0), 2)

    # ---- 2. dispatch counts: mesh run end-to-end ------------------------
    cfg = GraspConfig(num_prune_layers=2, compression_ratio=0.5,
                      metric="taylor", grad_mode="dense")
    eng8.run(batches, cfg)
    out["mesh_stage_counts"] = dict(eng8.stage_counts)
    out["mesh_stage_times_s"] = {k: round(v, 2)
                                 for k, v in eng8.stage_times.items()}
    out["dispatch_note"] = (
        "stage_counts (graph dispatches per stage) are IDENTICAL on mesh and "
        "single device — compiles/dispatches do not divide; only per-"
        "partition work does. The projection keeps compile stages serial.")

    # ---- 3. selection fan-out realized by the 7B paper plan -------------
    # the gram eigh stacks fan across devices up to each group's width;
    # compute the average realized division over the paper plan's rounds
    cfg7 = ModelConfig.llama2_7b()
    shapes = {"q_proj": (4096, 4096), "k_proj": (4096, 4096),
              "v_proj": (4096, 4096), "o_proj": (4096, 4096),
              "gate_proj": (4096, 11008), "up_proj": (4096, 11008),
              "down_proj": (11008, 4096)}
    total_serial = 0.0   # eigh units if every matrix ran serially
    total_fanned = 0.0   # eigh units with per-group device fan-out (width-capped)
    rounds = []
    for lid in range(cfg7.num_hidden_layers - 1,
                     cfg7.num_hidden_layers - 8, -1):
        for block, projs in (("mlp", ("down_proj", "up_proj", "gate_proj")),
                             ("attention", ("q_proj", "k_proj", "v_proj", "o_proj"))):
            names_r = [module_name(lid, p) for p in projs]
            groups = _gram_select_groups(
                names_r, lambda n: shapes[n.rsplit(".", 1)[-1]], lambda n: 0.9)
            r_serial = r_fanned = 0.0
            for g_names, shape, _, _ in groups:
                m = min(shape[-2:])
                unit = (m / 4096.0) ** 3  # eigh cost ~ m^3
                r_serial += unit * len(g_names)
                # on a pod the stack shards across devices: ceil(width/8)
                # sequential eigh "waves" per group
                r_fanned += unit * -(-len(g_names) // 8)
            total_serial += r_serial
            total_fanned += r_fanned
            rounds.append({"layer": lid, "block": block,
                           "division": round(r_serial / max(r_fanned, 1e-9), 2)})
    out["selection_division_realized"] = round(total_serial / total_fanned, 2)
    out["selection_rounds"] = rounds[:4]
    out["selection_note"] = (
        "per-round gram-eigh fan-out capped by the round's matrix-group "
        "width (4 qkvo / 2-3 mlp per sequential round): the realized average "
        "division over the paper plan's 14 rounds — compare against the "
        "projection's /3.5")

    # parallel fast path: ALL 49 modules' grams form shape groups at once
    # (every 7B gram is 4096^2 — min-dim side), so the eigh stacks shard
    # across the 8 chips in ceil(width/8) waves
    all_names = [module_name(lid, p)
                 for lid in range(cfg7.num_hidden_layers - 1,
                                  cfg7.num_hidden_layers - 8, -1)
                 for p in shapes]
    groups_par = _gram_select_groups(
        all_names, lambda n: shapes[n.rsplit(".", 1)[-1]], lambda n: 0.0)
    # merge by shape (the precompute groups by shape only): count matrices
    by_shape = {}
    for g_names, shape, _, _ in groups_par:
        k = tuple(sorted(shape[-2:]))
        by_shape[k] = by_shape.get(k, 0) + len(g_names)
    ser = fan = 0.0
    for shp, cnt in by_shape.items():
        unit = (min(shp) / 4096.0) ** 3
        ser += unit * cnt
        fan += unit * -(-cnt // 8)
    out["selection_division_parallel"] = round(ser / fan, 2)
    out["selection_parallel_note"] = (
        "parallel mode precomputes every module's gram basis in one phase; "
        "same-gram-shape matrices (all 49 are 4096^2 at 7B) shard across "
        "the 8 chips in ceil(count/8) eigh waves")

    import time

    out["date"] = time.strftime("%Y-%m-%d")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "V5E8_DIVISION.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
