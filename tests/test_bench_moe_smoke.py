"""CPU smoke test of the MoE benchmark script.

Pins scripts/bench_moe.py's API usage (MoE compression through engine.run,
paged decode of the compressed stacked-expert model) so regressions are
caught by the suite, not first discovered during a chip run.
"""

import importlib.util
import os
import sys


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_bench_moe_tiny_smoke(monkeypatch):
    monkeypatch.setenv("GRASP_BENCH_MOE_TINY", "1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = os.path.join(repo, "BENCH_MOE.json")
    stamp = os.path.getmtime(artifact) if os.path.exists(artifact) else None
    mod = _load("bench_moe_smoke", os.path.join(repo, "scripts", "bench_moe.py"))
    out = mod.main()
    assert out["n_compressed_modules"] > 0
    # the redundant layer's stacked expert parts were compressed
    assert out["moe_modules"], out
    assert all("block_sparse_moe" in m for m in out["moe_modules"])
    assert out["params_after_b"] <= out["params_b"]
    dec = out["paged_decode_compressed"]
    assert "slope_error" not in dec, dec
    assert "engine_error" not in dec, dec
    assert dec["decode_tok_s_aggregate_device"] > 0
    assert dec["engine_tok_s_aggregate_wall"] > 0
    # tiny mode must never write the chip artifact
    now = os.path.getmtime(artifact) if os.path.exists(artifact) else None
    assert now == stamp
