"""CPU smoke test of the 7B speculative-serving benchmark script.

Pins the script's API usage (engine reuse, consume-quantization, stats reset)
so regressions in scripts/bench_7b_spec.py or the spec-engine surfaces it
exercises are caught by the suite, not first discovered during a chip run.
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


def test_bench_spec_tiny_smoke(monkeypatch, tmp_path):
    monkeypatch.setenv("GRASP_BENCH_SPEC_TINY", "1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact = os.path.join(repo, "BENCH_7B_SPEC.json")
    stamp = os.path.getmtime(artifact) if os.path.exists(artifact) else None
    mod = _load("bench_7b_spec_smoke", os.path.join(repo, "scripts", "bench_7b_spec.py"))
    out = mod.main()
    for key in ("plain_tok_s_aggregate_wall", "spec_tok_s_aggregate_wall",
                "acceptance_rate", "speedup_wall", "greedy_agreement_mean"):
        assert key in out, key
    assert 0.0 <= out["acceptance_rate"] <= 1.0
    assert out["plain_tok_s_aggregate_wall"] > 0
    assert out["spec_tok_s_aggregate_wall"] > 0
    # tiny mode must never write the chip artifact
    now = os.path.getmtime(artifact) if os.path.exists(artifact) else None
    assert now == stamp
