"""CPU smoke test of the 1.1B speculative-serving benchmark script.

Same pattern as tests/test_bench_spec_smoke.py (the 7B variant): run the
script's real code path at toy shapes so regressions in scripts/bench_spec.py
— engine reuse across waves, stats reset before the timed wave, the greedy
divergence statistics — are caught by the suite, not first discovered during
a chip run.
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


def test_bench_spec_1b_tiny_smoke(monkeypatch):
    monkeypatch.setenv("GRASP_BENCH_SPEC_TINY", "1")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = _load("bench_spec_smoke", os.path.join(repo, "scripts", "bench_spec.py"))
    out = mod.run_spec_bench()
    for key in ("plain_tok_s_aggregate", "spec_tok_s_aggregate",
                "acceptance_rate", "speedup", "rows_identical",
                "outputs_identical"):
        assert key in out, key
    assert 0.0 <= out["acceptance_rate"] <= 1.0
    assert out["plain_tok_s_aggregate"] > 0
    assert out["spec_tok_s_aggregate"] > 0
    rows_same, rows_total = map(int, out["rows_identical"].split("/"))
    assert 0 <= rows_same <= rows_total
    # on CPU the verify/decode logits are bitwise-equal, so greedy spec is
    # exactly target-identical (the MXU tile-shape caveat is TPU-only)
    assert out["outputs_identical"] and rows_same == rows_total
    # divergence stats only appear when rows diverge
    assert "first_divergence_tok_mean" not in out
