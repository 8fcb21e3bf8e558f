"""Declarative task specs (eval/task_spec.py): the 8 built-in tasks
re-expressed as JSON must be BYTE-IDENTICAL to the hand-written golden
classes, and the generation task type must evaluate through greedy_until.
"""

import json
import os

import numpy as np
import pytest

import jax

from grasp_tpu.configs import ModelConfig
from grasp_tpu.data.tokenizer import ByteTokenizer
from grasp_tpu.eval.harness import TASK_REGISTRY, EvalLM, evaluate_tasks
from grasp_tpu.eval.task_spec import load_task_specs, make_task, register_task_spec
from grasp_tpu.models import init_params

SPEC_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "grasp_tpu", "eval", "task_specs.json",
)

# one synthetic doc per task, shaped like the real datasets
DOCS = {
    "boolq": {"passage": "The sky is blue.", "question": "is the sky blue", "answer": True},
    "piqa": {"goal": "open a jar", "sol1": "twist the lid", "sol2": "hit it", "label": 0},
    "hellaswag": {
        "activity_label": "Cooking",
        "ctx_a": "A man stirs a pot.",
        "ctx_b": "he adds [step] salt",
        "endings": ["then serves [A] it", "then leaves"],
        "label": 1,
    },
    "winogrande": {
        "sentence": "The trophy doesn't fit in the case because _ is too big.",
        "option1": "the trophy", "option2": "the case", "answer": "1",
    },
    "arc_easy": {
        "question": "What melts ice?",
        "choices": {"text": ["heat", "cold"], "label": ["A", "B"]},
        "answerKey": "A",
    },
    "openbookqa": {
        "question_stem": "Plants need",
        "choices": {"text": ["light", "rocks"], "label": ["A", "B"]},
        "answerKey": "A",
    },
    "mathqa": {
        "Problem": "2 + 2 = ?",
        "options": "a ) 3 , b ) 4 , c ) 5 , d ) 6 , e ) 7",
        "correct": "b",
    },
}
DOCS["arc_challenge"] = DOCS["arc_easy"]


# golden-class parity applies to the 8 hand-written tasks; spec-only library
# entries (lambada family) are pinned by their own tests below
_GOLDEN_SPECS = [s for s in json.load(open(SPEC_PATH)) if s["name"] in TASK_REGISTRY]
assert len(_GOLDEN_SPECS) == 8


@pytest.mark.parametrize("spec", _GOLDEN_SPECS, ids=lambda s: s["name"])
def test_spec_matches_golden_class(spec):
    """context/choices/gold/fewshot parity with the hand-written classes."""
    name = spec["name"]
    golden = TASK_REGISTRY[name]
    built = make_task(spec)
    doc = DOCS[name]

    assert built.context(doc) == golden.context(doc)
    assert built.choices(doc) == golden.choices(doc)
    assert built.gold(doc) == golden.gold(doc)
    assert built.has_acc_norm == golden.has_acc_norm

    shots = [doc, doc]
    assert built.fewshot_context(doc, shots) == golden.fewshot_context(doc, shots)

    if hasattr(golden, "requests"):  # winogrande partial evaluation
        ctx = golden.fewshot_context(doc, shots)
        assert built.requests(ctx, doc) == golden.requests(ctx, doc)


def test_load_task_specs_registers(tmp_path):
    spec = {
        "name": "my_copa",
        "type": "multiple_choice",
        "context": "{premise} because",
        "choices": {"fields": ["choice1", "choice2"], "prefix": " "},
        "gold": {"field": "label"},
    }
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    names = load_task_specs(str(p))
    assert names == ["my_copa"]
    assert "my_copa" in TASK_REGISTRY
    doc = {"premise": "it rained", "choice1": "clouds formed", "choice2": "sun shone", "label": 0}
    assert TASK_REGISTRY["my_copa"].context(doc) == "it rained because"
    assert TASK_REGISTRY["my_copa"].choices(doc) == [" clouds formed", " sun shone"]
    del TASK_REGISTRY["my_copa"]


def test_spec_task_evaluates_through_harness():
    """A spec-registered task runs through evaluate_tasks end-to-end."""
    register_task_spec({
        "name": "tiny_mc",
        "type": "multiple_choice",
        "has_acc_norm": True,
        "context": "Q: {q}\nA:",
        "choices": {"static": [" alpha", " beta"]},
        "gold": {"field": "label"},
    })
    try:
        config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
        params = init_params(jax.random.PRNGKey(0), config)
        lm = EvalLM(params, config, ByteTokenizer(vocab_size=config.vocab_size))
        docs = [{"q": f"item {i}", "label": i % 2} for i in range(4)]
        res = evaluate_tasks(lm, ["tiny_mc"], docs_override={"tiny_mc": docs})
        assert set(res["tiny_mc"]) == {"acc", "acc_norm"}
        assert 0.0 <= res["tiny_mc"]["acc"] <= 1.0
    finally:
        del TASK_REGISTRY["tiny_mc"]


def test_generation_task_golden():
    """Generation (greedy_until) task type: outputs are scored by the match
    rule; pinned against the model's actual greedy continuations."""
    register_task_spec({
        "name": "tiny_gen",
        "type": "generation",
        "context": "say: {word}",
        "target": {"field": "expect"},
        "stops": ["\n"],
        "match": "contains",
    })
    try:
        config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
        params = init_params(jax.random.PRNGKey(1), config)
        tok = ByteTokenizer(vocab_size=config.vocab_size)
        lm = EvalLM(params, config, tok)

        # golden: what the model actually generates for each context
        task = TASK_REGISTRY["tiny_gen"]
        docs = [{"word": "aa", "expect": ""}, {"word": "bb", "expect": ""}]
        gens = lm.greedy_until([(task.context(d), list(task.stops)) for d in docs])

        # expect="" matches everything under "contains" -> acc 1.0; expecting
        # the exact generated text also scores 1.0 under "exact"
        res = evaluate_tasks(lm, ["tiny_gen"], docs_override={"tiny_gen": docs})
        assert res["tiny_gen"]["acc"] == 1.0

        docs_exact = [{"word": w, "expect": g.strip()} for w, g in zip(("aa", "bb"), gens)]
        register_task_spec({
            "name": "tiny_gen",
            "type": "generation",
            "context": "say: {word}",
            "target": {"field": "expect"},
            "stops": ["\n"],
            "match": "exact",
        })
        res = evaluate_tasks(lm, ["tiny_gen"], docs_override={"tiny_gen": docs_exact})
        assert res["tiny_gen"]["acc"] == 1.0

        # and a wrong expectation scores 0
        docs_wrong = [{"word": "aa", "expect": "___definitely_not___"}]
        res = evaluate_tasks(lm, ["tiny_gen"], docs_override={"tiny_gen": docs_wrong})
        assert res["tiny_gen"]["acc"] == 0.0
    finally:
        del TASK_REGISTRY["tiny_gen"]


def test_lambada_spec_formatting():
    """The shipped lambada spec reproduces lm-eval 0.3.0's lambada format
    byte-for-byte: doc_to_text = text minus the final word, doc_to_target =
    " " + final word (lm_eval/tasks/lambada.py)."""
    specs = {s["name"]: s for s in json.load(open(SPEC_PATH))}
    for name in ("lambada", "lambada_openai"):
        task = make_task(specs[name])
        doc = {"text": "the quick brown fox jumps over the lazy dog"}
        assert task.context(doc) == "the quick brown fox jumps over the lazy"
        assert task.target(doc) == " dog"
        assert task.loglik and not task.has_acc_norm
        # few-shot context follows the 0.3.0 "<text><target>\n\n" join
        shot = {"text": "a b c"}
        assert task.fewshot_context(doc, [shot]) == (
            "a b c\n\n" + "the quick brown fox jumps over the lazy"
        )


def test_loglikelihood_task_golden_through_harness():
    """acc == is_greedy fraction and ppl == exp(-mean ll), both pinned
    against direct EvalLM.loglikelihood calls on the same requests."""
    import numpy as np

    specs = {s["name"]: s for s in json.load(open(SPEC_PATH))}
    register_task_spec(specs["lambada"])
    try:
        config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
        params = init_params(jax.random.PRNGKey(2), config)
        lm = EvalLM(params, config, ByteTokenizer(vocab_size=config.vocab_size))
        docs = [
            {"text": "aa bb cc dd"},
            {"text": "hello world again"},
            {"text": "x y"},
            {"text": "one two three four five"},
        ]
        task = TASK_REGISTRY["lambada"]
        reqs = [(task.context(d), task.target(d)) for d in docs]
        lls = lm.loglikelihood(reqs)
        want_acc = sum(int(g) for _, g in lls) / len(docs)
        want_ppl = float(np.exp(-np.mean([ll for ll, _ in lls])))

        res = evaluate_tasks(lm, ["lambada"], docs_override={"lambada": docs})
        assert set(res["lambada"]) == {"acc", "ppl"}
        assert res["lambada"]["acc"] == want_acc
        assert res["lambada"]["ppl"] == pytest.approx(want_ppl, rel=1e-6)
        # the task's acc participates in the cross-task mean like 0.3.0
        assert res["mean"] == pytest.approx(want_acc)
    finally:
        del TASK_REGISTRY["lambada"]


def test_unknown_task_falls_back_to_spec_library():
    """evaluate_tasks('lambada') works without explicit registration — the
    shipped spec library auto-registers on first lookup (open task surface)."""
    assert "lambada" not in TASK_REGISTRY
    try:
        config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
        params = init_params(jax.random.PRNGKey(3), config)
        lm = EvalLM(params, config, ByteTokenizer(vocab_size=config.vocab_size))
        docs = [{"text": "aa bb cc"}, {"text": "dd ee"}]
        res = evaluate_tasks(lm, ["lambada"], docs_override={"lambada": docs})
        assert set(res["lambada"]) == {"acc", "ppl"}
        with pytest.raises(KeyError, match="no_such_task"):
            evaluate_tasks(lm, ["no_such_task"], docs_override={"no_such_task": []})
    finally:
        TASK_REGISTRY.pop("lambada", None)
