"""lm-eval task ingestion (eval/lm_eval_compat.py): a live 0.3.0 task object
wraps into our harness Task, and 0.4-style YAML configs convert into our
declarative specs — arbitrary-task parity with the reference's
`simple_evaluate(tasks=[name])` forwarding (evaluate_grasp.py:222-229) is
mechanical whenever the library (or its config) is available."""

import pytest

from grasp_tpu.eval.harness import PIQA
from grasp_tpu.eval.lm_eval_compat import spec_from_lm_eval_yaml, wrap_lm_eval_task
from grasp_tpu.eval.task_spec import make_task

DOCS = [
    {"goal": "keep ice from melting", "choices": ["use a cooler", "use an oven"],
     "gold": 0},
    {"goal": "open a jar", "choices": ["twist the lid", "eat the jar"], "gold": 0},
]


class Fake030MCTask:
    """Minimal object following lm-eval 0.3.0's MultipleChoiceTask protocol."""

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def has_training_docs(self):
        return False

    def validation_docs(self):
        return iter(DOCS)

    def doc_to_text(self, doc):
        return f"Question: {doc['goal']}\nAnswer:"


def test_wrap_030_task_matches_hand_class_shapes():
    t = wrap_lm_eval_task(Fake030MCTask(), "fake_piqa")
    docs = t.docs()
    assert len(docs) == 2
    # 0.3.0 request layout: context once, " {choice}" per option
    assert t.context(docs[0]) == "Question: keep ice from melting\nAnswer:"
    assert t.choices(docs[0]) == [" use a cooler", " use an oven"]
    assert t.gold(docs[0]) == 0
    # fewshot joining inherits the pinned 0.3.0 "\n\n" format
    fs = t.fewshot_context(docs[1], [docs[0]])
    assert fs == ("Question: keep ice from melting\nAnswer: use a cooler"
                  "\n\nQuestion: open a jar\nAnswer:")


def test_wrap_rejects_non_mc_protocol():
    class NoDocToText:
        pass

    with pytest.raises(TypeError, match="doc_to_text"):
        wrap_lm_eval_task(NoDocToText(), "bad")

    class BadDocs(Fake030MCTask):
        def validation_docs(self):
            return iter([{"question": "q"}])  # no choices/gold

    with pytest.raises(TypeError, match="choices"):
        wrap_lm_eval_task(BadDocs(), "bad").docs()


def test_yaml_conversion_matches_hand_spec_on_piqa():
    """A PIQA-shaped 0.4 config converts to a spec whose rendered context/
    choices/gold equal the hand-written class on real-shaped docs."""
    cfg = {
        "task": "piqa_yaml",
        "output_type": "multiple_choice",
        "doc_to_text": "Question: {{goal}}\nAnswer:",
        "doc_to_choice": "{{endings}}",
        "doc_to_target": "{{label}}",
        "validation_split": "validation",
    }
    spec = spec_from_lm_eval_yaml(cfg)
    task = make_task(spec)
    hand = PIQA()
    doc = {"goal": "keep ice from melting", "sol1": "use a cooler",
           "sol2": "use an oven", "endings": ["use a cooler", "use an oven"],
           "label": 0}
    assert task.context(doc) == hand.context(doc)
    assert task.choices(doc) == hand.choices(doc)
    assert task.gold(doc) == hand.gold(doc)
    assert task.split_candidates == ("validation",)


def test_yaml_static_choices_and_static_gold():
    cfg = {
        "task": "yn",
        "doc_to_text": "{{question}}?",
        "doc_to_choice": [" no", " yes"],
        "doc_to_target": 1,
    }
    task = make_task(spec_from_lm_eval_yaml(cfg))
    doc = {"question": "is water wet"}
    assert task.context(doc) == "is water wet?"
    assert task.choices(doc) == [" no", " yes"]
    assert task.gold(doc) == 1


def test_yaml_rejects_code_bearing_configs():
    base = {"task": "t", "doc_to_text": "{{q}}", "doc_to_choice": [" a"],
            "doc_to_target": 0}
    with pytest.raises(ValueError, match="hand-written spec"):
        spec_from_lm_eval_yaml({**base, "doc_to_text": "{{q | upper}}"})
    with pytest.raises(ValueError, match="hand-written spec"):
        spec_from_lm_eval_yaml({**base, "doc_to_text": "{% if x %}y{% endif %}"})
    with pytest.raises(ValueError, match="hand spec"):
        spec_from_lm_eval_yaml({**base, "process_docs": object()})
    with pytest.raises(ValueError, match="not convertible"):
        spec_from_lm_eval_yaml({**base, "output_type": "generate_until"})
    with pytest.raises(ValueError, match="field reference"):
        spec_from_lm_eval_yaml({**base, "doc_to_target": "{{label + 1}}"})
