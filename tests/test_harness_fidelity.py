"""lm-eval 0.3.0 evaluation-loop fidelity, pinned by a hand-computed trace.

lm-eval isn't installable here (no network), so the 0.3.0 algorithm —
rnd=random.Random(42); rnd.shuffle(docs); limit; per-doc few-shot sampling
from the training split with the SAME rnd; "<text><target>" shots joined by
"\\n\\n" — is re-derived independently in this file (straight from the 0.3.0
evaluator.py/base.py control flow) and the harness's request stream is
asserted against it token for token.
"""

import random

import numpy as np
import pytest

from grasp_tpu.eval.harness import TASK_REGISTRY, evaluate_tasks

ARC_DOCS = [
    {"question": f"What is property {i} of water?",
     "choices": {"text": [f"answer A{i}", f"answer B{i}", f"answer C{i}", f"answer D{i}"],
                 "label": ["A", "B", "C", "D"]},
     "answerKey": "B"}
    for i in range(6)
]
ARC_TRAIN = [
    {"question": f"Train question {i}?",
     "choices": {"text": [f"train A{i}", f"train B{i}"], "label": ["A", "B"]},
     "answerKey": "A"}
    for i in range(5)
]


class RecordingLM:
    """Stands in for EvalLM: records the exact request stream, returns scores
    that make choice 1 ("B") win so acc is deterministic."""

    def __init__(self):
        self.requests = []

    def loglikelihood(self, requests):
        self.requests.extend(requests)
        return [((-1.0 if i % 4 == 1 else -5.0), False) for i in range(len(requests))]


def _expected_zero_shot(limit=None):
    """Hand-computed lm-eval 0.3.0 trace: shuffle with Random(42), limit,
    then (Question...Answer:, " <choice>") per choice."""
    rnd = random.Random()
    rnd.seed(42)
    docs = list(ARC_DOCS)
    rnd.shuffle(docs)
    if limit:
        docs = docs[:limit]
    reqs = []
    for d in docs:
        ctx = f"Question: {d['question']}\nAnswer:"
        for c in d["choices"]["text"]:
            reqs.append((ctx, " " + c))
    return reqs


def _expected_one_shot():
    """Hand-computed 0.3.0 trace with a training split: the same rnd that
    shuffled the docs then draws rnd.sample(train, 1) per doc, formatted
    "<text><gold target>\\n\\n<doc text>"."""
    rnd = random.Random()
    rnd.seed(42)
    docs = list(ARC_DOCS)
    rnd.shuffle(docs)
    reqs = []
    for d in docs:
        (shot,) = rnd.sample(ARC_TRAIN, 1)
        shot_txt = (
            f"Question: {shot['question']}\nAnswer:"
            + " " + shot["choices"]["text"][shot["choices"]["label"].index(shot["answerKey"])]
        )
        ctx = shot_txt + "\n\n" + f"Question: {d['question']}\nAnswer:"
        for c in d["choices"]["text"]:
            reqs.append((ctx, " " + c))
    return reqs


def test_zero_shot_request_stream_matches_030_trace():
    lm = RecordingLM()
    res = evaluate_tasks(lm, ["arc_easy"], docs_override={"arc_easy": ARC_DOCS})
    assert lm.requests == _expected_zero_shot()
    assert res["arc_easy"]["acc"] == 1.0  # scorer rigged to pick "B" (gold)


def test_limit_takes_seeded_random_subset():
    """0.3.0 shuffles BEFORE limit: a limited run is a seeded subset, not the
    first N rows."""
    lm = RecordingLM()
    evaluate_tasks(lm, ["arc_easy"], docs_override={"arc_easy": ARC_DOCS}, limit=2)
    expected = _expected_zero_shot(limit=2)
    assert lm.requests == expected
    first_two_unshuffled = {ARC_DOCS[0]["question"], ARC_DOCS[1]["question"]}
    got_questions = {r[0].split("\n")[0][len("Question: "):] for r in lm.requests}
    assert got_questions != first_two_unshuffled  # seed 42 reorders this set


def test_one_shot_samples_training_split_with_shared_rnd():
    lm = RecordingLM()
    evaluate_tasks(
        lm, ["arc_easy"], num_fewshot=1,
        docs_override={"arc_easy": ARC_DOCS, "arc_easy:train": ARC_TRAIN},
    )
    assert lm.requests == _expected_one_shot()


def test_one_shot_fallback_without_training_split():
    """No train split: 0.3.0 samples k+1 eval docs, filters the current doc,
    keeps k — shots never include the scored doc."""
    lm = RecordingLM()
    evaluate_tasks(lm, ["arc_easy"], num_fewshot=1, docs_override={"arc_easy": ARC_DOCS})
    for ctx, _ in lm.requests:
        shot, scored = ctx.split("\n\n")
        assert shot.split("\n")[0] != scored.split("\n")[0]


def test_acc_norm_byte_length_normalization():
    """acc_norm = argmax(ll / utf-8 byte len): a long gold answer with a worse
    total ll but a better per-byte ll loses raw acc and wins acc_norm."""
    docs = [{
        "question": "pick",
        "choices": {"text": ["aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "bb"],
                    "label": ["A", "B"]},
        "answerKey": "A",
    }]

    class LM:
        def loglikelihood(self, requests):
            # gold long answer (40 bytes incl. leading space): -20 total, -0.5/byte
            # wrong short answer (3 bytes): -6 total, -2/byte
            return [(-20.0, False), (-6.0, False)]

    res = evaluate_tasks(LM(), ["arc_easy"], docs_override={"arc_easy": docs})
    assert res["arc_easy"]["acc"] == 0.0          # raw argmax picks the short one
    assert res["arc_easy"]["acc_norm"] == 1.0     # per-byte argmax picks gold


def test_acc_norm_present_only_where_030_defines_it():
    lm = RecordingLM()
    boolq = [{"passage": "p", "question": "q", "answer": True}]
    wino = [{"sentence": "a _ b.", "option1": "x", "option2": "y", "answer": "1"}]
    res = evaluate_tasks(
        lm, ["boolq", "winogrande"],
        docs_override={"boolq": boolq, "winogrande": wino},
    )
    assert "acc_norm" not in res["boolq"]
    assert "acc_norm" not in res["winogrande"]


def test_winogrande_fewshot_appends_gold_and_pops():
    """0.3.0 winogrande: the few-shot context ends with the GOLD-filled doc
    text; construct_requests pops it and splices each option's partial
    context; target is ' ' + suffix.strip()."""
    lm = RecordingLM()
    wino = [
        {"sentence": f"The item {i} broke because _ was heavy.",
         "option1": f"thing{i}", "option2": f"other{i}", "answer": "1"}
        for i in range(4)
    ]
    evaluate_tasks(lm, ["winogrande"], num_fewshot=1, docs_override={"winogrande": wino})

    rnd = random.Random()
    rnd.seed(42)
    docs = list(wino)
    rnd.shuffle(docs)
    expected = []
    for d in docs:
        sampled = rnd.sample(wino, 2)
        (shot,) = [x for x in sampled if x != d][:1]
        prefix_s = shot["sentence"][: shot["sentence"].index("_")]
        suffix_s = shot["sentence"][shot["sentence"].index("_") + 1 :]
        shot_txt = prefix_s + shot["option1"] + " " + suffix_s.strip()
        prefix_d = d["sentence"][: d["sentence"].index("_")]
        suffix_d = d["sentence"][d["sentence"].index("_") + 1 :]
        for opt in (d["option1"], d["option2"]):
            expected.append((shot_txt + "\n\n" + prefix_d + opt, " " + suffix_d.strip()))
    assert lm.requests == expected
