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
        spec_from_lm_eval_yaml({**base, "output_type": "loglikelihood"})
    with pytest.raises(ValueError, match="field reference"):
        spec_from_lm_eval_yaml({**base, "doc_to_target": "{{label + 1}}"})


# ---------------------------------------------------------------------------
# 0.3.0 non-multiple-choice protocols (r4 verdict #7): greedy_until,
# single-continuation loglikelihood, loglikelihood_rolling
# ---------------------------------------------------------------------------


class _Req:
    """Duck-typed lm-eval 0.3.0 Request (request_type + args)."""

    def __init__(self, request_type, args):
        self.request_type = request_type
        self.args = args


class _Fake030Base:
    def __init__(self, docs):
        self._docs = docs

    def has_validation_docs(self):
        return True

    def has_test_docs(self):
        return False

    def has_training_docs(self):
        return False

    def validation_docs(self):
        return iter(self._docs)


class Fake030GenTask(_Fake030Base):
    """0.3.0 greedy_until protocol with a fractional process_results metric."""

    def doc_to_text(self, doc):
        return f"Q: {doc['q']}\nA:"

    def doc_to_target(self, doc):
        return " " + doc["answer"]

    def construct_requests(self, doc, ctx):
        return [_Req("greedy_until", (ctx, ["\n"]))]

    def process_results(self, doc, results):
        got = results[0].strip().lower()
        want = doc["answer"].strip().lower()
        return {"f1": 1.0 if got == want else (0.5 if want in got else 0.0)}


class Fake030LoglikTask(_Fake030Base):
    def doc_to_text(self, doc):
        return doc["text"].rsplit(" ", 1)[0]

    def doc_to_target(self, doc):
        return " " + doc["text"].rsplit(" ", 1)[1]

    def construct_requests(self, doc, ctx):
        return _Req("loglikelihood", (ctx, self.doc_to_target(doc)))


class Fake030RollingTask(_Fake030Base):
    def doc_to_text(self, doc):
        return ""

    def doc_to_target(self, doc):
        return doc["page"]

    def construct_requests(self, doc, ctx):
        return [_Req("loglikelihood_rolling", (self.doc_to_target(doc),))]

    def count_words(self, text):
        return len(text.split())


def test_wrap_030_generation_task():
    docs = [{"q": "color of snow", "answer": "white"}]
    t = wrap_lm_eval_task(Fake030GenTask(docs), "fake_gen")
    assert getattr(t, "generation", False)
    assert t.stops == ("\n",)
    assert t.context(docs[0]) == "Q: color of snow\nA:"
    # scoring delegates to the live task's process_results (fractional ok)
    assert t.score(" white", docs[0]) == 1.0
    assert t.score(" white snow", docs[0]) == 0.5
    assert t.score(" black", docs[0]) == 0.0


def test_wrap_030_loglik_task():
    docs = [{"text": "the sky is blue"}]
    t = wrap_lm_eval_task(Fake030LoglikTask(docs), "fake_ll")
    assert getattr(t, "loglik", False)
    assert t.context(docs[0]) == "the sky is"
    assert t.target(docs[0]) == " blue"


def test_wrap_030_rolling_task():
    docs = [{"page": "one two  three"}]
    t = wrap_lm_eval_task(Fake030RollingTask(docs), "fake_roll")
    assert getattr(t, "rolling", False)
    assert t.text(docs[0]) == "one two  three"
    # word counting delegates to the task's own count_words (wikitext quirk)
    assert t.count_words("one two  three") == 3
    assert t.count_bytes("abc") == 3


def test_wrapped_tasks_evaluate_through_harness():
    """Wrapped generation/loglik/rolling tasks score end-to-end through
    evaluate_tasks on a tiny model — the same surface the reference gets
    from simple_evaluate (evaluate_grasp.py:222-229)."""
    import jax

    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.data.tokenizer import ByteTokenizer
    from grasp_tpu.eval.harness import TASK_REGISTRY, EvalLM, evaluate_tasks
    from grasp_tpu.models.llama import init_params

    config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
    params = init_params(jax.random.PRNGKey(0), config)
    lm = EvalLM(params, config, ByteTokenizer(vocab_size=config.vocab_size))

    gen_docs = [{"q": "ab", "answer": "xyzzy"}]
    ll_docs = [{"text": "the sky is blue"}, {"text": "grass is green"}]
    roll_docs = [{"page": "hello rolling world"}]
    TASK_REGISTRY["w_gen"] = wrap_lm_eval_task(Fake030GenTask(gen_docs), "w_gen")
    TASK_REGISTRY["w_ll"] = wrap_lm_eval_task(Fake030LoglikTask(ll_docs), "w_ll")
    TASK_REGISTRY["w_roll"] = wrap_lm_eval_task(
        Fake030RollingTask(roll_docs), "w_roll")
    try:
        res = evaluate_tasks(
            lm, ["w_gen", "w_ll", "w_roll"],
            docs_override={"w_gen": gen_docs, "w_ll": ll_docs,
                           "w_roll": roll_docs})
        assert set(res["w_gen"]) == {"acc"}
        assert set(res["w_ll"]) == {"acc", "ppl"}
        assert res["w_ll"]["ppl"] > 0
        assert set(res["w_roll"]) == {"word_perplexity", "byte_perplexity",
                                      "bits_per_byte"}
        assert res["w_roll"]["word_perplexity"] > 1.0
        assert res["w_roll"]["bits_per_byte"] > 0
    finally:
        for k in ("w_gen", "w_ll", "w_roll"):
            del TASK_REGISTRY[k]


def test_loglikelihood_rolling_matches_single_window():
    """EvalLM.loglikelihood_rolling == a single (empty-context) whole-text
    loglikelihood when the text fits one window, and window-splitting
    changes nothing but the batching (every token scored exactly once with
    one token of rolled context)."""
    import dataclasses

    import jax
    import numpy as np

    from grasp_tpu.configs import ModelConfig
    from grasp_tpu.data.tokenizer import ByteTokenizer
    from grasp_tpu.eval.harness import EvalLM
    from grasp_tpu.models.llama import init_params

    config = ModelConfig.tiny(num_hidden_layers=2, vocab_size=260)
    params = init_params(jax.random.PRNGKey(0), config)
    tok = ByteTokenizer(vocab_size=config.vocab_size)
    lm = EvalLM(params, config, tok)

    text = "the quick brown fox jumps"
    (ll_single, _), = lm.loglikelihood([("", text)])
    (ll_roll,) = lm.loglikelihood_rolling([text])
    assert np.isclose(ll_roll, ll_single, rtol=1e-4)

    # force multi-window rolling: same total, window boundaries move
    lm_small = EvalLM(params, config, tok, max_length=8)
    (ll_multi,) = lm_small.loglikelihood_rolling([text])
    n_tok = len(lm.tok_encode(text))
    assert n_tok > 8  # actually exercised the rolling path
    assert np.isfinite(ll_multi) and ll_multi < 0


def test_yaml_generate_until_and_rolling_convert():
    from grasp_tpu.eval.task_spec import make_task

    gen_cfg = {
        "task": "qa_gen",
        "output_type": "generate_until",
        "doc_to_text": "Q: {{question}}\nA:",
        "doc_to_target": "{{answer}}",
        "generation_kwargs": {"until": ["\n"]},
        "test_split": "test",
    }
    spec = spec_from_lm_eval_yaml(gen_cfg)
    task = make_task(spec)
    assert getattr(task, "generation", False)
    assert task.stops == ("\n",)
    doc = {"question": "2+2", "answer": "4"}
    assert task.context(doc) == "Q: 2+2\nA:"
    assert task.score("4", doc) and not task.score("5", doc)

    roll_cfg = {
        "task": "wikitext_like",
        "output_type": "loglikelihood_rolling",
        "doc_to_text": "",
        "doc_to_target": "{{page}}",
        "test_split": "test",
    }
    spec = spec_from_lm_eval_yaml(roll_cfg)
    task = make_task(spec)
    assert getattr(task, "rolling", False)
    assert task.text({"page": "some document"}) == "some document"
    assert task.count_words("a b  c") == 3

    with pytest.raises(ValueError, match="reference"):
        spec_from_lm_eval_yaml({**gen_cfg, "doc_to_target": "{{a | trim}}"})
    with pytest.raises(ValueError, match="stop strings"):
        spec_from_lm_eval_yaml(
            {**gen_cfg, "generation_kwargs": {"until": "\n"}})
