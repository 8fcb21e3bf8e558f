"""lm-eval task ingestion — arbitrary-task parity made mechanical.

The torch reference forwards ANY lm-eval 0.3.0 task name to the installed
library (`/root/reference/evaluate_grasp.py:222-229`), so it gets every
library task for free; our native harness ships the published-table tasks as
hand-written classes plus declarative JSON specs (eval/task_spec.py). This
module closes the residual surface two ways, with zero hard dependency on
the library (nothing here imports lm_eval at module scope — everything takes
task OBJECTS or parsed config dicts):

1. ``wrap_lm_eval_task(task, name)`` — adapt a LIVE lm-eval 0.3.0
   multiple-choice task object (anything following the 0.3.0
   ``MultipleChoiceTask`` protocol: processed docs carrying ``choices`` +
   ``gold``, ``doc_to_text``) into our harness's Task interface, so
   ``evaluate_tasks(..., tasks={name: wrap_lm_eval_task(t, name)})`` scores
   it through the one-dispatch TPU loglikelihood path with 0.3.0 semantics
   (request layout, acc/acc_norm, fewshot joining) — the same capability the
   reference gets from `simple_evaluate`, on the same precondition (the
   library is installed and can build the task).

2. ``spec_from_lm_eval_yaml(cfg)`` — convert an lm-eval 0.4-style YAML task
   config (the declarative successor format) into our JSON spec
   (eval/task_specs.json shape) for the common template subset:
   ``doc_to_text`` jinja field templates, ``doc_to_choice`` static lists or
   field references, ``doc_to_target`` field/index golds. Non-declarative
   configs (``!function`` hooks, jinja filters/conditionals) raise with a
   pointer to the hand-spec escape hatch.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

from grasp_tpu.eval.harness import Task

__all__ = ["wrap_lm_eval_task", "spec_from_lm_eval_yaml"]


class _WrappedLMEvalTask(Task):
    """Our harness Task backed by a live lm-eval 0.3.0 task object."""

    def __init__(self, lm_task: Any, name: str):
        self.name = name
        self._t = lm_task
        # 0.3.0 multiple-choice protocol: processed docs carry the option
        # strings under "choices" and the answer index under "gold";
        # doc_to_text renders the context. Anything else needs the
        # generation/loglikelihood spec path instead.
        for attr in ("doc_to_text",):
            if not callable(getattr(lm_task, attr, None)):
                raise TypeError(
                    f"{name}: not an lm-eval 0.3.0 task object (missing "
                    f"{attr}); pass the constructed task, not its name")
        self.has_acc_norm = True  # 0.3.0 MultipleChoiceTask reports both

    def docs(self, data_root: str = ".") -> List[dict]:
        t = self._t
        if getattr(t, "has_validation_docs", lambda: False)():
            docs = t.validation_docs()
        elif getattr(t, "has_test_docs", lambda: False)():
            docs = t.test_docs()
        else:
            raise ValueError(f"{self.name}: task has no validation/test docs")
        docs = list(docs)
        for d in docs[:1]:
            if "choices" not in d or "gold" not in d:
                raise TypeError(
                    f"{self.name}: docs lack 'choices'/'gold' — only 0.3.0 "
                    "MultipleChoiceTask-protocol tasks can be wrapped; write "
                    "a generation/loglikelihood spec (eval/task_spec.py) "
                    "for free-form tasks")
        return docs

    def train_docs(self, data_root: str = ".") -> Optional[List[dict]]:
        t = self._t
        if getattr(t, "has_training_docs", lambda: False)():
            return list(t.training_docs())
        return None

    def context(self, doc: dict) -> str:
        return self._t.doc_to_text(doc)

    def choices(self, doc: dict) -> List[str]:
        # 0.3.0 MultipleChoiceTask.construct_requests scores " {choice}"
        return [" " + c for c in doc["choices"]]

    def gold(self, doc: dict) -> int:
        return int(doc["gold"])


def wrap_lm_eval_task(lm_task: Any, name: str) -> Task:
    """Adapt a constructed lm-eval 0.3.0 multiple-choice task object."""
    return _WrappedLMEvalTask(lm_task, name)


# ---------------------------------------------------------------------------
# 0.4-style YAML config -> our JSON spec
# ---------------------------------------------------------------------------

_JINJA_FIELD = re.compile(r"\{\{\s*([A-Za-z_][\w.]*)\s*\}\}")
_JINJA_ANY = re.compile(r"\{[{%#]")


def _jinja_to_format(template: str, what: str) -> str:
    """`{{field}}` jinja -> str.format; reject code-bearing templates."""
    if not isinstance(template, str):
        raise ValueError(f"{what}: expected a template string, got "
                         f"{type(template).__name__} — non-declarative "
                         "configs need a hand-written spec (eval/task_spec.py)")
    stripped = _JINJA_FIELD.sub("", template)
    if "{" in stripped or "}" in stripped:
        raise ValueError(
            f"{what}: jinja beyond plain {{{{field}}}} holes ({template!r}) "
            "— filters/conditionals/function hooks need a hand-written spec "
            "(eval/task_spec.py)")
    return _JINJA_FIELD.sub(lambda m: "{" + m.group(1) + "}", template)


def spec_from_lm_eval_yaml(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a parsed lm-eval 0.4-style YAML task config into our spec.

    Supported subset (covers the library's plain multiple-choice configs):
      task (name), doc_to_text ({{field}} template), doc_to_choice (static
      string list | "{{field}}" list-field reference), doc_to_target (int |
      "{{field}}" int-field reference), test_split / validation_split.
    ``output_type`` must be multiple_choice (or absent). Everything else
    (``!function`` values arrive as non-strings from YAML loaders, jinja
    filters, process_docs hooks) raises ValueError.
    """
    name = cfg.get("task")
    if not name:
        raise ValueError("config has no 'task' name")
    out_type = cfg.get("output_type", "multiple_choice")
    if out_type != "multiple_choice":
        raise ValueError(
            f"{name}: output_type {out_type!r} is not convertible — write a "
            "generation/loglikelihood spec by hand (eval/task_spec.py)")
    if cfg.get("process_docs") is not None:
        raise ValueError(f"{name}: process_docs hooks are code, not data — "
                         "write a hand spec (eval/task_spec.py)")

    spec: Dict[str, Any] = {
        "name": name,
        "type": "multiple_choice",
        "context": _jinja_to_format(cfg["doc_to_text"], f"{name}.doc_to_text"),
    }

    splits = [s for s in (cfg.get("validation_split"), cfg.get("test_split"))
              if s]
    if splits:
        spec["split_candidates"] = splits

    choice = cfg.get("doc_to_choice")
    if isinstance(choice, list):
        if not all(isinstance(c, str) and not _JINJA_ANY.search(c)
                   for c in choice):
            raise ValueError(f"{name}: doc_to_choice list must be static "
                             "strings")
        spec["choices"] = {"static": choice}
    elif isinstance(choice, str):
        m = _JINJA_FIELD.fullmatch(choice.strip())
        if not m:
            raise ValueError(f"{name}: doc_to_choice {choice!r} is not a "
                             "plain field reference")
        spec["choices"] = {"field": m.group(1), "prefix": " "}
    else:
        raise ValueError(f"{name}: doc_to_choice must be a static list or a "
                         "{{field}} reference")

    target = cfg.get("doc_to_target")
    if isinstance(target, int):
        spec["gold"] = {"static": target}
    elif isinstance(target, str):
        m = _JINJA_FIELD.fullmatch(target.strip())
        if not m:
            raise ValueError(f"{name}: doc_to_target {target!r} is not a "
                             "plain field reference")
        spec["gold"] = {"field": m.group(1)}
    else:
        raise ValueError(f"{name}: doc_to_target must be an int index or a "
                         "{{field}} reference")

    # 0.4 semantics: acc_norm reported for multiple_choice
    spec["has_acc_norm"] = True
    return spec
