from grasp_tpu.eval.ppl import evaluate_perplexity, windowed_perplexity  # noqa: F401
from grasp_tpu.eval.generate import (  # noqa: F401
    Generator,
    SamplingGenerator,
    filter_logits,
    greedy_generate,
)
from grasp_tpu.eval.harness import EvalLM, evaluate_tasks, TASK_REGISTRY  # noqa: F401
from grasp_tpu.eval.task_spec import (  # noqa: F401
    load_task_specs,
    make_task,
    register_task_spec,
)
from grasp_tpu.eval.longbench import (  # noqa: F401
    FULL_LONGBENCH_DATASETS,
    SMALL_LONGBENCH_DATASETS,
    eval_longbench,
    scorer,
    scorer_e,
)
