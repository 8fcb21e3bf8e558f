from grasp_tpu.models.llama import (  # noqa: F401
    PROJ_ORDER,
    ATTN_PROJS,
    MLP_PROJS,
    default_plan,
    plan_set,
    init_params,
    forward,
    init_kv_cache,
    decode_step,
    prefill,
    hf_causal_lm_loss,
)
from grasp_tpu.models.moe import (  # noqa: F401
    init_moe_params,
    moe_apply,
    router_weights,
)
