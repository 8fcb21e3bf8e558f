from grasp_tpu.ops.saliency import (  # noqa: F401
    block_influence,
    bi_from_hiddens,
    adaptive_rank_selection,
    preserve_rank,
    svd_saliency,
    select_topk,
)
from grasp_tpu.ops.svd import (  # noqa: F401
    svd,
    truncate_svd,
    lowrank_factors,
    merge_svd,
    sigma_gradients,
)
from grasp_tpu.ops.lowrank import lowrank_apply, svd_apply, dense_apply  # noqa: F401
from grasp_tpu.ops.pallas_lowrank import fused_lowrank  # noqa: F401
from grasp_tpu.ops.pallas_attention import flash_attention  # noqa: F401
