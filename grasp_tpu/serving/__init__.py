from grasp_tpu.serving.paged import PagePool, ServingEngine  # noqa: F401
from grasp_tpu.serving.server import GraspServer, serve  # noqa: F401
from grasp_tpu.serving.spec_paged import SpeculativeServingEngine  # noqa: F401
from grasp_tpu.serving.speculative import SpeculativeGenerator  # noqa: F401
