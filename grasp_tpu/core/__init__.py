from grasp_tpu.core.engine import GraspEngine  # noqa: F401
