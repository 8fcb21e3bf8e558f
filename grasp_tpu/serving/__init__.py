from grasp_tpu.serving.paged import PagePool, ServingEngine  # noqa: F401
