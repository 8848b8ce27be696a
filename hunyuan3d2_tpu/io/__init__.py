from hunyuan3d2_tpu.io import checkpoints  # noqa: F401
