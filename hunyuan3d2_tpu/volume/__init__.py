from hunyuan3d2_tpu.volume import decoders, surface  # noqa: F401
