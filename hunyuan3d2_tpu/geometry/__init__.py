from hunyuan3d2_tpu.geometry.mesh import Mesh  # noqa: F401
