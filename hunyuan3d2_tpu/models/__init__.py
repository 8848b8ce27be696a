from hunyuan3d2_tpu.models import dit, dinov2, shapevae, conditioner  # noqa: F401
