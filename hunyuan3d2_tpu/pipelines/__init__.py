from hunyuan3d2_tpu.pipelines import schedulers  # noqa: F401
