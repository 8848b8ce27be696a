from hunyuan3d2_tpu.utils.logger import get_logger
from hunyuan3d2_tpu.utils.timer import synchronize_timer, timed_scope

__all__ = ["get_logger", "synchronize_timer", "timed_scope"]
