from hunyuan3d2_tpu.training.flow_match import flow_match_loss, make_train_step

__all__ = ["flow_match_loss", "make_train_step"]
