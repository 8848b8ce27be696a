from hunyuan3d2_tpu.ops.nn import (
    Linear,
    dense,
    gelu_tanh,
    layer_norm,
    rms_norm,
    silu,
)
from hunyuan3d2_tpu.ops.embeddings import (
    fourier_embed,
    sincos_1d_pos_embed,
    timestep_embedding,
)
from hunyuan3d2_tpu.ops.attention import sdpa

__all__ = [
    "Linear",
    "dense",
    "gelu_tanh",
    "layer_norm",
    "rms_norm",
    "silu",
    "fourier_embed",
    "sincos_1d_pos_embed",
    "timestep_embedding",
    "sdpa",
]
