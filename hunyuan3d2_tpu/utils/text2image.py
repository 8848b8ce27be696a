"""Text → image front-end for the text-to-3D path.

Behavioral parity: reference hy3dgen/text2image.py:30-81 (HunyuanDiTPipeline —
a diffusers HunyuanDiT text-to-image pipeline with PAG and fixed Chinese
positive/negative prompt templates, optional torch.compile). diffusers is not
in this image; the class keeps the exact public surface and prompt plumbing
and accepts any callable backend (e.g. a JAX t2i model in a later round).
"""

from __future__ import annotations

POSITIVE_SUFFIX = (
    "白色背景,3D风格,最佳质量"  # white background, 3D style, best quality
)
NEGATIVE_PROMPT = (
    "文本,特写,裁剪,出框,最差质量,低质量,JPEG伪影,PGLY,重复,病态,"
    "残缺,多余的手指,变异的手,画得不好的手,画得不好的脸,变异,畸形,"
    "模糊,脱水,糟糕的解剖学,糟糕的比例,多余的肢体,克隆的脸,毁容,"
    "恶心的比例,畸形的肢体,缺失的手臂,缺失的腿,额外的手臂,额外的腿,"
    "融合的手指,手指太多,长脖子"
)


class HunyuanDiTPipeline:
    def __init__(self, model_path: str = "Tencent-Hunyuan/HunyuanDiT-v1.1-Diffusers-Distilled",
                 backend=None, device: str = "tpu"):
        self.model_path = model_path
        self.backend = backend
        if backend is None:
            raise NotImplementedError(
                "No text-to-image backend available in this build: diffusers "
                "is not installed and no JAX t2i model is bundled. Pass "
                "`backend=callable(prompt, negative_prompt, seed) -> PIL.Image`."
            )

    def compile(self):  # parity: text2image.py torch.compile hook
        return self

    def __call__(self, prompt: str, seed: int = 0):
        full_prompt = f"{prompt},{POSITIVE_SUFFIX}"
        return self.backend(full_prompt, negative_prompt=NEGATIVE_PROMPT, seed=seed)
