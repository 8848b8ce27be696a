"""Text → image front-end for the text-to-3D path.

Behavioral parity: reference hy3dgen/text2image.py:30-81 (HunyuanDiTPipeline —
a diffusers HunyuanDiT text-to-image pipeline with PAG, 25 steps, pag_scale
1.3, 1024², fixed Chinese positive/negative prompt templates, seeded
generator, optional compile hook).

Backend resolution order:
  1. an explicit ``backend`` callable(prompt, negative_prompt, seed) → PIL,
  2. diffusers' ``AutoPipelineForText2Image`` when importable (the exact
     reference construction — PAG layers 16-19, fp16 on CUDA / fp32 on CPU),
  3. the ``HY3D_T2I_CMD`` environment hook: an external command invoked as
     ``$HY3D_T2I_CMD <prompt_file> <out.png>`` (serving deployments that run
     t2i as a sidecar service).
With none available the constructor raises with instructions.
"""

from __future__ import annotations

import os

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


def _diffusers_backend(model_path: str, device: str):
    import torch
    from diffusers import AutoPipelineForText2Image

    cuda = device.startswith("cuda") and torch.cuda.is_available()
    pipe = AutoPipelineForText2Image.from_pretrained(
        model_path,
        torch_dtype=torch.float16 if cuda else torch.float32,
        enable_pag=True,
        pag_applied_layers=["blocks.(16|17|18|19)"],
    ).to("cuda" if cuda else "cpu")

    @torch.no_grad()
    def run(prompt, negative_prompt, seed):
        generator = torch.Generator(device=pipe.device).manual_seed(int(seed))
        return pipe(prompt=prompt, negative_prompt=negative_prompt,
                    num_inference_steps=25, pag_scale=1.3, width=1024,
                    height=1024, generator=generator, return_dict=False)[0][0]

    run.pipe = pipe
    return run


def _jax_backend(ckpt_path):
    """The in-repo JAX-native HunyuanDiT pipeline (pipelines/t2i.py): real
    checkpoints when ``ckpt_path`` is a diffusers-layout directory, a tiny
    random-weight pipeline otherwise (smoke/demo flows)."""
    from hunyuan3d2_tpu.pipelines.t2i import HunyuanDiTJAXPipeline

    if ckpt_path:
        pipe = HunyuanDiTJAXPipeline.from_pretrained(str(ckpt_path))
    else:
        pipe = HunyuanDiTJAXPipeline.init_random(resolution=64,
                                                 num_inference_steps=4)

    def run(prompt, negative_prompt, seed):
        return pipe(prompt, seed=seed, negative_prompt=negative_prompt)

    run.pipe = pipe
    return run


def _command_backend(cmd: str):
    import subprocess
    import tempfile

    from PIL import Image

    def run(prompt, negative_prompt, seed):
        with tempfile.TemporaryDirectory() as td:
            pf = os.path.join(td, "prompt.txt")
            out = os.path.join(td, "out.png")
            with open(pf, "w") as fh:
                fh.write(f"{prompt}\n---negative---\n{negative_prompt}\n"
                         f"---seed---\n{seed}\n")
            subprocess.run([*cmd.split(), pf, out], check=True)
            return Image.open(out).convert("RGBA")

    return run


class HunyuanDiTPipeline:
    """Parity: reference text2image.py:30-81."""

    def __init__(self, model_path: str = "Tencent-Hunyuan/HunyuanDiT-v1.1-Diffusers-Distilled",
                 backend=None, device: str = "cpu"):
        self.model_path = model_path
        self.pos_txt = "," + POSITIVE_SUFFIX
        self.neg_txt = NEGATIVE_PROMPT
        if backend is None and os.path.isdir(
                os.path.join(str(model_path), "transformer")):
            # local diffusers-layout checkpoint → the JAX-native pipeline
            backend = _jax_backend(model_path)
        if backend is None:
            try:
                backend = _diffusers_backend(model_path, device)
            except ImportError:
                cmd = os.environ.get("HY3D_T2I_CMD", "")
                if cmd:
                    backend = _command_backend(cmd)
        if backend is None and os.environ.get("HY3D_RANDOM_WEIGHTS") == "1":
            backend = _jax_backend(None)   # tiny random-weight JAX pipeline
        if backend is None:
            raise RuntimeError(
                "No text-to-image backend available: no local HunyuanDiT "
                "checkpoint directory at model_path (JAX-native pipeline, "
                "pipelines/t2i.py), diffusers is not installed, HY3D_T2I_CMD "
                "is unset, and no backend callable was passed. Provide "
                "`backend=callable(prompt, negative_prompt, seed) -> "
                "PIL.Image`, a checkpoint path, or set HY3D_RANDOM_WEIGHTS=1 "
                "for a random-weight smoke pipeline."
            )
        self.backend = backend

    def compile(self):
        """Parity: text2image.py compile() — warms the backend."""
        pipe = getattr(self.backend, "pipe", None)
        if pipe is not None:
            import torch

            torch.set_float32_matmul_precision("high")
            pipe.transformer = torch.compile(pipe.transformer, fullgraph=True)
        return self

    def __call__(self, prompt: str, seed: int = 0):
        # reference: prompt truncated to 60 chars + fixed positive suffix
        full_prompt = prompt[:60] + self.pos_txt
        return self.backend(full_prompt, negative_prompt=self.neg_txt,
                            seed=seed)
