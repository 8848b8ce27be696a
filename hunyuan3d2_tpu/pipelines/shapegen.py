"""Shape-generation pipelines (image → mesh), TPU-native.

Behavioral parity: reference hy3dgen/shapegen/pipelines.py
(Hunyuan3DDiTPipeline :131 — loading/config/offload plumbing;
Hunyuan3DDiTFlowMatchingPipeline :677 — the production flow-matching entry:
sigmas linspace(0,1,N) starting from 0 (:732), model time = σ (:846), CFG by
batch-doubling with [cond|uncond] order (:838, :849-851), guidance-embed
models skip CFG (:706-709), `_export` → VAE → volume decode → surface
extraction (:645-674)).

TPU-first:
  * the ENTIRE N-step denoise loop is a single jitted ``lax.scan`` — no
    per-step Python dispatch or host sync;
  * latents kept fp32 in the integrator, model runs bf16;
  * CFG pair is just batch dim 2B — data parallel over the mesh axis when
    sharded (parallel/sharding.py);
  * PRNG is explicit: pass ``key`` (or ``seed``) instead of a torch generator.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.models import conditioner as conditioner_lib
from hunyuan3d2_tpu.models import dit as dit_lib
from hunyuan3d2_tpu.models import shapevae as vae_lib
from hunyuan3d2_tpu.pipelines import schedulers as sched_lib
from hunyuan3d2_tpu.utils.imageproc import ImageProcessorV2
from hunyuan3d2_tpu.utils.logger import get_logger
from hunyuan3d2_tpu.utils.timer import timed_scope

logger = get_logger("hunyuan3d2_tpu.shapegen")


def export_to_trimesh(mesh_outputs):
    """Latent2MeshOutput(s) → Mesh(es) (parity: pipelines.py:95-110).
    Our surface extractors already emit the outward/post-flip winding, so no
    additional face flip is applied here."""
    from hunyuan3d2_tpu.geometry.mesh import Mesh

    def conv(m):
        return None if m is None else Mesh(m.mesh_v, m.mesh_f)

    if isinstance(mesh_outputs, list):
        return [conv(m) for m in mesh_outputs]
    return conv(mesh_outputs)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "do_cfg", "use_guidance_embed"),
)
def _sample_loop(params, cfg: dit_lib.DiTConfig, latents, cond, sigmas,
                 guidance_scale, do_cfg: bool, use_guidance_embed: bool):
    """One compiled program for the whole denoise loop.

    latents [B, L, C] fp32; cond [2B or B, Lc, D]; sigmas [N+1] fp32.
    """
    n_steps = sigmas.shape[0] - 1
    bsz = latents.shape[0]
    guidance = None
    if use_guidance_embed:
        guidance = jnp.full((cond.shape[0],), guidance_scale, jnp.float32)

    def body(lat, i):
        sigma = sigmas[i]
        sigma_next = sigmas[i + 1]
        inp = jnp.concatenate([lat, lat], axis=0) if do_cfg else lat
        t = jnp.full((inp.shape[0],), sigma, jnp.float32)
        v = dit_lib.apply(params, cfg, inp.astype(jnp.bfloat16), t,
                          cond, guidance).astype(jnp.float32)
        if do_cfg:
            v_cond, v_uncond = jnp.split(v, 2, axis=0)
            v = v_uncond + guidance_scale * (v_cond - v_uncond)
        lat = sched_lib.FlowMatchEulerDiscreteScheduler.step(lat, v, sigma, sigma_next)
        return lat, None

    latents, _ = jax.lax.scan(body, latents.astype(jnp.float32), jnp.arange(n_steps))
    return latents


class Hunyuan3DDiTPipeline:
    """Base pipeline: holds (DiT params/config, ShapeVAE, conditioner,
    scheduler, image processor). Loading entry points live in
    io/checkpoints.py; ``init_random`` builds a randomly-initialized stack
    for tests/benchmarks."""

    def __init__(self, vae: vae_lib.ShapeVAE, model_params, model_cfg: dit_lib.DiTConfig,
                 scheduler, conditioner, image_processor=None, **kwargs):
        self.vae = vae
        self.model_params = model_params
        self.model_cfg = model_cfg
        self.scheduler = scheduler
        self.conditioner = conditioner
        self.image_processor = image_processor or ImageProcessorV2()
        self.kwargs = kwargs

    # -- constructors ----------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_path: str, subfolder: str = "hunyuan3d-dit-v2-0",
                        variant: str = "fp16", **kwargs):
        from hunyuan3d2_tpu.io import checkpoints

        return checkpoints.load_pipeline(cls, model_path, subfolder, variant, **kwargs)

    @classmethod
    def from_single_file(cls, ckpt_path: str, config_path: str, **kwargs):
        from hunyuan3d2_tpu.io import checkpoints

        return checkpoints.load_pipeline_single_file(cls, ckpt_path, config_path, **kwargs)

    @classmethod
    def init_random(cls, key=None, size: str = "mini", guidance_embed: bool = False,
                    dino: str = "tiny", **kwargs):
        """Random-weight pipeline. ``dino='tiny'`` uses a small ViT config so
        CPU tests stay fast; 'giant' matches production."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        dit_cfg = {"tiny": dit_lib.TINY, "mini": dit_lib.MINI,
                   "full": dit_lib.FULL}[size]
        dit_cfg = dit_cfg if not guidance_embed else \
            dit_lib.DiTConfig(**{**dit_cfg.__dict__, "guidance_embed": True})
        vae_cfg = {"tiny": vae_lib.TINY, "mini": vae_lib.MINI,
                   "full": vae_lib.FULL}[size]
        if dino == "giant":
            dcfg = conditioner_lib.DinoEncoderConfig()
        else:
            from hunyuan3d2_tpu.models import dinov2

            image_size = 518 if dino == "tiny518" else 112
            dcfg = conditioner_lib.DinoEncoderConfig(
                dino=dinov2.DinoConfig(hidden_size=1536, num_layers=2, num_heads=24,
                                       patch_size=14, image_size=image_size,
                                       swiglu_hidden=256),
                image_size=image_size)
        cond = conditioner_lib.SingleImageEncoder(
            conditioner_lib.DinoImageEncoder.init_random(k3, dcfg))
        return cls(
            vae=vae_lib.ShapeVAE.init_random(k2, vae_cfg),
            model_params=jax.jit(dit_lib.init, static_argnums=1)(k1, dit_cfg),
            model_cfg=dit_cfg,
            scheduler=sched_lib.FlowMatchEulerDiscreteScheduler(),
            conditioner=cond,
        )

    # -- pieces ---------------------------------------------------------------
    def shard(self, mesh=None):
        """Distribute the pipeline over a device `Mesh` (NEW TPU capability,
        SURVEY.md §2.6 — the reference is single-GPU): transformer weights
        tensor-parallel over "tp" (Megatron column/row pairs,
        parallel/sharding.py), batch-like axes (the CFG pair, volume-decode
        query tiles) data-parallel over "dp". All jitted programs pick the
        layouts up from the param shardings (GSPMD); call sites are
        unchanged. With no argument, builds a mesh over all visible devices.
        """
        from hunyuan3d2_tpu.parallel import make_mesh, shard_params

        self.mesh = mesh if mesh is not None else make_mesh()
        self.model_params = shard_params(self.model_params, self.mesh)
        self.vae.params = shard_params(self.vae.params, self.mesh)
        main = self.conditioner.main
        main.params = shard_params(main.params, self.mesh)
        additional = getattr(self.conditioner, "additional", None)
        if additional is not None:
            additional.params = shard_params(additional.params, self.mesh)
        return self

    def enable_flashvdm(self, enabled: bool = True, adaptive_kv_selection=True,
                        topk_mode="mean", mc_algo="dmc", replace_vae: bool = False):
        """Parity: pipelines.py:254-294 (turbo VAE swap is a checkpoint-level
        concern; here it toggles the block-sparse/topk volume decoder)."""
        self.vae.enable_flashvdm_decoder(enabled=enabled, topk_mode=topk_mode,
                                         mc_algo=mc_algo)
        return self

    def compile(self):
        """Parity with the reference's torch.compile opt-in
        (pipelines.py:249-252). Under JAX everything on the hot path is
        already traced and compiled (sampling loop, volume decode, encoders
        are single jitted programs with a persistent on-disk cache), so this
        just warms the caches by no-op."""
        return self

    def _param_trees(self):
        trees = {"model": self.model_params, "vae": self.vae.params,
                 "cond": self.conditioner.main.params}
        additional = getattr(self.conditioner, "additional", None)
        if additional is not None:
            trees["cond2"] = additional.params
        return trees

    def _set_param_trees(self, trees):
        self.model_params = trees["model"]
        self.vae.params = trees["vae"]
        self.conditioner.main.params = trees["cond"]
        if "cond2" in trees:
            self.conditioner.additional.params = trees["cond2"]

    def offload_to_host(self):
        """Move every parameter tree to host memory (numpy), freeing HBM —
        the TPU equivalent of the reference's accelerate CPU offload
        (pipelines.py:330-398): on a shared/quota'd chip the shape stack
        (DiT + ShapeVAE + DINOv2-giant ≈ 3.5 GB bf16) and the paint stack
        (≈ 3.9 GB) may not fit together with their workspaces."""
        self._set_param_trees(jax.device_get(self._param_trees()))
        return self

    def restore_to_device(self):
        """Upload offloaded parameters back to the device (one transfer per
        tree; over the remote tunnel this is expensive — seconds/GB)."""
        self._set_param_trees(
            jax.tree_util.tree_map(jnp.asarray, self._param_trees()))
        return self

    def enable_model_cpu_offload(self, *args, **kwargs):
        """API parity with the reference's accelerate offload chain
        (pipelines.py:330-398 `conditioner->model->vae`): after each
        pipeline call the parameters are dropped back to host memory; the
        next call re-uploads them. Use offload_to_host()/restore_to_device()
        for explicit control (e.g. before loading the paint stack)."""
        self._auto_offload = True
        return self

    def prepare_image(self, image, mask=None) -> dict:
        return self.image_processor(image)

    def encode_cond(self, image_nhwc: np.ndarray, do_cfg: bool, view_idxs=None):
        """image_nhwc [-1,1] → conditioner tokens; CFG doubles the batch with
        the zero-token uncond embedding, [cond | uncond] order (parity:
        pipelines.py:419-451). Every tower of the conditioner is encoded with
        its OWN transform (Dual: dino 518 + clip 224, conditioner.py:80-89);
        the DiT consumes the 'main' stream (hunyuan3ddit.py:388), and any
        additional streams are kept on ``self.last_cond_streams`` for model
        variants that consume them."""
        streams = self.conditioner.encode_image(image_nhwc, view_idxs)
        if do_cfg:
            num_views = len(view_idxs[0]) if view_idxs is not None else 1
            uncond = self.conditioner.unconditional(
                streams["main"].shape[0], num_views)
            streams = {k: jnp.concatenate(
                [v, uncond[k].astype(v.dtype)], axis=0)
                for k, v in streams.items()}
        self.last_cond_streams = streams
        return streams["main"]

    def prepare_latents(self, batch_size: int, key) -> jax.Array:
        shape = (batch_size, self.vae.cfg.num_latents, self.vae.cfg.embed_dim)
        return jax.random.normal(key, shape, jnp.float32)

    def _export(self, latents, output_type="trimesh", box_v=1.01, mc_level=0.0,
                num_chunks=65536, octree_resolution=256, mc_algo="mc",
                enable_pbar=True):
        if output_type == "latents":
            return latents
        with timed_scope("Volume Decoding"):
            outputs = self.vae.latents2mesh(
                latents, octree_resolution=octree_resolution, mc_level=mc_level,
                num_chunks=num_chunks, mc_algo=mc_algo, box_v=box_v)
        if output_type == "raw":
            return outputs
        return export_to_trimesh(outputs)


class Hunyuan3DDiTFlowMatchingPipeline(Hunyuan3DDiTPipeline):
    """The production image→mesh entry point (parity: pipelines.py:677-861)."""

    def __call__(self, image=None, num_inference_steps: int = 50,
                 guidance_scale: float = 5.0, sigmas=None,
                 octree_resolution: int = 384, mc_level: float = 0.0,
                 mc_algo: str = "mc", num_chunks: int = 65536, box_v: float = 1.01,
                 seed: int = 0, key=None, output_type: str = "trimesh",
                 enable_pbar: bool = True, **kwargs):
        key = key if key is not None else jax.random.PRNGKey(seed)
        if getattr(self, "_auto_offload", False):
            self.restore_to_device()

        use_guidance_embed = self.model_cfg.guidance_embed
        do_cfg = guidance_scale >= 0 and not use_guidance_embed

        with timed_scope("Preprocess"):
            cond_inputs = self.prepare_image(image)
            img = cond_inputs["image"]
            view_idxs = cond_inputs.get("view_idxs")

        with timed_scope("Encode Cond"):
            cond = self.encode_cond(img, do_cfg, view_idxs)

        batch_size = img.shape[0] if view_idxs is None else 1
        sigmas_arr = jnp.asarray(
            self.scheduler.make_sigmas(num_inference_steps, sigmas))
        latents = self.prepare_latents(batch_size, key)

        with timed_scope("Diffusion Sampling"):
            latents = _sample_loop(
                self.model_params, self.model_cfg, latents, cond, sigmas_arr,
                jnp.float32(guidance_scale), do_cfg, use_guidance_embed)
            latents.block_until_ready()

        out = self._export(latents, output_type, box_v, mc_level, num_chunks,
                           octree_resolution, mc_algo, enable_pbar)
        if getattr(self, "_auto_offload", False):
            self.offload_to_host()
        return out
