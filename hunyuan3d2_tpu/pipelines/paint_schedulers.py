"""Schedulers for the paint (texture) diffusion model, as pure sigma tables.

Behavioral parity:
  * EulerAncestralDiscreteScheduler with zero-terminal-SNR rescaled betas,
    v-prediction, 'trailing' timestep spacing — the standard HunyuanPaint
    sampler (reference texgen/utils/multiview_utils.py:40-42; exact math
    documented at project/image3d/texture.py:18-136).
  * LCMScheduler — turbo path (multiview_utils.py:43-46; DDIM-solver index
    trick at hunyuanpaint/pipeline.py:598-603).

TPU-first: every quantity is a precomputed fp32 table; ``step`` is pure and
the pipeline scans over it (ancestral noise from explicit PRNG keys).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def make_betas(num_train_timesteps: int, beta_start: float, beta_end: float,
               beta_schedule: str = "scaled_linear") -> np.ndarray:
    """diffusers beta-schedule zoo (the three schedules the reference's
    checkpoints use)."""
    if beta_schedule == "scaled_linear":
        return np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                           num_train_timesteps) ** 2
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps)
    if beta_schedule == "squaredcos_cap_v2":
        t = np.arange(num_train_timesteps + 1) / num_train_timesteps
        f = np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
        return np.clip(1 - f[1:] / f[:-1], 0.0, 0.999)
    raise ValueError(f"unknown beta_schedule {beta_schedule!r}")


def alphas_cumprod_from_config(cfg: dict) -> np.ndarray:
    """scheduler_config.json dict → ᾱ table (for e.g. the x4 upscaler's
    separate low_res_scheduler, a DDPM with its own betas)."""
    betas = make_betas(cfg.get("num_train_timesteps", 1000),
                       cfg.get("beta_start", 0.0001),
                       cfg.get("beta_end", 0.02),
                       cfg.get("beta_schedule", "linear"))
    return np.cumprod(1.0 - betas)


def rescale_zero_terminal_snr(betas: np.ndarray) -> np.ndarray:
    """Shift the alpha-bar-sqrt schedule so SNR(T)=0 (Lin et al. 2023)."""
    alphas = 1.0 - betas
    abar_sqrt = np.sqrt(np.cumprod(alphas))
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    abar = abar_sqrt ** 2
    alphas = np.concatenate([abar[:1], abar[1:] / abar[:-1]])
    return 1.0 - alphas


@dataclasses.dataclass(frozen=True)
class EulerAncestralDiscreteScheduler:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "trailing"
    rescale_betas_zero_snr: bool = True
    steps_offset: int = 0

    def _alphas_cumprod(self) -> np.ndarray:
        betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                            self.num_train_timesteps) ** 2
        if self.rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        ac = np.cumprod(1.0 - betas)
        if self.rescale_betas_zero_snr:
            ac[-1] = 2 ** -24  # avoid inf sigma
        return ac

    def make_tables(self, num_inference_steps: int):
        """→ (timesteps [N] fp32 descending, sigmas [N+1] fp32 with final 0)."""
        t = self.num_train_timesteps
        if self.timestep_spacing == "trailing":
            step = t / num_inference_steps
            timesteps = np.round(np.arange(t, 0, -step)).astype(np.float64) - 1
        elif self.timestep_spacing == "leading":
            # SD1.5-era configs (e.g. InstructPix2Pix): integer step ratio,
            # ascending grid + steps_offset, reversed
            step = t // num_inference_steps
            timesteps = (np.arange(0, num_inference_steps) * step).round()[::-1]
            timesteps = timesteps.astype(np.float64) + self.steps_offset
        else:  # linspace
            timesteps = np.linspace(0, t - 1, num_inference_steps)[::-1]
        ac = self._alphas_cumprod()
        all_sigmas = np.sqrt((1 - ac) / ac)
        sigmas = np.interp(timesteps, np.arange(t), all_sigmas)
        sigmas = np.concatenate([sigmas, [0.0]]).astype(np.float32)
        return timesteps.astype(np.float32), sigmas

    @staticmethod
    def scale_model_input(sample, sigma):
        return sample / (sigma ** 2 + 1) ** 0.5

    def step(self, model_output, sample, sigma, sigma_next, noise):
        """One ancestral Euler step (all fp32 arrays / scalars).

        v-prediction: x₀ = −σ/√(σ²+1)·v + x/(σ²+1); epsilon: x₀ = x − σ·ε.
        """
        if self.prediction_type == "v_prediction":
            pred_x0 = model_output * (-sigma / (sigma ** 2 + 1) ** 0.5) \
                + sample / (sigma ** 2 + 1)
        elif self.prediction_type == "epsilon":
            pred_x0 = sample - sigma * model_output
        else:
            raise ValueError(self.prediction_type)
        sigma_up2 = sigma_next ** 2 * (sigma ** 2 - sigma_next ** 2) / (sigma ** 2)
        sigma_up = sigma_up2 ** 0.5
        sigma_down = (sigma_next ** 2 - sigma_up2) ** 0.5
        derivative = (sample - pred_x0) / sigma
        prev = sample + derivative * (sigma_down - sigma)
        return prev + noise * sigma_up, pred_x0


@dataclasses.dataclass(frozen=True)
class LCMScheduler:
    """Latent-consistency sampler for the paint-turbo checkpoints: x₀ jump +
    re-noising to the next discrete timestep (trailing spacing)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    prediction_type: str = "v_prediction"
    ddim_timesteps: int = 30

    def _alphas_cumprod(self) -> np.ndarray:
        betas = np.linspace(self.beta_start ** 0.5, self.beta_end ** 0.5,
                            self.num_train_timesteps) ** 2
        return np.cumprod(1.0 - betas)

    def make_tables(self, num_inference_steps: int, timesteps=None):
        t = self.num_train_timesteps
        if timesteps is None:
            # reference turbo rule (hunyuanpaint/pipeline.py:598-603 with
            # DDIMSolver built at :219-223 with ddim_timesteps=30): table
            # entry i is (i+1)*step_ratio-1 with step_ratio = 1000//30 = 33,
            # indexed by torch.range(29, 0, -3) → 10 timesteps
            # [989, 890, 791, 692, 593, 494, 395, 296, 197, 98].
            # round(linspace(29, 2, n)) reproduces that index set exactly at
            # n=10 and keeps the same [989, 98] noise window otherwise.
            k = t // self.ddim_timesteps
            table = (np.arange(1, self.ddim_timesteps + 1) * k) - 1
            index = np.round(np.linspace(29, 2,
                                         num_inference_steps)).astype(int)
            timesteps = table[index]
        timesteps = np.asarray(timesteps, np.int64)
        ac = self._alphas_cumprod()
        return timesteps.astype(np.float32), ac.astype(np.float32)

    def step(self, model_output, sample, t_int, t_next_int, alphas_cumprod, noise):
        ac_t = alphas_cumprod[t_int]
        sq_a, sq_1ma = ac_t ** 0.5, (1 - ac_t) ** 0.5
        if self.prediction_type == "v_prediction":
            pred_x0 = sq_a * sample - sq_1ma * model_output
        else:
            pred_x0 = (sample - sq_1ma * model_output) / sq_a
        # re-noise to next timestep (t_next 0 → return x0); jnp.where keeps
        # the step jittable with traced timesteps
        import jax.numpy as jnp

        ac_n = alphas_cumprod[t_next_int]
        renoised = ac_n ** 0.5 * pred_x0 + (1 - ac_n) ** 0.5 * noise
        return jnp.where(t_next_int > 0, renoised, pred_x0), pred_x0


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Deterministic DDIM (eta=0) for the x4 super-resolution pipeline
    (reference imagesuper_utils.py:19-34 → diffusers
    StableDiffusionUpscalePipeline's scheduler). Exact hyper-parameters come
    from the checkpoint's scheduler config at load; defaults are the SD2.x-
    era scaled-linear betas."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    prediction_type: str = "v_prediction"
    timestep_spacing: str = "leading"
    steps_offset: int = 1

    @classmethod
    def from_config(cls, cfg: dict) -> "DDIMScheduler":
        """Construct from a diffusers scheduler_config.json dict (subset of
        keys this implementation models)."""
        d = cls()
        return cls(
            num_train_timesteps=cfg.get("num_train_timesteps",
                                        d.num_train_timesteps),
            beta_start=cfg.get("beta_start", d.beta_start),
            beta_end=cfg.get("beta_end", d.beta_end),
            beta_schedule=cfg.get("beta_schedule", d.beta_schedule),
            prediction_type=cfg.get("prediction_type", d.prediction_type),
            timestep_spacing=cfg.get("timestep_spacing", d.timestep_spacing),
            steps_offset=cfg.get("steps_offset", d.steps_offset),
        )

    def alphas_cumprod(self) -> np.ndarray:
        betas = make_betas(self.num_train_timesteps, self.beta_start,
                           self.beta_end, self.beta_schedule)
        return np.cumprod(1.0 - betas)

    def make_tables(self, num_inference_steps: int):
        """→ (timesteps [N] int32 descending, alphas_cumprod [T] fp32)."""
        t = self.num_train_timesteps
        if self.timestep_spacing == "trailing":
            step = t / num_inference_steps
            timesteps = np.round(np.arange(t, 0, -step)) - 1
        elif self.timestep_spacing == "leading":
            step = t // num_inference_steps
            timesteps = ((np.arange(0, num_inference_steps) * step).round()
                         [::-1] + self.steps_offset)
        else:
            timesteps = np.linspace(0, t - 1, num_inference_steps)[::-1]
        return (timesteps.astype(np.int32),
                self.alphas_cumprod().astype(np.float32))

    def step(self, model_output, sample, t_int, t_prev_int, alphas_cumprod):
        """One eta=0 step; t_prev_int < 0 → ᾱ_prev = 1 (final step)."""
        import jax.numpy as jnp

        ac_t = alphas_cumprod[t_int]
        ac_prev = jnp.where(t_prev_int >= 0,
                            alphas_cumprod[jnp.maximum(t_prev_int, 0)], 1.0)
        sq_a, sq_1ma = ac_t ** 0.5, (1 - ac_t) ** 0.5
        if self.prediction_type == "v_prediction":
            pred_x0 = sq_a * sample - sq_1ma * model_output
            eps = sq_a * model_output + sq_1ma * sample
        elif self.prediction_type == "epsilon":
            pred_x0 = (sample - sq_1ma * model_output) / sq_a
            eps = model_output
        else:
            raise ValueError(self.prediction_type)
        return ac_prev ** 0.5 * pred_x0 + (1 - ac_prev) ** 0.5 * eps, pred_x0

    def add_noise(self, sample, noise, t_int, alphas_cumprod):
        ac = alphas_cumprod[t_int]
        return ac ** 0.5 * sample + (1 - ac) ** 0.5 * noise
