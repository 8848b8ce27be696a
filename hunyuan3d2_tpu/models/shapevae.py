"""ShapeVAE (decoder-only vector-set VAE), TPU-native.

Behavioral parity: reference hy3dgen/shapegen/models/autoencoders/model.py
(ShapeVAE :132, forward :186, latents2mesh :105) and attention_blocks.py
(Transformer :397, CrossAttentionDecoder :435, QKV(Cross)Attention with
per-head LayerNorm qk-norm). Production config (project/image3d/shape.py:31-47):
num_latents 512 (mini) / 3072 (v2-0), embed_dim 64, width 1024, heads 16,
16 decoder layers, scale_factor 1.0188137142395404, fourier num_freqs 8.

TPU-first design:
  * ``post_kl`` + 16-layer self-attention transformer is one jitted call;
  * the geo decoder's cross-attention K/V over latent tokens is computed ONCE
    per mesh (parity with the reference kv_cache, attention_blocks.py:246-257)
    and passed as a constant into the per-chunk query decode;
  * query decoding is a pure fixed-shape function [B, P, 3] → [B, P, 1] that
    the volume decoders (volume/decoders.py) map over grid tiles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.attention import attention, merge_heads
from hunyuan3d2_tpu.ops.embeddings import fourier_embed, fourier_out_dim
from hunyuan3d2_tpu.ops.nn import Linear, gelu_exact, layer_norm

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ShapeVAEConfig:
    num_latents: int = 512
    embed_dim: int = 64
    width: int = 1024
    heads: int = 16
    num_decoder_layers: int = 16
    num_freqs: int = 8
    include_pi: bool = False
    scale_factor: float = 1.0188137142395404
    geo_decoder_mlp_expand_ratio: int = 4
    out_channels: int = 1
    qkv_bias: bool = False
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


MINI = ShapeVAEConfig(num_latents=512)
FULL = ShapeVAEConfig(num_latents=3072)
# CI-scale config (tests / smoke)
TINY = ShapeVAEConfig(num_latents=64, width=128, heads=4, num_decoder_layers=2)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------
def _init_self_block(key, cfg: ShapeVAEConfig):
    w = cfg.width
    ks = jax.random.split(key, 4)
    return {
        "ln_1_scale": jnp.ones((w,), jnp.float32),
        "ln_1_bias": jnp.zeros((w,), jnp.float32),
        "c_qkv": Linear.init(ks[0], w, 3 * w, bias=cfg.qkv_bias),
        "q_norm_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "q_norm_bias": jnp.zeros((cfg.head_dim,), jnp.float32),
        "k_norm_scale": jnp.ones((cfg.head_dim,), jnp.float32),
        "k_norm_bias": jnp.zeros((cfg.head_dim,), jnp.float32),
        "c_proj": Linear.init(ks[1], w, w),
        "ln_2_scale": jnp.ones((w,), jnp.float32),
        "ln_2_bias": jnp.zeros((w,), jnp.float32),
        "mlp_fc": Linear.init(ks[2], w, 4 * w),
        "mlp_proj": Linear.init(ks[3], 4 * w, w),
    }


def init(key, cfg: ShapeVAEConfig = MINI):
    w = cfg.width
    ks = jax.random.split(key, 9)
    blocks = [_init_self_block(k, cfg) for k in jax.random.split(ks[0], cfg.num_decoder_layers)]
    qdim = fourier_out_dim(3, cfg.num_freqs)
    return {
        "post_kl": Linear.init(ks[1], cfg.embed_dim, w),
        "transformer": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "geo_decoder": {
            "query_proj": Linear.init(ks[2], qdim, w),
            "ln_1_scale": jnp.ones((w,), jnp.float32),
            "ln_1_bias": jnp.zeros((w,), jnp.float32),
            "ln_2_scale": jnp.ones((w,), jnp.float32),
            "ln_2_bias": jnp.zeros((w,), jnp.float32),
            "c_q": Linear.init(ks[3], w, w, bias=cfg.qkv_bias),
            "c_kv": Linear.init(ks[4], w, 2 * w, bias=cfg.qkv_bias),
            "q_norm_scale": jnp.ones((cfg.head_dim,), jnp.float32),
            "q_norm_bias": jnp.zeros((cfg.head_dim,), jnp.float32),
            "k_norm_scale": jnp.ones((cfg.head_dim,), jnp.float32),
            "k_norm_bias": jnp.zeros((cfg.head_dim,), jnp.float32),
            "c_proj": Linear.init(ks[5], w, w),
            "ln_3_scale": jnp.ones((w,), jnp.float32),
            "ln_3_bias": jnp.zeros((w,), jnp.float32),
            "mlp_fc": Linear.init(ks[6], w, cfg.geo_decoder_mlp_expand_ratio * w),
            "mlp_proj": Linear.init(ks[7], cfg.geo_decoder_mlp_expand_ratio * w, w),
            "ln_post_scale": jnp.ones((w,), jnp.float32),
            "ln_post_bias": jnp.zeros((w,), jnp.float32),
            "output_proj": Linear.init(ks[8], w, cfg.out_channels),
        },
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------
def _self_block(p, x, cfg: ShapeVAEConfig):
    h = layer_norm(x, p["ln_1_scale"], p["ln_1_bias"], cfg.ln_eps)
    qkv = Linear.apply(p["c_qkv"], h)
    b, l, _ = qkv.shape
    # reference layout: view(b, l, heads, 3*hd) then split → interleaved per head
    qkv = qkv.reshape(b, l, cfg.heads, 3 * cfg.head_dim)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = layer_norm(q, p["q_norm_scale"], p["q_norm_bias"], cfg.ln_eps)
    k = layer_norm(k, p["k_norm_scale"], p["k_norm_bias"], cfg.ln_eps)
    q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    attn = merge_heads(attention(q, k, v))
    x = x + Linear.apply(p["c_proj"], attn)

    h = layer_norm(x, p["ln_2_scale"], p["ln_2_bias"], cfg.ln_eps)
    x = x + Linear.apply(p["mlp_proj"], gelu_exact(Linear.apply(p["mlp_fc"], h)))
    return x


def decode_latents(params, cfg: ShapeVAEConfig, latents: Array) -> Array:
    """[B, L, embed_dim] sampled latents → [B, L, width] hidden tokens.
    Includes the 1/scale_factor rescale (reference pipelines.py:654)."""
    latents = latents / cfg.scale_factor
    x = Linear.apply(params["post_kl"], latents)

    def body(xc, p):
        return _self_block(p, xc, cfg), None

    x, _ = jax.lax.scan(body, x, params["transformer"])
    return x


def compute_kv(params, cfg: ShapeVAEConfig, hidden: Array):
    """Precompute the geo-decoder cross-attention K/V once per mesh
    (parity: kv_cache at attention_blocks.py:246-257).

    hidden: [B, L, width] → (k, v) each [B, heads, L, head_dim], with the
    per-head k LayerNorm already applied."""
    g = params["geo_decoder"]
    data = layer_norm(hidden, g["ln_2_scale"], g["ln_2_bias"], cfg.ln_eps)
    kv = Linear.apply(g["c_kv"], data)
    b, l, _ = kv.shape
    kv = kv.reshape(b, l, cfg.heads, 2 * cfg.head_dim)
    k, v = jnp.split(kv, 2, axis=-1)
    k = layer_norm(k, g["k_norm_scale"], g["k_norm_bias"], cfg.ln_eps)
    return k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)


def decode_queries(params, cfg: ShapeVAEConfig, queries: Array, kv) -> Array:
    """Occupancy logits for a tile of xyz queries.

    queries: [B, P, 3] in [-1.01, 1.01]; kv from :func:`compute_kv`.
    Returns [B, P] logits (last singleton channel squeezed).
    """
    g = params["geo_decoder"]
    k, v = kv
    q_in = fourier_embed(queries, cfg.num_freqs, cfg.include_pi).astype(k.dtype)
    x = Linear.apply(g["query_proj"], q_in)

    h = layer_norm(x, g["ln_1_scale"], g["ln_1_bias"], cfg.ln_eps)
    q = Linear.apply(g["c_q"], h)
    b, p, _ = q.shape
    q = q.reshape(b, p, cfg.heads, cfg.head_dim)
    q = layer_norm(q, g["q_norm_scale"], g["q_norm_bias"], cfg.ln_eps)
    q = q.transpose(0, 2, 1, 3)
    attn = merge_heads(attention(q, k, v))
    x = x + Linear.apply(g["c_proj"], attn)

    h = layer_norm(x, g["ln_3_scale"], g["ln_3_bias"], cfg.ln_eps)
    x = x + Linear.apply(g["mlp_proj"], gelu_exact(Linear.apply(g["mlp_fc"], h)))

    x = layer_norm(x, g["ln_post_scale"], g["ln_post_bias"])
    occ = Linear.apply(g["output_proj"], x)
    return occ[..., 0]


import functools
import os


def _fused_geo_enabled(cfg: ShapeVAEConfig) -> bool:
    """Fused Pallas geo-decoder gate: TPU backend, VMEM-fitting KV, lane-tile
    aligned widths (kill switch HY3D_FUSED_GEO=0; force-on for interpret
    tests with =force)."""
    flag = os.environ.get("HY3D_FUSED_GEO", "1")
    if flag == "0":
        return False
    from hunyuan3d2_tpu.ops.attention import is_tpu_backend

    shapes_ok = (cfg.num_latents <= 1024 and cfg.width % 128 == 0
                 and (cfg.geo_decoder_mlp_expand_ratio * cfg.width) % 512 == 0
                 and cfg.head_dim in (64, 128) and cfg.out_channels == 1)
    return shapes_ok and (flag == "force" or is_tpu_backend())


def _fused_geo_stream_enabled(cfg: ShapeVAEConfig) -> bool:
    """Streamed fused Pallas geo-decoder gate (large latent counts — v2-0's
    3072 tokens): XLA projections + blocked flash attention over the long KV
    + fused MLP-tail kernel (see ops/geo_decoder_pallas.py design note), so
    the only shape constraints are tiling alignment. Same kill switch
    (HY3D_FUSED_GEO=0 / =force) as the resident kernel."""
    flag = os.environ.get("HY3D_FUSED_GEO", "1")
    if flag == "0":
        return False
    from hunyuan3d2_tpu.ops.attention import is_tpu_backend

    shapes_ok = (cfg.num_latents > 1024 and cfg.num_latents % 256 == 0
                 and cfg.width % 128 == 0
                 and (cfg.geo_decoder_mlp_expand_ratio * cfg.width) % 512 == 0
                 and cfg.head_dim in (64, 128) and cfg.out_channels == 1)
    return shapes_ok and (flag == "force" or is_tpu_backend())


@functools.partial(jax.jit, static_argnames=("cfg",))
def _decode_latents_jit(params, cfg, latents):
    # NOTE dtype policy: fp32 activations, measured deliberately. Casting the
    # decode path to bf16 made the pruned (top-k gather) decode ~20× SLOWER
    # on v5e (47.8 s vs 2.4 s at octree 384) — the take_along_axis K/V
    # gathers degrade badly in bf16 — so the decode stays fp32 end to end.
    return decode_latents(params, cfg, latents)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _compute_kv_jit(params, cfg, hidden):
    return compute_kv(params, cfg, hidden)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "decoder_kind", "octree_resolution", "num_chunks",
                     "box_v", "mc_level", "block", "capacity_frac",
                     "coarse_factor", "sparse_output", "topk_mode"),
)
def _grid_decode_jit(params, cfg, kv, decoder_kind: str, octree_resolution: int,
                     num_chunks: int, box_v: float, mc_level: float,
                     block: int, capacity_frac: float, coarse_factor: int,
                     sparse_output: bool = False, topk_mode: str = "mean"):
    """The ENTIRE latent→grid decode as one compiled program — no per-chunk
    host dispatches (critical under remote-tunnel dispatch latency).
    ``sparse_output`` returns (coarse f16, blk_idx, fine_vals f16) for host
    assembly instead of the dense grid (228 MB → ~25 MB transfer)."""
    from hunyuan3d2_tpu.volume import decoders

    if (decoder_kind == "flashvdm" and cfg.num_latents > 1024
            and _fused_geo_stream_enabled(cfg)):
        # v2-0 flagship (3072 latents): dense attention with K/V chunks
        # STREAMED through VMEM (online softmax) as one fused Pallas
        # kernel — exact where the reference's top-k pruning
        # (attention_processors.py:39-71, k=1024@3072) approximates, and
        # faster on TPU: sequential DMA replaces per-group top-k +
        # take_along_axis gathers. HY3D_FUSED_GEO=0 restores pruning.
        from hunyuan3d2_tpu.ops.geo_decoder_pallas import fused_geo_decode_stream

        kv16s = jax.tree.map(lambda a: a.astype(jnp.bfloat16), kv)

        def decode_fn(pts, _kv16s=kv16s):
            return fused_geo_decode_stream(params, cfg, pts, _kv16s)
    elif decoder_kind == "flashvdm" and cfg.num_latents >= 2048:
        # KV pruning pays at long latent contexts (parity semantics: the
        # reference processor prunes, attention_processors.py:39-71;
        # k rule: 1024 for 3072 tokens, 256 for 512, else L/3)
        k_top = {3072: 1024, 512: 256}.get(cfg.num_latents,
                                           cfg.num_latents // 3)

        def decode_fn(pts):
            p = pts.shape[1]
            gp = min(512, p)
            pad = (-p) % gp
            if pad:
                pts = jnp.pad(pts, ((0, 0), (0, pad), (0, 0)))
            out = decode_queries_pruned(params, cfg, pts, kv, k_top, gp,
                                        mode=topk_mode)
            return out[:, :p]
    elif decoder_kind == "flashvdm":
        # ≤512 latents (mini/turbo): the geo-decoder MLP dominates (~19
        # MFLOP/query vs ~2 for attention), so exact DENSE attention in bf16
        # beats pruning — measured on v5e at octree 384: pruned fp32 2.4 s,
        # pruned bf16 47.8 s (pathological take_along_axis gathers),
        # dense bf16 1.5 s (logits corr 0.99999 vs fp32). Dense attention is
        # what pruning approximates, so this is also the more accurate path.
        # On TPU the whole block runs as ONE fused Pallas kernel (KV +
        # weights VMEM-resident, activations never touch HBM —
        # ops/geo_decoder_pallas.py); HY3D_FUSED_GEO=0 falls back to XLA.
        kv16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), kv)
        if _fused_geo_enabled(cfg):
            from hunyuan3d2_tpu.ops.geo_decoder_pallas import fused_geo_decode

            def decode_fn(pts):
                return fused_geo_decode(params, cfg, pts, kv16)
        else:
            def decode_fn(pts):
                return decode_queries(params, cfg, pts, kv16).astype(jnp.float32)
    else:
        decode_fn = lambda pts: decode_queries(params, cfg, pts, kv)
    if decoder_kind == "vanilla":
        dec = decoders.VanillaVolumeDecoder()
    elif decoder_kind == "hierarchical":
        dec = decoders.HierarchicalVolumeDecoding(
            block=block, capacity_frac=capacity_frac, coarse_factor=coarse_factor)
    else:
        dec = decoders.FlashVDMVolumeDecoding(
            block=block, capacity_frac=capacity_frac, coarse_factor=coarse_factor)
    if sparse_output == "actives":
        grid = dec(decode_fn, batch_size=1, octree_resolution=octree_resolution,
                   num_chunks=num_chunks, box_v=box_v, mc_level=mc_level)
        capacity = active_capacity(octree_resolution)
        return decoders.extract_active_cells(grid, mc_level, capacity)
    if sparse_output == "mesh":
        # fully on-device surface nets (VERDICT r3 #4): decode → actives →
        # vertex/quad emission in ONE compiled program; the host only slices
        # (count, nq) rows off the fixed-capacity buffers. The fused
        # surface_nets_from_grid replaces extract+searchsorted emission
        # (1.63 s → 0.42 s at 385³ on v5e — two-stage spatial compaction +
        # scattered inverse-map neighbor lookup).
        grid = dec(decode_fn, batch_size=1, octree_resolution=octree_resolution,
                   num_chunks=num_chunks, box_v=box_v, mc_level=mc_level)
        capacity = active_capacity(octree_resolution)
        fcap = face_capacity(octree_resolution)
        return decoders.surface_nets_from_grid(
            grid, mc_level, box_v, capacity, fcap)
    if sparse_output and decoder_kind != "vanilla":
        return dec.decode_sparse(decode_fn, batch_size=1,
                                 octree_resolution=octree_resolution,
                                 num_chunks=num_chunks, box_v=box_v,
                                 mc_level=mc_level)
    return dec(decode_fn, batch_size=1, octree_resolution=octree_resolution,
               num_chunks=num_chunks, box_v=box_v, mc_level=mc_level)


def active_capacity(octree_resolution: int) -> int:
    """Static budget for compacted active cells: surfaces occupy O(R²) cells;
    6·R² is ~4× a sphere's footprint at any resolution."""
    return max(1 << 18, 6 * (octree_resolution + 1) ** 2)


def face_capacity(octree_resolution: int) -> int:
    """Static quad budget for the on-device surface-nets emission: ~1 quad
    per active cell empirically; 1.5× the cell budget is generous."""
    return (3 * active_capacity(octree_resolution)) // 2


def decode_queries_pruned(params, cfg: ShapeVAEConfig, queries: Array, kv,
                          k_top: int, group_size: int = 512,
                          mode: str = "mean") -> Array:
    """FlashVDM-style decode: per spatial group, prune the latent K/V before
    cross-attention. Two scoring modes, parity with the reference processors
    (attention_processors.py):

    * ``mode='mean'`` — FlashVDMCrossAttentionProcessor (:35-82): score each
      key with the mean of the group's ::50-subsampled queries (q̄·kᵀ — the
      reference's sim(q[::50],k).mean(-2), identical by linearity), keep the
      per-head top-k.
    * ``mode='merge'`` — FlashVDMTopMCrossAttentionProcessor (:84-96): score
      with subsampled queries (::30), softmax over keys (unscaled), mean over
      heads, union over the subsampled queries; a key is "activated" when its
      score exceeds 1e-6. Static-shape redesign: keep the top-k_top keys by
      activation (shared across heads, as the reference gathers one index set
      for all heads) and MASK the non-activated survivors out of the final
      softmax, which reproduces the reference's variable-length gather
      exactly whenever ≤ k_top keys are activated.

    Our groups are the block-sparse decoder's spatial blocks (queries arrive
    block-contiguous). queries: [B, P, 3] with P divisible by ``group_size``.
    """
    g = params["geo_decoder"]
    k, v = kv                                   # [B, H, L, D]
    b, heads, lk, hd = k.shape
    q_in = fourier_embed(queries, cfg.num_freqs, cfg.include_pi).astype(k.dtype)
    x = Linear.apply(g["query_proj"], q_in)

    h = layer_norm(x, g["ln_1_scale"], g["ln_1_bias"], cfg.ln_eps)
    q = Linear.apply(g["c_q"], h)
    bq, p, _ = q.shape
    q = q.reshape(bq, p, cfg.heads, cfg.head_dim)
    q = layer_norm(q, g["q_norm_scale"], g["q_norm_bias"], cfg.ln_eps)

    ng = p // group_size
    k_top = min(k_top, lk)
    qg = q.reshape(bq, ng, group_size, heads, hd)
    valid = None
    if mode == "merge":
        # subsampled queries ::30 (reference TopM :30 stride)
        q1 = qg[:, :, ::30]                                      # [B, ng, Q1, H, D]
        sim = jnp.einsum("bgqhd,bhld->bghql", q1, k,
                         preferred_element_type=jnp.float32)     # [B, ng, H, Q1, L]
        act = jax.nn.softmax(sim, axis=-1)                       # softmax over keys, unscaled
        act = act.mean(axis=2)                                   # mean over heads → [B, ng, Q1, L]
        act = act.max(axis=2)                                    # union over subsampled queries
        scores, idx = jax.lax.top_k(act, k_top)                  # [B, ng, k]
        valid = scores > 1e-6                                    # [B, ng, k]
        idx = jnp.broadcast_to(idx[:, :, None], (b, ng, heads, k_top))
    else:
        # group representative: mean of the ::50-SUBSAMPLED queries — the
        # reference scores sim(q[::50], k).mean(-2) (attention_processors.py
        # :73-75); mean-of-sims == sim-of-mean by linearity, so this mean
        # query reproduces the reference key selection exactly when the
        # group equals the reference chunk (tests/test_reference_parity.py)
        qbar = qg[:, :, ::50].mean(axis=2)                       # [B, ng, H, D]
        scores = jnp.einsum("bghd,bhld->bghl", qbar, k,
                            preferred_element_type=jnp.float32)  # [B, ng, H, L]
        _, idx = jax.lax.top_k(scores, k_top)                    # [B, ng, H, k]

    # gather pruned K/V per (group, head): k[b, h, idx] → [B, ng, H, k, D]
    k_sel = jnp.take_along_axis(
        jnp.broadcast_to(k[:, None], (b, ng, heads, lk, hd)),
        idx[..., None], axis=3)
    v_sel = jnp.take_along_axis(
        jnp.broadcast_to(v[:, None], (b, ng, heads, lk, hd)),
        idx[..., None], axis=3)

    qh = qg.transpose(0, 1, 3, 2, 4)                          # [B, ng, H, G, D]
    logits = jnp.einsum("bghqd,bghkd->bghqk", qh, k_sel,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    if valid is not None:
        logits = jnp.where(valid[:, :, None, None, :], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(qh.dtype)
    o = jnp.einsum("bghqk,bghkd->bghqd", w, v_sel,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    attn = o.transpose(0, 1, 3, 2, 4).reshape(bq, p, heads * hd)
    x = x + Linear.apply(g["c_proj"], attn)

    h = layer_norm(x, g["ln_3_scale"], g["ln_3_bias"], cfg.ln_eps)
    x = x + Linear.apply(g["mlp_proj"], gelu_exact(Linear.apply(g["mlp_fc"], h)))
    x = layer_norm(x, g["ln_post_scale"], g["ln_post_bias"])
    return Linear.apply(g["output_proj"], x)[..., 0]


def decode_queries_topk(params, cfg: ShapeVAEConfig, queries: Array, kv,
                        k_top: int, group_size: int = 512) -> Array:
    """Back-compat alias for the 'mean' pruning mode."""
    return decode_queries_pruned(params, cfg, queries, kv, k_top, group_size,
                                 mode="mean")


class ShapeVAE:
    """Object façade matching the reference public surface
    (``ShapeVAE.forward`` / ``latents2mesh`` / ``enable_flashvdm_decoder``,
    model.py:105-189). Holds (params, cfg) and dispatches to the pure fns."""

    def __init__(self, params=None, cfg: ShapeVAEConfig = None, **cfg_kwargs):
        if cfg is None:
            fields = {k: v for k, v in cfg_kwargs.items()
                      if k in ShapeVAEConfig.__dataclass_fields__}
            cfg = ShapeVAEConfig(**fields)
        self.params = params
        self.cfg = cfg
        self.volume_decoder = None  # set lazily (VanillaVolumeDecoder default)
        self.surface_extractor = None

    @classmethod
    def init_random(cls, key, cfg: ShapeVAEConfig = MINI):
        # jit the whole init: eager per-layer jax.random calls each dispatch a
        # tiny program (~0.5 s/compile through the axon remote-compile
        # tunnel); one traced program compiles once and persists in the cache.
        return cls(jax.jit(init, static_argnums=1)(key, cfg), cfg)

    def __call__(self, latents: Array) -> Array:
        return decode_latents(self.params, self.cfg, latents)

    def enable_flashvdm_decoder(self, enabled: bool = True, topk_mode: str = "mean",
                                mc_algo: str = "mc", adaptive_kv_selection=True):
        """Parity: reference model.py:112-129 — enabled chooses FlashVDM
        (adaptive) or Hierarchical + SurfaceExtractors[mc_algo]; disabled
        restores the Vanilla decoder + marching-cubes extractor."""
        from hunyuan3d2_tpu.volume import decoders, surface

        if enabled:
            if adaptive_kv_selection:
                self.volume_decoder = decoders.FlashVDMVolumeDecoding(topk_mode)
            else:
                self.volume_decoder = decoders.HierarchicalVolumeDecoding()
            if mc_algo not in surface.SurfaceExtractors:
                raise ValueError(
                    f"Unsupported mc_algo {mc_algo}, available: "
                    f"{list(surface.SurfaceExtractors)}")
            self.surface_extractor = surface.SurfaceExtractors[mc_algo]()
        else:
            self.volume_decoder = decoders.VanillaVolumeDecoder()
            self.surface_extractor = surface.SurfaceExtractors["mc"]()

    def latents2mesh(self, latents: Array, octree_resolution: int = 384,
                     mc_level: float = 0.0, num_chunks: int = 65536,
                     mc_algo: str = "mc", box_v: float = 1.01, **kwargs):
        from hunyuan3d2_tpu.volume import decoders, surface

        if self.volume_decoder is None:
            self.volume_decoder = decoders.VanillaVolumeDecoder()
        if self.surface_extractor is None:
            self.surface_extractor = surface.SurfaceExtractors[mc_algo]()
        # batched latents with a per-mesh (B=1) decoder: decode each item
        if latents.shape[0] > 1 and not isinstance(
                self.volume_decoder, (type(None), decoders.VanillaVolumeDecoder)):
            outs = []
            for i in range(latents.shape[0]):
                outs.extend(self.latents2mesh(
                    latents[i:i + 1], octree_resolution=octree_resolution,
                    mc_level=mc_level, num_chunks=num_chunks, mc_algo=mc_algo,
                    box_v=box_v, **kwargs))
            return outs
        # fast path: on-device active-cell compaction → tiny transfer → host
        # mesh build (SN/MT are cell-local). Falls back to the dense path on
        # capacity overflow or unsupported extractors.
        if (hasattr(self.surface_extractor, "from_actives")
                and latents.shape[0] == 1
                and not isinstance(self.volume_decoder,
                                   (type(None), decoders.VanillaVolumeDecoder))):
            from hunyuan3d2_tpu.volume.surface import SurfaceNetsExtractor

            dec = self.volume_decoder
            kind = "flashvdm" if isinstance(dec, decoders.FlashVDMVolumeDecoding) \
                else "hierarchical"
            hidden = _decode_latents_jit(self.params, self.cfg, latents)
            kv = _compute_kv_jit(self.params, self.cfg, hidden)
            # fastest path: decode → actives → surface-nets mesh, all ONE
            # device program; host slices two buffers (VERDICT r3 #4)
            if (isinstance(self.surface_extractor, SurfaceNetsExtractor)
                    and os.environ.get("HY3D_DEVICE_SURFACE", "1") == "1"):
                import numpy as np

                verts, quads, nq, count, ok = _grid_decode_jit(
                    self.params, self.cfg, kv, kind, octree_resolution,
                    num_chunks, box_v, mc_level, dec.block, dec.capacity_frac,
                    dec.coarse_factor, "mesh",
                    getattr(dec, "topk_mode", "mean"))
                nq, count = int(nq), int(count)
                capped = (not bool(ok)
                          and os.environ.get("HY3D_CAP_ACTIVES", "0") == "1")
                if capped:
                    # opt-in bounded mode: the fused emission's compactions
                    # are stable truncations (compact_rows keeps the FIRST
                    # `capacity` cells / `face_capacity` quads in order, and
                    # quads referencing dropped cells are masked out), so the
                    # overflowed buffers ARE the capped mesh — no second
                    # decode, no host assembly. Real checkpoints never
                    # overflow the 6R² budget; this exists for adversarial
                    # SDFs (random-weight noise decodes ~99% of cells
                    # active, where the dense 385³ host path costs minutes).
                    from hunyuan3d2_tpu.utils.logger import get_logger

                    get_logger().warning(
                        "surface overflow (%d actives / %d quads): capping "
                        "to device buffers %d/%d (HY3D_CAP_ACTIVES)",
                        count, nq, verts.shape[0], quads.shape[0])
                    count = min(count, int(verts.shape[0]))
                    nq = min(nq, int(quads.shape[0]))
                if bool(ok) or capped:
                    from hunyuan3d2_tpu.volume.surface import Latent2MeshOutput

                    # bucketed transfers: each distinct slice length is a
                    # separate compiled program through the device tunnel
                    q = decoders.bucket_slice(quads, nq)
                    if capped:
                        # stage-A block overflow can leave pad rows below
                        # `capacity` whose vertices are garbage (all from
                        # clamped cell 0); no quad references them, so trim
                        # to the last referenced vertex instead of shipping
                        # them to the postprocessor
                        count = min(count,
                                    int(q.max()) + 1 if q.size else 0)
                    v = decoders.bucket_slice(verts, count).astype(np.float32)
                    return [Latent2MeshOutput(
                        v, decoders.quads_to_tris(q).astype(np.int32))]
                # overflow → fall through to the host-assembled path
            cell_flat, vals, count = _grid_decode_jit(
                self.params, self.cfg, kv, kind, octree_resolution, num_chunks,
                box_v, mc_level, dec.block, dec.capacity_frac,
                dec.coarse_factor, "actives",
                getattr(dec, "topk_mode", "mean"))
            count = int(count)
            if (count > cell_flat.shape[0]
                    and os.environ.get("HY3D_CAP_ACTIVES", "0") == "1"):
                # opt-in bounded mode: keep the first `capacity` active
                # cells (holey mesh) instead of the exact-but-dense
                # fallback. Real checkpoints never overflow the 6R² budget
                # (surfaces are O(R²)); this exists for adversarial SDFs —
                # random-weight noise decodes ~99% of cells active, where
                # the dense 385³ path costs minutes for a throwaway mesh.
                from hunyuan3d2_tpu.utils.logger import get_logger

                get_logger().warning(
                    "active cells %d > capacity %d: capping (HY3D_CAP_ACTIVES)",
                    count, cell_flat.shape[0])
                count = cell_flat.shape[0]
            if count <= cell_flat.shape[0]:
                out = self.surface_extractor.from_actives(
                    cell_flat, vals, count, octree_resolution + 1,
                    mc_level, box_v)
                return [out]
        grid_logits = self.decode_grid(latents, octree_resolution, num_chunks,
                                       box_v, mc_level, to_host=True)
        return self.surface_extractor(grid_logits, mc_level=mc_level, box_v=box_v)

    def decode_grid(self, latents: Array, octree_resolution: int = 384,
                    num_chunks: int = 65536, box_v: float = 1.01,
                    mc_level: float = 0.0, to_host: bool = False):
        """latents → dense logit grid, fully jitted (one compiled program per
        (decoder, resolution) combination). ``to_host=True`` uses the sparse
        transfer path (hierarchical decoders) and returns a numpy grid."""
        from hunyuan3d2_tpu.volume import decoders

        hidden = _decode_latents_jit(self.params, self.cfg, latents)
        kv = _compute_kv_jit(self.params, self.cfg, hidden)
        dec = self.volume_decoder
        if isinstance(dec, decoders.FlashVDMVolumeDecoding):
            kind = "flashvdm"
        elif isinstance(dec, decoders.HierarchicalVolumeDecoding):
            kind = "hierarchical"
        else:
            kind = "vanilla"
        block = getattr(dec, "block", 8)
        cap = getattr(dec, "capacity_frac", 0.12)
        cf = getattr(dec, "coarse_factor", 4)
        sparse = bool(to_host and kind != "vanilla")
        out = _grid_decode_jit(self.params, self.cfg, kv, kind,
                               octree_resolution, num_chunks, box_v, mc_level,
                               block, cap, cf, sparse,
                               getattr(dec, "topk_mode", "mean"))
        if sparse:
            coarse16, blk_idx, fine16 = out
            return decoders.assemble_sparse_grid(
                coarse16, blk_idx, fine16, octree_resolution, block, cf)
        if to_host:
            import numpy as np

            return np.asarray(out.astype(jnp.float16), np.float32)
        return out
