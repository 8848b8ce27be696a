"""Fused geo-decoder Pallas kernel (the volume-decode hot loop).

The ShapeVAE geo decoder (reference attention_blocks.py:435-492, hot loop
volume_decoders.py:172-178) runs ~22 MFLOP per grid query: Fourier-embedded
xyz → query_proj → LN → c_q → per-head q-norm → cross-attention over the
latent K/V → c_proj → LN → 4×W MLP → LN → 1-channel output projection. At
octree 384 the block-sparse decoder issues ~3.7M queries; run as stock XLA
ops every intermediate [P, W] activation round-trips HBM and the measured
MFU tops out at ~0.26 (BENCH r3).

This kernel fuses the ENTIRE per-query block so a query tile's activations
never leave VMEM:

  * grid (n_tiles, C): query tiles stream; the MLP's [W, 4W] weights are the
    only tensors too big for VMEM, so they stream in C column chunks with the
    second matmul accumulated into a VMEM scratch (y = Σ_c gelu(h·W1_c)·W2_c,
    exact — gelu is elementwise per column).
  * K/V (≤1024 latent tokens, e.g. mini/turbo's 512) and all square weights
    are VMEM-resident with constant index maps — fetched once, revisited.
  * one HBM read per query tile ([T, 128] padded Fourier embedding), one HBM
    write per tile ([T] logits via a matvec-transpose so the output lane
    layout is row-major).
  * fp32 softmax/LayerNorm, bf16 MXU inputs, fp32 accumulation everywhere
    (matches the reference's fp32-upcast norm policy, hunyuan3ddit.py:89-92).

Weight-streaming arithmetic: a T=256 tile does 256·22 MF ≈ 5.7 GFLOP
(~30 µs at v5e peak) against 2·col_chunk·W·2B ≈ 4 MB of streamed MLP weights
per grid step (~5 µs at HBM bandwidth), so the DMA pipeline hides the
weight traffic completely. T=512 overflows the 16 MB scoped-VMEM stack on
v5e (the [T, W] fp32 intermediates dominate), and col_chunk 1024 overflows
it when the kernel is embedded in the full decode program (XLA parks small
neighbors in VMEM, shrinking the scoped budget) — so tile 256 / col_chunk
512: 0.53 MFU measured vs 0.26 for the stock-XLA path (2×).

The full v2-0 VAE (3072 latents) uses the STREAMED variant below
(:func:`fused_geo_decode_stream`): its K/V does not fit VMEM resident, so the
grid gains KV-chunk phases that run an online-softmax (flash-attention style)
accumulation before the MLP column phases. Dense streaming is exact — it is
what the reference's FlashVDM top-k pruning approximates
(attention_processors.py:39-71) — and on TPU it beats the pruned path because
it replaces per-group top-k + take_along_axis gathers with sequential DMA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

EMB_PAD = 128      # fourier embed 51 → zero-padded to one lane tile
NEG_BIG = -1e30


def _ln_f32(x32, scale_ref, bias_ref, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale_ref[:] + bias_ref[:]


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a [M, K] · b [N, K]ᵀ → [M, N] (contraction on both inner dims)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational approximation, |err| ≤ 1.5e-7 —
    Mosaic has no erf primitive; 1.5e-7 is far below the bf16 matmul noise
    feeding this, so exact-GELU parity with the XLA path is preserved."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t * jnp.exp(
        -ax * ax)
    return jnp.sign(x) * y


def _kernel(qe_ref, wqp_ref, bqp_ref, ln1s_ref, ln1b_ref, wcq_ref, bcq_ref,
            qns_ref, qnb_ref, k_ref, v_ref, wcp_ref, bcp_ref, ln3s_ref,
            ln3b_ref, wfc_ref, bfc_ref, wpj_ref, bpj_ref, lnps_ref, lnpb_ref,
            wout_ref, bout_ref, out_ref, h_scr, acc_scr, *,
            heads: int, head_dim: int, scale: float, eps: float, C: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _q_phase():
        bf = jnp.bfloat16
        x = _dot(qe_ref[:], wqp_ref[:]) + bqp_ref[:]            # [T, W] f32
        h1 = _ln_f32(x, ln1s_ref, ln1b_ref, eps)
        qm = _dot(h1.astype(bf), wcq_ref[:]) + bcq_ref[:]       # [T, W] f32

        outs = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = qm[:, sl]                                      # [T, D] f32
            # per-head q LayerNorm (qns/qnb pre-tiled to [1, W] by the host)
            m = jnp.mean(qh, axis=-1, keepdims=True)
            vv = jnp.mean(jnp.square(qh - m), axis=-1, keepdims=True)
            qh = (qh - m) * jax.lax.rsqrt(vv + eps)
            qh = qh * qns_ref[:, sl] + qnb_ref[:, sl]
            s = _dot_t(qh.astype(bf), k_ref[h]) * scale         # [T, L] f32
            mx = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - mx)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            outs.append(_dot(p.astype(bf), v_ref[h]))           # [T, D] f32
        attn = jnp.concatenate(outs, axis=-1)                   # [T, W] f32
        x2 = x + _dot(attn.astype(jnp.bfloat16), wcp_ref[:]) + bcp_ref[:]
        h3 = _ln_f32(x2, ln3s_ref, ln3b_ref, eps)
        h_scr[:] = h3.astype(jnp.bfloat16)
        # fold the MLP residual + mlp_proj bias into the accumulator once
        acc_scr[:] = x2 + bpj_ref[:]

    t = _dot(h_scr[:], wfc_ref[:]) + bfc_ref[:]                 # [T, cc] f32
    t = 0.5 * t * (1.0 + _erf(t * (2.0 ** -0.5)))               # exact gelu
    acc_scr[:] += _dot(t.astype(jnp.bfloat16), wpj_ref[:])

    @pl.when(c == C - 1)
    def _out_phase():
        x3 = _ln_f32(acc_scr[:], lnps_ref, lnpb_ref, eps)
        # matvec with the output row-vector: [1, W] · [T, W]ᵀ → [1, T], so
        # the per-tile logits land lane-major without a transpose
        o = _dot_t(wout_ref[:], x3.astype(jnp.bfloat16))        # [1, T] f32
        out_ref[0] = o + bout_ref[:]


def _prep(g, cfg):
    """Geo-decoder param dict → padded/cast kernel operands (pure XLA ops,
    traced into the same program; ~20 MB of pads/casts, negligible)."""
    bf = jnp.bfloat16
    f32 = jnp.float32
    w = cfg.width
    heads, hd = cfg.heads, cfg.head_dim
    qdim = g["query_proj"]["w"].shape[0]

    def row(x):
        return jnp.asarray(x, f32).reshape(1, -1)

    wqp = jnp.zeros((EMB_PAD, w), bf).at[:qdim].set(
        g["query_proj"]["w"].astype(bf))
    zero_w = jnp.zeros((1, w), f32)
    bqp = row(g["query_proj"].get("b", jnp.zeros((w,))))
    bcq = row(g["c_q"].get("b")) if g["c_q"].get("b") is not None else zero_w
    # per-head q-norm params tiled across heads → [1, W] for lane slicing
    qns = jnp.tile(jnp.asarray(g["q_norm_scale"], f32), heads).reshape(1, w)
    qnb = jnp.tile(jnp.asarray(g["q_norm_bias"], f32), heads).reshape(1, w)
    wout = jnp.zeros((1, w), bf).at[0].set(
        g["output_proj"]["w"][:, 0].astype(bf))
    bout = jnp.asarray(g["output_proj"]["b"], f32).reshape(1, 1)
    return dict(
        wqp=wqp, bqp=bqp,
        ln1s=row(g["ln_1_scale"]), ln1b=row(g["ln_1_bias"]),
        wcq=g["c_q"]["w"].astype(bf), bcq=bcq, qns=qns, qnb=qnb,
        wcp=g["c_proj"]["w"].astype(bf), bcp=row(g["c_proj"]["b"]),
        ln3s=row(g["ln_3_scale"]), ln3b=row(g["ln_3_bias"]),
        wfc=g["mlp_fc"]["w"].astype(bf), bfc=row(g["mlp_fc"]["b"]),
        wpj=g["mlp_proj"]["w"].astype(bf), bpj=row(g["mlp_proj"]["b"]),
        lnps=row(g["ln_post_scale"]), lnpb=row(g["ln_post_bias"]),
        wout=wout, bout=bout,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "col_chunk",
                                             "interpret"))
def fused_geo_decode(params, cfg, queries: Array, kv, tile: int = 256,
                     col_chunk: int = 512,
                     interpret: bool | None = None) -> Array:
    """queries [B, P, 3] + kv ([B, H, L, D] each, k pre-normed) → [B, P] f32
    occupancy logits. Numerically equivalent to models/shapevae.decode_queries
    (same op order; bf16 MXU / fp32 softmax+LN policy). ``interpret=None``
    auto-selects interpreter mode on non-TPU backends (CPU tests)."""
    from hunyuan3d2_tpu.ops.attention import is_tpu_backend
    from hunyuan3d2_tpu.ops.embeddings import fourier_embed

    if interpret is None:
        interpret = not is_tpu_backend()

    g = params["geo_decoder"]
    k, v = kv
    b, p, _ = queries.shape
    assert b == 1, "fused geo decode is per-mesh (B=1)"
    heads, hd, w = cfg.heads, cfg.head_dim, cfg.width
    L = k.shape[2]
    mlp = cfg.geo_decoder_mlp_expand_ratio * w
    col_chunk = min(col_chunk, mlp)
    assert mlp % col_chunk == 0
    C = mlp // col_chunk
    tile = min(tile, max(128, -(-p // 128) * 128))

    qe = fourier_embed(queries[0], cfg.num_freqs, cfg.include_pi)
    qdim = qe.shape[-1]
    p_pad = -(-p // tile) * tile
    qe_pad = jnp.zeros((p_pad, EMB_PAD), jnp.bfloat16)
    qe_pad = qe_pad.at[:p, :qdim].set(qe.astype(jnp.bfloat16))
    n_tiles = p_pad // tile

    o = _prep(g, cfg)
    kh = k[0].astype(jnp.bfloat16)                     # [H, L, D]
    vh = v[0].astype(jnp.bfloat16)

    vm = dict()

    def cspec(shape):
        if len(shape) == 2:
            return pl.BlockSpec(shape, lambda i, c: (0, 0), **vm)
        return pl.BlockSpec(shape, lambda i, c: (0, 0, 0), **vm)

    grid = (n_tiles, C)
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, head_dim=hd,
                          scale=float(hd) ** -0.5, eps=cfg.ln_eps, C=C),
        # 3-D output: the per-tile block (1, 1, tile) is TPU-legal (Mosaic
        # requires the last two block dims divisible by (8, 128) OR equal to
        # the array dims — a 2-D (1, tile) block over (n_tiles, tile) is not)
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, EMB_PAD), lambda i, c: (i, 0), **vm),  # qe
            cspec((EMB_PAD, w)), cspec((1, w)),                 # wqp bqp
            cspec((1, w)), cspec((1, w)),                       # ln1
            cspec((w, w)), cspec((1, w)),                       # wcq bcq
            cspec((1, w)), cspec((1, w)),                       # qns qnb
            cspec((heads, L, hd)), cspec((heads, L, hd)),       # k v
            cspec((w, w)), cspec((1, w)),                       # wcp bcp
            cspec((1, w)), cspec((1, w)),                       # ln3
            pl.BlockSpec((w, col_chunk), lambda i, c: (0, c), **vm),   # wfc
            pl.BlockSpec((1, col_chunk), lambda i, c: (0, c), **vm),   # bfc
            pl.BlockSpec((col_chunk, w), lambda i, c: (c, 0), **vm),   # wpj
            cspec((1, w)),                                      # bpj
            cspec((1, w)), cspec((1, w)),                       # lnp
            cspec((1, w)), cspec((1, 1)),                       # wout bout
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda i, c: (i, 0, 0), **vm),
        scratch_shapes=[
            pltpu.VMEM((tile, w), jnp.bfloat16),                # h
            pltpu.VMEM((tile, w), jnp.float32),                 # acc
        ],
        interpret=interpret,
    )(qe_pad, o["wqp"], o["bqp"], o["ln1s"], o["ln1b"], o["wcq"], o["bcq"],
      o["qns"], o["qnb"], kh, vh, o["wcp"], o["bcp"], o["ln3s"], o["ln3b"],
      o["wfc"], o["bfc"], o["wpj"], o["bpj"], o["lnps"], o["lnpb"],
      o["wout"], o["bout"])
    return out.reshape(1, p_pad)[:, :p]


# ---------------------------------------------------------------------------
# streamed variant: KV too big for VMEM (v2-0's 3072 latents)
# ---------------------------------------------------------------------------
# Design note (v5e measurements): a first all-in-one phased kernel (KV-chunk
# online-softmax phases + MLP column phases inside ONE kernel) hit only 0.23
# MFU — its attention phase degenerates into 16 per-head [T,64]·[64,Lc]
# matmuls per KV step plus [T,W] softmax-state bookkeeping, all VPU-bound.
# The production path is therefore MODULAR: XLA runs the big clean matmuls
# (query_proj/c_q/c_proj — near-peak on MXU), a flash-attention kernel with
# heads on the GRID handles the KV sweep at proven block shapes
# ([512,64]·[64,1024], cf. ops/flash_attention.py), and an MLP-only fused
# kernel keeps the [T,4W] intermediates out of HBM. The [P,W]-sized
# inter-stage tensors round-trip HBM once each (~3 GB at P=262k ≈ 4 ms at
# v5e bandwidth — negligible vs the 9.4 TFLOP of compute).


def _geo_mlp_kernel(x2_ref, ln3s_ref, ln3b_ref, wfc_ref, bfc_ref, wpj_ref,
                    bpj_ref, lnps_ref, lnpb_ref, wout_ref, bout_ref, out_ref,
                    h_scr, acc_scr, *, eps: float, C: int):
    """MLP tail of the geo decoder: LN3 → 4W GELU MLP (column-streamed) →
    residual → ln_post → output matvec. Input x2 = x + c_proj(attn)."""
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        x2 = x2_ref[:].astype(jnp.float32)
        h3 = _ln_f32(x2, ln3s_ref, ln3b_ref, eps)
        h_scr[:] = h3.astype(jnp.bfloat16)
        acc_scr[:] = x2 + bpj_ref[:]

    t = _dot(h_scr[:], wfc_ref[:]) + bfc_ref[:]                 # [T, cc] f32
    t = 0.5 * t * (1.0 + _erf(t * (2.0 ** -0.5)))               # exact gelu
    acc_scr[:] += _dot(t.astype(jnp.bfloat16), wpj_ref[:])

    @pl.when(c == C - 1)
    def _out_phase():
        x3 = _ln_f32(acc_scr[:], lnps_ref, lnpb_ref, eps)
        o = _dot_t(wout_ref[:], x3.astype(jnp.bfloat16))        # [1, T] f32
        out_ref[0] = o + bout_ref[:]


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "bq", "bk",
                                             "col_chunk", "interpret"))
def fused_geo_decode_stream(params, cfg, queries: Array, kv, tile: int = 512,
                            bq: int = 1024, bk: int = 1024,
                            col_chunk: int = 512,
                            interpret: bool | None = None) -> Array:
    """Large-latent fused geo decode: queries [B, P, 3] + kv ([B, H, L, D]
    each, k pre-normed, L > VMEM budget) → [B, P] f32 occupancy logits.

    Numerically equivalent to models/shapevae.decode_queries (dense — online
    softmax is exact); the v2-0 flagship path (3072 latents, reference
    pipelines.py:470-485, where the reference prunes to top-1024 keys —
    attention_processors.py:39-71 — as a lossy approximation of exactly this
    attention). Three stages in one jitted program: XLA projections →
    heads-on-grid flash attention → fused MLP tail (see design note above).
    """
    from hunyuan3d2_tpu.ops.attention import is_tpu_backend
    from hunyuan3d2_tpu.ops.embeddings import fourier_embed
    from hunyuan3d2_tpu.ops.nn import layer_norm

    if interpret is None:
        interpret = not is_tpu_backend()

    g = params["geo_decoder"]
    k, v = kv
    b, p, _ = queries.shape
    assert b == 1, "fused geo decode is per-mesh (B=1)"
    heads, hd, w = cfg.heads, cfg.head_dim, cfg.width
    L = k.shape[2]
    bf = jnp.bfloat16
    mlp = cfg.geo_decoder_mlp_expand_ratio * w
    col_chunk = min(col_chunk, mlp)
    assert mlp % col_chunk == 0
    C = mlp // col_chunk

    p_aligned = max(128, -(-p // 128) * 128)
    tile = min(tile, p_aligned)
    bq = min(bq, p_aligned)
    p_pad = -(-p // tile) * tile        # MLP grid; flash pads independently

    # ---- XLA projections (big clean matmuls; bf16 in / fp32 accum) ---------
    qe = fourier_embed(queries, cfg.num_freqs, cfg.include_pi)   # [1, P, 51]
    x = (jnp.einsum("bpq,qw->bpw", qe.astype(bf),
                    g["query_proj"]["w"].astype(bf),
                    preferred_element_type=jnp.float32)
         + g["query_proj"].get("b", jnp.zeros((w,))))            # [1, P, W] f32
    h1 = layer_norm(x, g["ln_1_scale"], g["ln_1_bias"], cfg.ln_eps)
    qm = jnp.einsum("bpw,wu->bpu", h1.astype(bf), g["c_q"]["w"].astype(bf),
                    preferred_element_type=jnp.float32)
    if g["c_q"].get("b") is not None:
        qm = qm + g["c_q"]["b"]
    qh = qm.reshape(1, p, heads, hd)
    qh = layer_norm(qh, g["q_norm_scale"], g["q_norm_bias"], cfg.ln_eps)

    # ---- flash attention over the long KV (proven blocked kernel) ----------
    # [1, P, H, D] → [1, H, P, D]: an XLA relayout (~2 ms at P=262k) buys the
    # tuned ops/flash_attention block shapes ([bq,64]·[64,bk] per step)
    q4 = qh.transpose(0, 2, 1, 3).astype(bf)
    from hunyuan3d2_tpu.ops.flash_attention import flash_attention

    if interpret:
        # CPU tests: the XLA sdpa path (flash kernel is TPU-lowered)
        from hunyuan3d2_tpu.ops.attention import attention

        attn4 = attention(q4, k.astype(bf), v.astype(bf))
    else:
        attn4 = flash_attention(q4, k.astype(bf), v.astype(bf),
                                bq=bq, bk=min(bk, L))

    # ---- c_proj + residual (XLA), then the fused MLP tail ------------------
    attn_w = attn4.transpose(0, 2, 1, 3).reshape(1, p, w)        # head-minor
    x2 = x + (jnp.einsum("bpw,wu->bpu", attn_w, g["c_proj"]["w"].astype(bf),
                         preferred_element_type=jnp.float32)
              + g["c_proj"]["b"])                                # [1, P, W]

    o = _prep(g, cfg)
    x2_pad = jnp.zeros((p_pad, w), bf).at[:p].set(x2[0].astype(bf))
    n_tiles = p_pad // tile
    out = pl.pallas_call(
        functools.partial(_geo_mlp_kernel, eps=cfg.ln_eps, C=C),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        grid=(n_tiles, C),
        in_specs=[
            pl.BlockSpec((tile, w), lambda i, c: (i, 0)),       # x2
            pl.BlockSpec((1, w), lambda i, c: (0, 0)),          # ln3 s
            pl.BlockSpec((1, w), lambda i, c: (0, 0)),          # ln3 b
            pl.BlockSpec((w, col_chunk), lambda i, c: (0, c)),  # wfc
            pl.BlockSpec((1, col_chunk), lambda i, c: (0, c)),  # bfc
            pl.BlockSpec((col_chunk, w), lambda i, c: (c, 0)),  # wpj
            pl.BlockSpec((1, w), lambda i, c: (0, 0)),          # bpj
            pl.BlockSpec((1, w), lambda i, c: (0, 0)),          # lnps
            pl.BlockSpec((1, w), lambda i, c: (0, 0)),          # lnpb
            pl.BlockSpec((1, w), lambda i, c: (0, 0)),          # wout
            pl.BlockSpec((1, 1), lambda i, c: (0, 0)),          # bout
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda i, c: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tile, w), jnp.bfloat16),                # h
            pltpu.VMEM((tile, w), jnp.float32),                 # acc
        ],
        interpret=interpret,
    )(x2_pad, o["ln3s"], o["ln3b"], o["wfc"], o["bfc"], o["wpj"], o["bpj"],
      o["lnps"], o["lnpb"], o["wout"], o["bout"])
    return out.reshape(1, p_pad)[:, :p]
