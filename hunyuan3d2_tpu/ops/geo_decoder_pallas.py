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
def _kernel_stream(qe_ref, wqp_ref, bqp_ref, ln1s_ref, ln1b_ref, wcq_ref,
                   bcq_ref, qns_ref, qnb_ref, k_ref, v_ref, wcp_ref, bcp_ref,
                   ln3s_ref, ln3b_ref, wfc_ref, bfc_ref, wpj_ref, bpj_ref,
                   lnps_ref, lnpb_ref, wout_ref, bout_ref, out_ref,
                   q_scr, m_scr, l_scr, oacc_scr, h_scr, *,
                   heads: int, head_dim: int, scale: float, eps: float,
                   KC: int, C: int):
    """Phased grid (n_tiles, KC + C): steps [0, KC) stream one KV chunk each
    and run an online-softmax update; steps [KC, KC+C) stream MLP column
    chunks exactly like the resident kernel. Running per-head max/denominator
    are kept BROADCAST across each head's lane span ([T, W] scratch) so every
    update stays a full-width vector op — no sub-128-lane stores."""
    s = pl.program_id(1)
    bf = jnp.bfloat16

    @pl.when(s == 0)
    def _q_phase():
        x = _dot(qe_ref[:], wqp_ref[:]) + bqp_ref[:]            # [T, W] f32
        h1 = _ln_f32(x, ln1s_ref, ln1b_ref, eps)
        qm = _dot(h1.astype(bf), wcq_ref[:]) + bcq_ref[:]       # [T, W] f32
        qn = []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = qm[:, sl]
            m = jnp.mean(qh, axis=-1, keepdims=True)
            vv = jnp.mean(jnp.square(qh - m), axis=-1, keepdims=True)
            qh = (qh - m) * jax.lax.rsqrt(vv + eps)
            qn.append(qh * qns_ref[:, sl] + qnb_ref[:, sl])
        q_scr[:] = jnp.concatenate(qn, axis=-1).astype(bf)
        m_scr[:] = jnp.full(m_scr.shape, NEG_BIG, jnp.float32)
        l_scr[:] = jnp.zeros(l_scr.shape, jnp.float32)
        oacc_scr[:] = jnp.zeros(oacc_scr.shape, jnp.float32)

    @pl.when(s < KC)
    def _attn_phase():
        q = q_scr[:]                                            # [T, W] bf16
        m_old = m_scr[:]
        l_old = l_scr[:]
        o_old = oacc_scr[:]
        ms, ls, os_ = [], [], []
        for h in range(heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            sc = _dot_t(q[:, sl], k_ref[h]) * scale             # [T, Lc] f32
            mo = m_old[:, sl][:, :1]
            mn = jnp.maximum(mo, jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp(sc - mn)                                # [T, Lc] f32
            corr = jnp.exp(mo - mn)                             # [T, 1]
            lo = l_old[:, sl][:, :1]
            ln = lo * corr + jnp.sum(p, axis=-1, keepdims=True)
            os_.append(o_old[:, sl] * corr + _dot(p.astype(bf), v_ref[h]))
            ms.append(jnp.broadcast_to(mn, (mn.shape[0], head_dim)))
            ls.append(jnp.broadcast_to(ln, (ln.shape[0], head_dim)))
        m_scr[:] = jnp.concatenate(ms, axis=-1)
        l_scr[:] = jnp.concatenate(ls, axis=-1)
        oacc_scr[:] = jnp.concatenate(os_, axis=-1)

    @pl.when(s == KC)
    def _finalize():
        attn = oacc_scr[:] / l_scr[:]                           # [T, W] f32
        # residual x recomputed (cheaper than a [T, W] f32 scratch: the
        # embedding tile and wqp stay VMEM-resident across all phases)
        x = _dot(qe_ref[:], wqp_ref[:]) + bqp_ref[:]
        x2 = x + _dot(attn.astype(bf), wcp_ref[:]) + bcp_ref[:]
        h3 = _ln_f32(x2, ln3s_ref, ln3b_ref, eps)
        h_scr[:] = h3.astype(bf)
        oacc_scr[:] = x2 + bpj_ref[:]       # reuse as the MLP accumulator

    @pl.when(s >= KC)
    def _mlp_phase():
        t = _dot(h_scr[:], wfc_ref[:]) + bfc_ref[:]             # [T, cc] f32
        t = 0.5 * t * (1.0 + _erf(t * (2.0 ** -0.5)))           # exact gelu
        oacc_scr[:] += _dot(t.astype(bf), wpj_ref[:])

    @pl.when(s == KC + C - 1)
    def _out_phase():
        x3 = _ln_f32(oacc_scr[:], lnps_ref, lnpb_ref, eps)
        o = _dot_t(wout_ref[:], x3.astype(bf))                  # [1, T] f32
        out_ref[0] = o + bout_ref[:]


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "lc", "col_chunk",
                                             "interpret"))
def fused_geo_decode_stream(params, cfg, queries: Array, kv, tile: int = 256,
                            lc: int = 256, col_chunk: int = 512,
                            interpret: bool | None = None) -> Array:
    """Large-latent fused geo decode: queries [B, P, 3] + kv ([B, H, L, D]
    each, k pre-normed, L > VMEM budget) → [B, P] f32 occupancy logits.

    Numerically equivalent to models/shapevae.decode_queries (dense — online
    softmax is exact); the v2-0 flagship path (3072 latents,
    reference pipelines.py:470-485). K/V stream in ``lc``-token chunks with
    flash-attention accumulation; MLP weights stream in ``col_chunk`` columns
    as in :func:`fused_geo_decode`. VMEM @ (256, 256, 512):
    resident weights ~4.3 MB + streamed double-buffers ~6 MB + scratch 4 MB.
    """
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
    assert L % lc == 0, (L, lc)
    KC = L // lc
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
            return pl.BlockSpec(shape, lambda i, s: (0, 0), **vm)
        return pl.BlockSpec(shape, lambda i, s: (0, 0, 0), **vm)

    def kv_idx(i, s):
        # clamp: during MLP phases keep the last KV chunk resident (no DMA)
        return (0, jnp.minimum(s, KC - 1), 0)

    def fc_idx(i, s):
        return (0, jnp.maximum(s - KC, 0))

    def pj_idx(i, s):
        return (jnp.maximum(s - KC, 0), 0)

    grid = (n_tiles, KC + C)
    out = pl.pallas_call(
        functools.partial(_kernel_stream, heads=heads, head_dim=hd,
                          scale=float(hd) ** -0.5, eps=cfg.ln_eps,
                          KC=KC, C=C),
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, tile), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, EMB_PAD), lambda i, s: (i, 0), **vm),  # qe
            cspec((EMB_PAD, w)), cspec((1, w)),                 # wqp bqp
            cspec((1, w)), cspec((1, w)),                       # ln1
            cspec((w, w)), cspec((1, w)),                       # wcq bcq
            cspec((1, w)), cspec((1, w)),                       # qns qnb
            pl.BlockSpec((heads, lc, hd), kv_idx, **vm),        # k chunk
            pl.BlockSpec((heads, lc, hd), kv_idx, **vm),        # v chunk
            cspec((w, w)), cspec((1, w)),                       # wcp bcp
            cspec((1, w)), cspec((1, w)),                       # ln3
            pl.BlockSpec((w, col_chunk), fc_idx, **vm),         # wfc
            pl.BlockSpec((1, col_chunk), fc_idx, **vm),         # bfc
            pl.BlockSpec((col_chunk, w), pj_idx, **vm),         # wpj
            cspec((1, w)),                                      # bpj
            cspec((1, w)), cspec((1, w)),                       # lnp
            cspec((1, w)), cspec((1, 1)),                       # wout bout
        ],
        out_specs=pl.BlockSpec((1, 1, tile), lambda i, s: (i, 0, 0), **vm),
        scratch_shapes=[
            pltpu.VMEM((tile, w), jnp.bfloat16),                # q (normed)
            pltpu.VMEM((tile, w), jnp.float32),                 # m (bcast)
            pltpu.VMEM((tile, w), jnp.float32),                 # l (bcast)
            pltpu.VMEM((tile, w), jnp.float32),                 # oacc / acc
            pltpu.VMEM((tile, w), jnp.bfloat16),                # h
        ],
        interpret=interpret,
    )(qe_pad, o["wqp"], o["bqp"], o["ln1s"], o["ln1b"], o["wcq"], o["bcq"],
      o["qns"], o["qnb"], kh, vh, o["wcp"], o["bcp"], o["ln3s"], o["ln3b"],
      o["wfc"], o["bfc"], o["wpj"], o["bpj"], o["lnps"], o["lnpb"],
      o["wout"], o["bout"])
    return out.reshape(1, p_pad)[:, :p]
