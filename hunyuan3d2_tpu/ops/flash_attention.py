"""Pallas TPU flash attention (non-causal; unmasked + boolean-masked).

The DiT attends over cond 1370 + latents 512..3072 tokens and the paint
UNet's multiview attention over ~24k tokens (6 views × 64² latents); a
blocked online-softmax kernel keeps the O(L²) score matrix out of HBM.
The masked variant streams the turbo voxel-locality mask as bool tiles
(XLA sdpa with a mask materializes the full fp32 score tensor instead).

Kernel shape: grid (batch·heads, q_blocks, k_blocks) with the k axis
innermost; running max / normalizer / accumulator live in VMEM scratch that
persists across the k sweep (standard flash pattern). fp32 softmax state,
bf16 matmul inputs, fp32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Block sizes tuned on v5e by device trace (scripts/profile_flash_variants
# .py; wall-clock through the axon tunnel carries a ~30 ms sync floor, so
# tuning uses jax.profiler device times): at the paint UNet's multiview
# shape (24576 tokens, 5 heads, D=64) 2048×1024 reaches MFU 0.41 vs 0.35
# at 512×1024; 2048×2048 and 4096×1024 exceed VMEM (fp32 score/p tiles are
# BQ·BK·4 B ×2). Shorter sequences cap BQ/BK to the 128-rounded length.
DEFAULT_BQ = 2048
DEFAULT_BK = 1024
# the masked kernel adds a [BQ, BK] mask tile on top of the two fp32
# [BQ, BK] score/p tiles; bq=2048 overflows the 16 MB scoped-VMEM limit
# (measured 19 MB), so it stays at 1024 (≈9.5 MB)
DEFAULT_BQ_MASKED = 1024
NEG_INF = -1e30


def _cap_block(block: int, length: int) -> int:
    """Largest useful block ≤ ``block`` for ``length`` rows: the 128-rounded
    length when the sequence is shorter than one block (a 1370-token q with
    bq=2048 would otherwise make an unaligned 1370-row block)."""
    return min(block, max(128, -(-length // 128) * 128))


def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
            kv_len: int, bk: int, need_colmask: bool):
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                      # [BQ, D] (scale pre-folded into q)
    k = k_ref[0]                      # [BK, D]
    v = v_ref[0]                      # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BQ, BK]

    if need_colmask:
        # mask padded kv columns (only present when bk does not divide L —
        # the where/iota costs ~3 VPU passes over [BQ, BK] per grid step)
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                                        # [BQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                                   # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)                          # [BQ, 1]

    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


def _kernel_masked(q_ref, k_ref, v_ref, msk_ref, o_ref, m_scr, l_scr,
                   acc_scr, *, kv_len: int, bk: int, need_colmask: bool):
    """_kernel plus a boolean [BQ, BK] attention-mask block (the paint
    UNet's turbo voxel-locality mask): masked scores pin to NEG_INF, and p
    is forced to 0 where masked so a row whose first k-blocks are fully
    masked cannot leak exp(0)=1 weights while the running max is still
    NEG_INF (they would be alpha-corrected later, but a fully-masked row
    never gets the correction)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [BQ, BK]
    allowed = msk_ref[0] != 0      # mask ships as int8 (bool would be
    if need_colmask:               # DMA'd as 4-byte int32 tiles)
        col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        allowed = allowed & (col < kv_len)
    s = jnp.where(allowed, s, NEG_INF)

    m_prev = m_scr[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.where(allowed, jnp.exp(s - m_new), 0.0)          # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)

    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk", "n_heads"))
def _flash_masked(q: Array, k: Array, v: Array, mask: Array, scale: float,
                  bq: int, bk: int, n_heads: int) -> Array:
    """q/k/v [N, L, D] (N = B·H); mask [B, Lq, Lk] bool shared across the
    head axis (the voxel mask is per-batch). Padding rows/cols are masked
    off inside the kernel."""
    n, lq, d = q.shape
    lk = k.shape[1]
    lq_p = -(-lq // bq) * bq
    lk_p = -(-lk // bk) * bk
    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_p - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_p - lk), (0, 0)))
    if mask.shape[1:] != (lq_p, lk_p):
        mask = jnp.pad(mask, ((0, 0), (0, lq_p - mask.shape[1]),
                              (0, lk_p - mask.shape[2])))
    mask = mask.astype(jnp.int8)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    grid = (n, lq_p // bq, lk_p // bk)
    out = pl.pallas_call(
        functools.partial(_kernel_masked, kv_len=lk, bk=bk,
                          need_colmask=lk_p != lk),
        out_shape=jax.ShapeDtypeStruct((n, lq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bq, bk),
                         lambda b, qi, ki: (b // n_heads, qi, ki)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v, mask)
    return out[:, :lq]


def flash_attention_masked(q: Array, k: Array, v: Array, mask: Array,
                           scale: float | None = None,
                           bq: int = DEFAULT_BQ_MASKED,
                           bk: int = DEFAULT_BK) -> Array:
    """Masked flash attention. q/k/v: [B, H, L, D]; mask: [B, Lq, Lk] bool
    (True = attend), shared across heads — the paint UNet's voxel-locality
    multiview mask. Keeps the O(L²) mask out of fp32 logits form: XLA sdpa
    with a mask materializes [B, H, Lq, Lk] fp32 scores in HBM (1.5 GB at
    L=6144, H=10), this kernel streams bool [BQ, BK] tiles."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    bq = _cap_block(bq, lq)
    bk = _cap_block(bk, lk)
    out = _flash_masked(qf, kf, vf, mask, float(scale), int(bq), int(bk), h)
    return out.reshape(b, h, lq, d)


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk"))
def _flash(q: Array, k: Array, v: Array, scale: float, bq: int, bk: int) -> Array:
    """q [N, Lq, D], k/v [N, Lk, D] (pre-padded to block multiples is NOT
    required; padding happens here)."""
    n, lq, d = q.shape
    lk = k.shape[1]
    lq_p = -(-lq // bq) * bq
    lk_p = -(-lk // bk) * bk
    if lq_p != lq:
        q = jnp.pad(q, ((0, 0), (0, lq_p - lq), (0, 0)))
    if lk_p != lk:
        k = jnp.pad(k, ((0, 0), (0, lk_p - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lk_p - lk), (0, 0)))
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    grid = (n, lq_p // bq, lk_p // bk)
    out = pl.pallas_call(
        functools.partial(_kernel, kv_len=lk, bk=bk, need_colmask=lk_p != lk),
        out_shape=jax.ShapeDtypeStruct((n, lq_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
            pl.BlockSpec((1, bk, d), lambda b, qi, ki: (b, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, qi, ki: (b, qi, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(q, k, v)
    return out[:, :lq]


def flash_attention(q: Array, k: Array, v: Array, scale: float | None = None,
                    bq: int = DEFAULT_BQ, bk: int = DEFAULT_BK) -> Array:
    """q/k/v: [B, H, L, D] → [B, H, Lq, D]. D should be 64/128-aligned."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, h, lq, d = q.shape
    lk = k.shape[2]
    qf = q.reshape(b * h, lq, d)
    kf = k.reshape(b * h, lk, d)
    vf = v.reshape(b * h, lk, d)
    if q.dtype.itemsize >= 4:
        bq = min(bq, 1024)   # f32 tiles double VMEM; 2048 blocks overflow
    bq = _cap_block(bq, lq)
    bk = _cap_block(bk, lk)
    out = _flash(qf, kf, vf, float(scale), int(bq), int(bk))
    return out.reshape(b, h, lq, d)
