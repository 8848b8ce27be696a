"""A/B sweep of flash-attention kernel variants at the paint mv-attn shape.

Variants: current kernel; +dimension_semantics; +scale folded into q;
+col-mask elided when lk%bk==0; block sizes. Target: (1,5,24576,64).
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def make_kernel(elide_colmask: bool):
    def _kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                kv_len: int, bk: int):
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
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if not elide_colmask:
            col = ki * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, NEG_INF)
        m_prev = m_scr[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_scr[:] = m_new

        @pl.when(ki == nk - 1)
        def _finish():
            o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)
    return _kernel


@functools.partial(jax.jit, static_argnames=("scale", "bq", "bk", "dimsem",
                                             "fold_scale"))
def flash_v(q, k, v, scale, bq, bk, dimsem=False, fold_scale=False):
    n, lq, d = q.shape
    lk = k.shape[1]
    if fold_scale:
        q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    lq_p = -(-lq // bq) * bq
    lk_p = -(-lk // bk) * bk
    assert lq_p == lq and lk_p == lk
    elide = (lk % bk == 0)
    grid = (n, lq_p // bq, lk_p // bk)
    kwargs = {}
    if dimsem:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))
    assert fold_scale, "variants always fold scale into q"
    kern = make_kernel(elide)
    out = pl.pallas_call(
        functools.partial(kern, kv_len=lk, bk=bk),
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
        **kwargs,
    )(q, k, v)
    return out


def timed(name, fn, n=10):
    fn().block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    n, l, d = 5, 24576, 64
    q = jax.random.normal(key, (n, l, d), jnp.bfloat16)
    k = jax.random.normal(key, (n, l, d), jnp.bfloat16)
    v = jax.random.normal(key, (n, l, d), jnp.bfloat16)
    sc = d ** -0.5
    # FLOPs: 4*n*l*l*d = 4*5*24576^2*64 = 0.773 TF; v5e peak 197 → 3.92 ms
    from hunyuan3d2_tpu.ops.flash_attention import flash_attention
    timed("CURRENT ops.flash_attention (512/1024)",
          lambda: flash_attention(q[None], k[None], v[None])[0])
    for dimsem in (False, True):
        for (bq, bk) in [(512, 1024), (512, 2048), (1024, 1024), (2048, 512),
                         (1024, 2048)]:
            try:
                timed(f"variant fold+elide bq={bq} bk={bk} dimsem={dimsem}",
                      lambda bq=bq, bk=bk, dimsem=dimsem: flash_v(
                          q, k, v, sc, bq, bk, dimsem, True))
            except Exception as e:
                print(f"bq={bq} bk={bk} dimsem={dimsem} FAILED {type(e).__name__}: {e}"[:140])


if __name__ == "__main__":
    main()
