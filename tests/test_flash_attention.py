"""Pallas flash-attention kernel vs reference sdpa (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuan3d2_tpu.ops.attention import sdpa

pytestmark = pytest.mark.skipif(jax.default_backend() != "cpu", reason="cpu CI")


def _run_flash_interpret(q, k, v, scale=None, bq=128, bk=128):
    """Run the kernel in interpreter mode (no TPU on CI)."""
    from unittest import mock

    from jax.experimental import pallas as pl

    from hunyuan3d2_tpu.ops import flash_attention as fa

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    with mock.patch.object(pl, "pallas_call", patched):
        # bypass the jit cache (it would capture non-interpret tracing)
        return fa._flash.__wrapped__(q.reshape(-1, *q.shape[2:]),
                                     k.reshape(-1, *k.shape[2:]),
                                     v.reshape(-1, *v.shape[2:]),
                                     scale or q.shape[-1] ** -0.5, bq, bk
                                     ).reshape(q.shape[0], q.shape[1], q.shape[2], -1)


@pytest.mark.parametrize("lq,lk", [(128, 128), (256, 384), (130, 200)])
def test_flash_matches_sdpa(lq, lk):
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(1, 2, lq, 64), jnp.float32)
    k = jnp.asarray(rs.randn(1, 2, lk, 64), jnp.float32)
    v = jnp.asarray(rs.randn(1, 2, lk, 64), jnp.float32)
    ref = np.asarray(sdpa(q, k, v))
    out = np.asarray(_run_flash_interpret(q, k, v))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_flash_padding_correctness():
    """Odd lengths exercise the kv-padding mask."""
    rs = np.random.RandomState(1)
    q = jnp.asarray(rs.randn(1, 1, 100, 64), jnp.float32)
    k = jnp.asarray(rs.randn(1, 1, 77, 64), jnp.float32)
    v = jnp.asarray(rs.randn(1, 1, 77, 64), jnp.float32)
    ref = np.asarray(sdpa(q, k, v))
    out = np.asarray(_run_flash_interpret(q, k, v))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def _run_flash_masked_interpret(q, k, v, mask, scale=None, bq=128, bk=128):
    from unittest import mock

    from jax.experimental import pallas as pl

    from hunyuan3d2_tpu.ops import flash_attention as fa

    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    b, h = q.shape[:2]
    with mock.patch.object(pl, "pallas_call", patched):
        out = fa._flash_masked.__wrapped__(
            q.reshape(-1, *q.shape[2:]), k.reshape(-1, *k.shape[2:]),
            v.reshape(-1, *v.shape[2:]), mask,
            scale or q.shape[-1] ** -0.5, bq, bk, h)
    return out.reshape(b, h, q.shape[2], -1)


@pytest.mark.parametrize("lq,lk", [(128, 128), (256, 384), (130, 200)])
def test_flash_masked_matches_sdpa(lq, lk):
    """Masked kernel vs sdpa with the mask broadcast across heads — the
    paint UNet's voxel-mask contract ([B, Lq, Lk] bool, True = attend).
    Every row keeps >=1 allowed key (voxel masks include self), where the
    two implementations agree; fully-masked rows intentionally diverge
    (flash: zeros, sdpa: uniform)."""
    rs = np.random.RandomState(2)
    q = jnp.asarray(rs.randn(2, 3, lq, 64), jnp.float32)
    k = jnp.asarray(rs.randn(2, 3, lk, 64), jnp.float32)
    v = jnp.asarray(rs.randn(2, 3, lk, 64), jnp.float32)
    m = rs.rand(2, lq, lk) < 0.3
    m[..., 0] = True  # voxel masks always allow self: >=1 key per row
    m = jnp.asarray(m)
    ref = np.asarray(sdpa(q, k, v, mask=m[:, None]))
    out = np.asarray(_run_flash_masked_interpret(q, k, v, m))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_flash_masked_first_block_fully_masked_row():
    """A row whose allowed keys all sit beyond the first k-block exercises
    the p=0 guard (a naive kernel leaks exp(0)=1 weights while the running
    max is still -inf)."""
    rs = np.random.RandomState(3)
    lq, lk = 128, 384
    q = jnp.asarray(rs.randn(1, 1, lq, 64), jnp.float32)
    k = jnp.asarray(rs.randn(1, 1, lk, 64), jnp.float32)
    v = jnp.asarray(rs.randn(1, 1, lk, 64), jnp.float32)
    m = np.zeros((1, lq, lk), bool)
    m[:, :, 300:] = True  # only the LAST k-block has allowed keys
    m = jnp.asarray(m)
    ref = np.asarray(sdpa(q, k, v, mask=m[:, None]))
    out = np.asarray(_run_flash_masked_interpret(q, k, v, m, bk=128))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)
