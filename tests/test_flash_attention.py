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
