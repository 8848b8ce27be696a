"""Paint UNet on the (dp, tp) mesh: views data-parallel, transformer weights
tensor-parallel — numerics must match single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from hunyuan3d2_tpu.models import paint_unet
from hunyuan3d2_tpu.parallel import make_mesh, shard_params

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_sharded_paint_forward_matches_single_device():
    cfg = paint_unet.TINY
    params = paint_unet.init(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    b, n, h = 2, 2, 16
    sample = jnp.asarray(rs.randn(b, n, h, h, 4), jnp.float32)
    normal = jnp.asarray(rs.randn(b, n, h, h, 4), jnp.float32)
    position = jnp.asarray(rs.randn(b, n, h, h, 4), jnp.float32)
    ref = jnp.asarray(rs.randn(b, 1, h, h, 4), jnp.float32)
    cam_gen = jnp.zeros((b, n), jnp.int32)
    cam_ref = jnp.zeros((b, 1), jnp.int32)

    out_ref, _ = paint_unet.apply(params, cfg, sample, jnp.float32(200.0),
                                  normal, position, ref, cam_gen, cam_ref)

    mesh = make_mesh(8)  # dp=2 × tp=4
    sp = shard_params(params, mesh)

    def put_batch(x):
        return jax.device_put(x, NamedSharding(mesh, P("dp", *[None] * (x.ndim - 1))))

    args = [put_batch(x) for x in (sample, normal, position, ref, cam_gen, cam_ref)]
    with mesh:
        out, _ = jax.jit(
            lambda p, s, nm, po, r, cg, cr: paint_unet.apply(
                p, cfg, s, jnp.float32(200.0), nm, po, r, cg, cr)
        )(sp, *args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(out_ref, np.float32),
                               atol=3e-2, rtol=3e-2)
