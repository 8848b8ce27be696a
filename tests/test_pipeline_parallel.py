"""Pipeline parallelism over the DiT block stacks (parallel/pipeline.py):
pp_apply on a virtual pp mesh must reproduce the single-device dit.apply."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hunyuan3d2_tpu.models import dit
from hunyuan3d2_tpu.parallel.pipeline import make_pp_mesh, pp_apply, split_stages

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >= 4 virtual devices")

CFG = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=64,
                    num_heads=4, depth=4, depth_single_blocks=4)


def _inputs(b=4):
    k = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(k, 3)
    x = jax.random.normal(k1, (b, 6, CFG.in_channels), jnp.float32)
    t = jax.random.uniform(k2, (b,))
    cond = jax.random.normal(k3, (b, 5, CFG.context_in_dim), jnp.float32)
    return x, t, cond


def test_split_stages_roundtrip():
    params = dit.init(jax.random.PRNGKey(0), CFG)
    staged = split_stages(params, CFG, 2)
    lw = staged["double_blocks"]["img_qkv"]["w"]
    assert lw.shape[:2] == (2, 2)
    back = lw.reshape((4,) + lw.shape[2:])
    np.testing.assert_array_equal(
        np.asarray(back), np.asarray(params["double_blocks"]["img_qkv"]["w"]))


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4), (4, 4)])
def test_pp_apply_matches_single_device(pp, n_micro):
    if len(jax.devices()) < pp:
        pytest.skip(f"needs {pp} devices")
    params = dit.init(jax.random.PRNGKey(0), CFG)
    x, t, cond = _inputs(b=4)
    ref = np.asarray(dit.apply(params, CFG, x, t, cond))
    mesh = make_pp_mesh(pp)
    out = np.asarray(pp_apply(params, CFG, mesh, x, t, cond,
                              n_micro=n_micro))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_pp_apply_guidance_embed():
    cfg = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=64,
                        num_heads=4, depth=2, depth_single_blocks=2,
                        guidance_embed=True)
    params = dit.init(jax.random.PRNGKey(1), cfg)
    x, t, cond = _inputs(b=2)
    g = jnp.full((2,), 5.0)
    ref = np.asarray(dit.apply(params, cfg, x, t, cond, guidance=g))
    mesh = make_pp_mesh(2)
    out = np.asarray(pp_apply(params, cfg, mesh, x, t, cond, n_micro=2,
                              guidance=g))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)
