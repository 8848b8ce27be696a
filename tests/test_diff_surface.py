"""Differentiable surface nets (the diso DiffDMC slot): gradient
correctness vs finite differences, and gradient flow through a full
geo-decode (mesh-space loss → SDF grid → decoder weights)."""

import numpy as np

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.volume.diff_surface import (
    differentiable_surface_nets,
    vertex_loss_and_grad,
)


def _sphere(res=24, radius=0.6, box_v=1.01):
    lin = np.linspace(-box_v, box_v, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return (radius - np.sqrt(x * x + y * y + z * z)).astype(np.float32)


def test_forward_matches_inference_path():
    g = jnp.asarray(_sphere())
    verts, tris, nq, count = differentiable_surface_nets(
        g, capacity=8192, face_capacity=12288)
    n, q = int(count), int(nq)
    assert 100 < n <= 8192 and 100 < q <= 12288
    v = np.asarray(verts[:n])
    r = np.linalg.norm(v, axis=1)
    assert np.abs(r - 0.6).max() < 0.1


def test_gradient_matches_finite_differences():
    g0 = _sphere()
    res = g0.shape[0]

    def loss(verts, count):
        # smooth scalar of vertex positions (weighted coordinate sum)
        w = jnp.asarray([0.3, -0.2, 0.5])
        return jnp.sum(verts * w)

    val, grad = vertex_loss_and_grad(jnp.asarray(g0), loss,
                                     capacity=8192, face_capacity=12288)
    grad = np.asarray(grad)
    assert np.isfinite(val) and np.isfinite(grad).all()
    assert np.abs(grad).max() > 0  # gradient actually flows

    # finite differences on grid points with nonzero analytic gradient,
    # far enough from the level that ±eps cannot flip the (piecewise
    # constant) topology — at a sign flip the function is discontinuous by
    # construction, same as DiffDMC
    eps = 1e-3
    cand = (np.abs(grad) > np.abs(grad).max() * 0.05) & (np.abs(g0) > 0.02)
    idxs = np.argwhere(cand)[:4]
    assert len(idxs) > 0
    for i, j, k in idxs:
        gp, gm = g0.copy(), g0.copy()
        gp[i, j, k] += eps
        gm[i, j, k] -= eps
        vp, _ = vertex_loss_and_grad(jnp.asarray(gp), loss,
                                     capacity=8192, face_capacity=12288)
        vm, _ = vertex_loss_and_grad(jnp.asarray(gm), loss,
                                     capacity=8192, face_capacity=12288)
        fd = (float(vp) - float(vm)) / (2 * eps)
        assert abs(fd - grad[i, j, k]) < 5e-3 + 0.05 * abs(fd), (
            (i, j, k), fd, float(grad[i, j, k]))


def test_gradient_flows_into_decoder_params():
    """Mesh-space loss → SDF values from a geo decode → decoder weights:
    the chain the reference's DiffDMC exists to enable (training)."""
    from hunyuan3d2_tpu.models import shapevae as sv
    from hunyuan3d2_tpu.volume.decoders import grid_coords_from_flat

    cfg = sv.TINY
    params = jax.jit(sv.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    lat = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.num_latents, cfg.embed_dim)) * 0.5
    res = 17

    def loss_fn(p):
        hidden = sv.decode_latents(p, cfg, lat)
        kv = sv.compute_kv(p, cfg, hidden)
        flat = jnp.arange(res ** 3)
        pts = grid_coords_from_flat(flat, res, 1.01)[None]
        grid = sv.decode_queries(p, cfg, pts, kv).reshape(res, res, res)
        verts, _, _, count = differentiable_surface_nets(
            grid, capacity=2048, face_capacity=3072)
        mask = (jnp.arange(verts.shape[0]) < count)[:, None]
        # pull the surface toward z=0.2 (an arbitrary mesh-space target)
        return jnp.sum(((verts[:, 2] - 0.2) ** 2) * mask[:, 0])

    val, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree.leaves(grads["geo_decoder"]))
    assert gnorm > 0, "no gradient reached the geo-decoder weights"
