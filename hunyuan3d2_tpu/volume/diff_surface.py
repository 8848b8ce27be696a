"""Differentiable surface extraction (the diso DiffDMC slot, VERDICT r3 #10).

The reference's 'dmc' algorithm is diso.DiffDMC (surface_extractors.py:79-96)
— a CUDA differentiable marching cubes whose defining property is that
VERTEX POSITIONS are differentiable w.r.t. the SDF grid while the mesh
TOPOLOGY (which cells/edges emit geometry) is treated as piecewise constant.

Our on-device surface nets (volume/decoders.surface_nets_device) has exactly
that structure, built from jax primitives end to end:

  * active-cell selection / face connectivity — integer compaction and
    searchsorted: piecewise constant, no gradient (same as DiffDMC);
  * corner-value gather → edge-crossing lerp t=(level−va)/(vb−va) → vertex =
    mean of crossings: smooth in the grid values, so ``jax.grad`` flows from
    any vertex-space loss back to the SDF grid (and through the geo-decoder
    into model parameters — mesh-space training losses).

This module packages that as a differentiable entry point and a VJP-safe
loss helper. Gradient correctness is asserted against finite differences in
tests/test_diff_surface.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.volume.decoders import (
    extract_active_cells,
    surface_nets_device,
)

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("level", "box_v", "capacity",
                                             "face_capacity"))
def differentiable_surface_nets(grid: Array, level: float = 0.0,
                                box_v: float = 1.01, capacity: int = 65536,
                                face_capacity: int = 98304):
    """SDF grid [R,R,R] (or [1,R,R,R]) → (verts [capacity,3] f32 in bbox
    coords, tris [2·face_capacity,3] i32, n_tris, n_verts).

    ``jax.grad`` of any function of ``verts`` w.r.t. ``grid`` is exact for
    the fixed topology (the active set / connectivity carries no gradient,
    matching DiffDMC's contract). Rows ≥ n_verts / 2·n_tris are padding.
    """
    g = grid[0] if grid.ndim == 4 else grid
    cell_flat, vals, count = extract_active_cells(g, level, capacity)
    # vals is gathered from `grid` → differentiable; cell_flat/count are ints
    verts, tris, nq = surface_nets_device(cell_flat, vals, g.shape[0], level,
                                          box_v, face_capacity)
    return verts, tris, nq, count


def vertex_loss_and_grad(grid: Array, loss_fn, level: float = 0.0,
                         box_v: float = 1.01, capacity: int = 65536,
                         face_capacity: int = 98304):
    """Convenience: value+grad of ``loss_fn(verts, n_verts)`` w.r.t. the SDF
    grid (padding rows are zeroed before the loss so they carry no signal)."""

    def wrapped(g):
        verts, _, _, count = differentiable_surface_nets(
            g, level, box_v, capacity, face_capacity)
        mask = (jnp.arange(verts.shape[0]) < count)[:, None]
        return loss_fn(verts * mask, count)

    return jax.value_and_grad(wrapped)(grid)
