"""Latent → dense SDF/occupancy grid decoding, TPU-native.

Behavioral parity: reference hy3dgen/shapegen/models/autoencoders/
volume_decoders.py (VanillaVolumeDecoder :141, HierarchicalVolumeDecoding
:185, FlashVDMVolumeDecoding :280, generate_dense_grid_points :122).

TPU-first redesign (SURVEY.md §7 hard-part 1 — dynamic sparsity → static
shapes). The reference's hierarchical paths are built on data-dependent
``torch.where`` gathers and variable-length buckets; none of that is jittable.
We recast them as **block-sparse fixed-capacity** passes:

  * the fine grid is partitioned into BLOCK³ sub-grids ("blocks");
  * a cheap dense coarse pass marks near-surface blocks (sign change among
    the block's coarse corners, dilated — parity with the conv-ones dilation
    at volume_decoders.py:224);
  * ``lax.top_k`` over per-block scores selects a FIXED number of blocks;
  * selected blocks are decoded densely (queries inside a block are contiguous
    → perfectly shaped [K, BLOCK³, …] batched matmuls on the MXU);
  * results scatter back into a trilinearly-upsampled coarse grid whose sign
    is already correct away from the surface.

Everything is traced once per (resolution, capacity) and runs without host
round-trips. Grid coordinates are generated on device from iota (no 653 MB
host xyz tensor — reference project/image3d/shape.py:85-87).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def grid_coords_from_flat(flat_idx: Array, res: int, box_v: float) -> Array:
    """Map flat indices in [0, res³) to xyz coords of a res³ lattice spanning
    [-box_v, box_v] (ij indexing: x-major, parity with torch.meshgrid 'ij')."""
    step = 2.0 * box_v / (res - 1)
    iz = flat_idx % res
    iy = (flat_idx // res) % res
    ix = flat_idx // (res * res)
    xyz = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32)
    return xyz * step - box_v


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class VanillaVolumeDecoder:
    """Dense decode of all (res+1)³ grid points, tiled into fixed-size chunks
    via ``lax.map`` (parity: volume_decoders.py:141-183 chunked loop)."""

    def __call__(self, decode_fn, batch_size: int, octree_resolution: int,
                 num_chunks: int = 65536, box_v: float = 1.01, **kwargs) -> Array:
        res = octree_resolution + 1
        total = res ** 3
        chunk = min(num_chunks, total)
        n_chunks = _cdiv(total, chunk)

        def one_chunk(start):
            flat = start + jnp.arange(chunk)
            flat = jnp.minimum(flat, total - 1)  # clamp tail padding
            pts = grid_coords_from_flat(flat, res, box_v)
            pts = jnp.broadcast_to(pts[None], (batch_size, chunk, 3))
            return decode_fn(pts).astype(jnp.float32)  # [B, chunk]

        starts = jnp.arange(n_chunks) * chunk
        logits = jax.lax.map(one_chunk, starts)          # [n_chunks, B, chunk]
        logits = jnp.moveaxis(logits, 1, 0).reshape(batch_size, n_chunks * chunk)
        return logits[:, :total].reshape(batch_size, res, res, res)


def _near_surface_blocks(coarse: Array, level: float) -> Array:
    """Per-cell near-surface mask on a coarse grid [B, r, r, r] → mask over
    the (r-1)³ cells: True where the 8 cell corners disagree in sign, then
    dilated by one cell (parity: extract_near_surface_volume_fn + Conv3d-ones
    dilation, volume_decoders.py:29, :224)."""
    occ = coarse > level
    c = occ
    # 8-corner agreement via shifted slices
    agree_all = None
    base = c[:, :-1, :-1, :-1]
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner = c[:, dx:c.shape[1] - 1 + dx, dy:c.shape[2] - 1 + dy, dz:c.shape[3] - 1 + dz]
                eq = corner == base
                agree_all = eq if agree_all is None else (agree_all & eq)
    near = ~agree_all  # [B, r-1, r-1, r-1]
    # dilate by 1 with a 3³ max-pool
    near = jax.lax.reduce_window(
        near.astype(jnp.int32), 0, jax.lax.max,
        (1, 3, 3, 3), (1, 1, 1, 1), "SAME",
    )
    return near > 0


class HierarchicalVolumeDecoding:
    """Coarse→fine block-sparse decoding with a fixed block budget.

    Parity target: HierarchicalVolumeDecoding (volume_decoders.py:185-277) —
    same coarse-then-refine semantics, redesigned to static shapes (see module
    docstring). ``block`` is the fine-grid tile edge; ``capacity_frac`` bounds
    how many blocks are decoded at full resolution (the surface of a shape
    occupies O(R²) of R³ cells, so ~8-15% is generous at 256-384).
    """

    def __init__(self, block: int = 8, capacity_frac: float = 0.12,
                 coarse_factor: int = 2):
        # coarse_factor=2 → one coarse sample per 4 fine cells (the reference
        # hierarchical path starts even coarser, ~63³ at octree 384); the
        # near-surface dilation covers the gap. block must be divisible.
        self.block = block
        self.capacity_frac = capacity_frac
        self.coarse_factor = coarse_factor

    def decode_sparse(self, decode_fn, batch_size: int, octree_resolution: int,
                      num_chunks: int = 65536, box_v: float = 1.01,
                      mc_level: float = 0.0, **kwargs):
        """Device-side block-sparse decode WITHOUT dense assembly.

        Returns (coarse [ncp,ncp,ncp] f16, blk_idx [k] i32, fine_vals
        [k, block³] f16). The host assembles the dense grid locally
        (assemble_sparse_grid) — transferring ~25 MB instead of the 228 MB
        dense 385³ f32 grid, which costs seconds over the remote TPU tunnel.
        """
        assert batch_size == 1, "hierarchical decode is per-mesh (B=1), vmap for more"
        res = octree_resolution + 1
        block = self.block
        cf = self.coarse_factor
        assert block % cf == 0, "coarse_factor must divide block"
        s = block // cf                     # coarse stride in fine-lattice steps
        nb = _cdiv(res, block)              # blocks per axis
        res_pad = nb * block
        step = 2.0 * box_v / (res - 1)

        # --- coarse pass ALIGNED to the fine lattice -------------------------
        # coarse point i sits exactly at fine index i*s (clamped to res-1), so
        # refined blocks and the interpolated background share the zero
        # crossing bit-exactly at coarse points.
        ncp = nb * cf + 1                   # coarse points per axis
        cflat = jnp.arange(ncp ** 3)
        ciz = cflat % ncp
        ciy = (cflat // ncp) % ncp
        cix = cflat // (ncp * ncp)
        cidx = jnp.stack([cix, ciy, ciz], -1) * s
        cpts = jnp.minimum(cidx, res - 1).astype(jnp.float32) * step - box_v

        chunk = min(num_chunks, ncp ** 3)
        n_cchunks = _cdiv(ncp ** 3, chunk)
        cpts_pad = jnp.pad(cpts, ((0, n_cchunks * chunk - ncp ** 3), (0, 0)))
        cvals = jax.lax.map(
            lambda p: decode_fn(p[None]).astype(jnp.float32)[0],
            cpts_pad.reshape(n_cchunks, chunk, 3))
        coarse = cvals.reshape(-1)[: ncp ** 3].reshape(ncp, ncp, ncp)

        # --- score blocks -----------------------------------------------------
        near = _near_surface_blocks(coarse[None], mc_level)[0]  # [ncp-1]³ cells
        blocks_score = near.astype(jnp.float32).reshape(
            nb, cf, nb, cf, nb, cf).sum(axis=(1, 3, 5))
        flat_score = blocks_score.reshape(-1)                    # [nb³]

        k = max(1, min(int(nb ** 3 * self.capacity_frac), nb ** 3))
        _, blk_idx = jax.lax.top_k(flat_score, k)                # [k] block ids
        # ascending ids → sequential host scatter (cache-friendly assembly)
        blk_idx = jnp.sort(blk_idx)

        # --- decode selected blocks densely ------------------------------------
        bz = blk_idx % nb
        by = (blk_idx // nb) % nb
        bx = blk_idx // (nb * nb)
        loc = jnp.arange(block)
        lx, ly, lz = jnp.meshgrid(loc, loc, loc, indexing="ij")
        loff = jnp.stack([lx, ly, lz], -1).reshape(-1, 3)          # [block³,3]
        origins = jnp.stack([bx, by, bz], -1) * block               # [k,3]
        idx3 = origins[:, None, :] + loff[None, :, :]               # [k,block³,3]
        idx3 = jnp.minimum(idx3, res - 1)
        pts = idx3.astype(jnp.float32) * step - box_v               # [k,block³,3]

        blocks_per_chunk = max(1, num_chunks // (block ** 3))
        n_chunks = _cdiv(k, blocks_per_chunk)
        k_pad = n_chunks * blocks_per_chunk
        pts = jnp.pad(pts, ((0, k_pad - k), (0, 0), (0, 0)))
        pts = pts.reshape(n_chunks, blocks_per_chunk * block ** 3, 3)

        fine_vals = jax.lax.map(lambda p: decode_fn(p[None]).astype(jnp.float32)[0], pts)
        fine_vals = fine_vals.reshape(k_pad, block ** 3)[:k]        # [k, block³]
        return (coarse.astype(jnp.float16), blk_idx.astype(jnp.int32),
                fine_vals.astype(jnp.float16))

    def __call__(self, decode_fn, batch_size: int, octree_resolution: int,
                 num_chunks: int = 65536, box_v: float = 1.01,
                 mc_level: float = 0.0, **kwargs) -> Array:
        coarse16, blk_idx, fine16 = self.decode_sparse(
            decode_fn, batch_size, octree_resolution, num_chunks, box_v,
            mc_level, **kwargs)
        coarse = coarse16.astype(jnp.float32)
        fine_vals = fine16.astype(jnp.float32)
        res = octree_resolution + 1
        block = self.block
        cf = self.coarse_factor
        s = block // cf
        nb = _cdiv(res, block)
        res_pad = nb * block
        ncp = nb * cf + 1

        # --- background: exact aligned trilinear interpolation ----------------
        # fine index f ↔ coarse cell f//s with fraction (f%s)/s per axis
        f_idx = jnp.arange(res_pad)
        c0 = jnp.minimum(f_idx // s, ncp - 2)
        frac = (f_idx - c0 * s).astype(jnp.float32) / s

        def lerp_axis(arr, axis):
            a0 = jnp.take(arr, c0, axis=axis)
            a1 = jnp.take(arr, c0 + 1, axis=axis)
            shape = [1, 1, 1]
            shape[axis] = res_pad
            fr = frac.reshape(shape)
            return a0 * (1.0 - fr) + a1 * fr

        bg = lerp_axis(lerp_axis(lerp_axis(coarse, 0), 1), 2)

        # --- scatter fine blocks over the background ---------------------------
        grid = bg.reshape(nb, block, nb, block, nb, block)
        grid = grid.transpose(0, 2, 4, 1, 3, 5).reshape(nb ** 3, block ** 3)
        grid = grid.at[blk_idx].set(fine_vals)
        grid = grid.reshape(nb, nb, nb, block, block, block)
        grid = grid.transpose(0, 3, 1, 4, 2, 5).reshape(res_pad, res_pad, res_pad)
        return grid[None, :res, :res, :res]


def extract_active_cells(grid: Array, level: float, capacity: int):
    """On-device active-cell compaction: cells whose 2×2×2 corners straddle
    ``level``, compacted to a FIXED capacity by an O(N) cumsum scatter
    (ascending flat-id order — exactly what the host surface builders
    expect). Returns (cell_flat [capacity] i32 with -1 padding,
    corner_vals [capacity, 8] f16, count [] i32).

    TPU-native answer to SURVEY.md §7 hard-part 2: the dense grid never
    leaves the device; the host receives ~C·20 bytes instead of R³·4.
    """
    g = grid[0] if grid.ndim == 4 else grid
    R = g.shape[0]
    nc = R - 1
    occ = g > level
    base = occ[:-1, :-1, :-1]
    agree = None
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx == dy == dz == 0:
                    continue
                c = occ[dx:nc + dx, dy:nc + dy, dz:nc + dz]
                eq = c == base
                agree = eq if agree is None else (agree & eq)
    active = (~agree).reshape(-1)                              # [nc³]
    count = jnp.sum(active.astype(jnp.int32))
    pos = jnp.cumsum(active.astype(jnp.int32)) - 1             # [nc³]
    flat_ids = jnp.arange(nc ** 3, dtype=jnp.int32)
    dest = jnp.where(active & (pos < capacity), pos, capacity)
    cell_flat = jnp.full((capacity + 1,), -1, jnp.int32).at[dest].set(
        flat_ids, mode="drop")[:capacity]

    # gather the 8 corner values for each compacted cell
    cz = cell_flat % nc
    cy = (cell_flat // nc) % nc
    cx = cell_flat // (nc * nc)
    safe = jnp.maximum(cell_flat, 0)
    czs = safe % nc
    cys = (safe // nc) % nc
    cxs = safe // (nc * nc)
    corners = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], jnp.int32)
    pflat = ((cxs[:, None] + corners[None, :, 0]) * R
             + (cys[:, None] + corners[None, :, 1])) * R \
        + (czs[:, None] + corners[None, :, 2])
    vals = g.reshape(-1)[pflat].astype(jnp.float16)
    del cx, cy, cz
    return cell_flat, vals, count


def compact_rows(valid: Array, rows: Array, capacity: int, fill):
    """Stable fixed-capacity compaction: rows[i] for valid[i], in order,
    into a [capacity, ...] buffer (same cumsum-scatter as
    extract_active_cells). Returns (buf, count)."""
    count = jnp.sum(valid.astype(jnp.int32))
    pos = jnp.cumsum(valid.astype(jnp.int32)) - 1
    dest = jnp.where(valid & (pos < capacity), pos, capacity)
    buf = jnp.full((capacity + 1,) + rows.shape[1:], fill, rows.dtype)
    return buf.at[dest].set(rows, mode="drop")[:capacity], count


def surface_nets_device(cell_flat: Array, vals: Array, R: int, level: float,
                        box_v: float, face_capacity: int):
    """Surface nets ON DEVICE from compacted active cells (VERDICT r3 #4:
    the host previously rebuilt the mesh from (cells, corner vals) — now the
    device emits final vertices AND triangles; the host only slices).

    cell_flat: [cap] int32 ascending flat cell ids (-1 padding);
    vals: [cap, 8] corner values (f16), corner order = decoders._CORNERS.
    Returns (verts [cap, 3] f32 in bbox coords, tris [2·face_capacity, 3]
    i32 vertex indices = positions in the compacted actives, n_tris).

    Same geometry as volume/surface._sn_from_actives: one vertex per active
    cell (mean of cube-edge crossings), a quad per sign-changing min-corner
    lattice edge, wound so normals point outward (occupancy: inside > level).
    """
    nc = R - 1
    cap = cell_flat.shape[0]
    v = vals.astype(jnp.float32)                               # [cap, 8]
    pad = cell_flat < 0
    cf = jnp.maximum(cell_flat, 0).astype(jnp.int32)
    cx = cf // (nc * nc)
    cy = (cf // nc) % nc
    cz = cf % nc
    cells = jnp.stack([cx, cy, cz], axis=1)                    # [cap, 3]

    corners = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], jnp.int32)
    cube_edges = jnp.asarray([[0, 1], [1, 2], [2, 3], [3, 0],
                              [4, 5], [5, 6], [6, 7], [7, 4],
                              [0, 4], [1, 5], [2, 6], [3, 7]], jnp.int32)
    va = v[:, cube_edges[:, 0]]
    vb = v[:, cube_edges[:, 1]]                                # [cap, 12]
    cross = (va > level) != (vb > level)
    denom = jnp.where(jnp.abs(vb - va) < 1e-12, 1e-12, vb - va)
    t = jnp.clip((level - va) / denom, 0.0, 1.0)               # [cap, 12]
    pa = corners[cube_edges[:, 0]].astype(jnp.float32)         # [12, 3]
    pb = corners[cube_edges[:, 1]].astype(jnp.float32)
    pts = pa[None] + t[..., None] * (pb - pa)[None]            # [cap, 12, 3]
    w = cross.astype(jnp.float32)
    local = (pts * w[..., None]).sum(1) / jnp.maximum(
        w.sum(1, keepdims=True), 1.0)
    verts = (cells.astype(jnp.float32) + local)                # lattice coords
    verts = verts / (R - 1.0) * (2.0 * box_v) - box_v          # bbox coords

    # faces: each active cell owns its 3 min-corner lattice edges
    # (+x: corner 0→1, +y: 0→3, +z: 0→4); neighbors via searchsorted over
    # the ascending compacted ids (padding is -1 < all real ids, so real ids
    # stay sorted after it... they don't — padding sits at the END with -1).
    # Use a +inf-style key for padding to keep the array ascending.
    BIG = jnp.int32(2147483647)
    sorted_ids = jnp.where(pad, BIG, cf)                       # ascending
    strides = jnp.asarray([nc * nc, nc, 1], jnp.int32)
    occ0 = v[:, 0] > level
    end_corner = jnp.asarray([1, 3, 4], jnp.int32)

    def lookup(ids):
        pos = jnp.searchsorted(sorted_ids, ids)
        pos = jnp.minimum(pos, cap - 1)
        ok = sorted_ids[pos] == ids
        return jnp.where(ok, pos, -1).astype(jnp.int32)

    quads, valids = [], []
    for d in range(3):
        u, vv = (d + 1) % 3, (d + 2) % 3
        change = occ0 != (v[:, end_corner[d]] > level)
        interior = (cells[:, u] > 0) & (cells[:, vv] > 0)
        su, sv = strides[u], strides[vv]
        n1 = lookup(cf - su)
        n2 = lookup(cf - su - sv)
        n3 = lookup(cf - sv)
        me = jnp.arange(cap, dtype=jnp.int32)
        q = jnp.stack([me, n1, n2, n3], axis=1)                # [cap, 4]
        # winding: flip when the low corner is outside
        qr = q[:, ::-1]
        q = jnp.where(occ0[:, None], q, qr)
        ok = (change & interior & ~pad
              & (n1 >= 0) & (n2 >= 0) & (n3 >= 0))
        quads.append(q)
        valids.append(ok)
    quads = jnp.concatenate(quads, axis=0)                     # [3·cap, 4]
    valid = jnp.concatenate(valids, axis=0)
    qbuf, nq = compact_rows(valid, quads, face_capacity, -1)
    # interleave the two triangles of each quad so the first 2·nq rows are
    # exactly the valid ones (quads are compacted to the front)
    tris = jnp.stack([qbuf[:, (0, 1, 2)], qbuf[:, (0, 2, 3)]],
                     axis=1).reshape(2 * face_capacity, 3)
    return verts, tris, nq


def surface_nets_from_grid(grid: Array, level: float, box_v: float,
                           capacity: int, face_capacity: int,
                           block_edge: int = 8,
                           block_capacity: int = None):
    """Fused active-cell compaction + surface-nets emission, ONE program.

    The TPU-measured replacement for extract_active_cells →
    surface_nets_device (0.37 s + 1.26 s at 385³): the two costs there are a
    56M-element compaction scatter and a searchsorted neighbor lookup
    (≈20 binary-search gather rounds over 2.7M queries). This version:

      * two-stage spatial compaction — 16³ blocks containing any active cell
        are compacted first (13.8k-element scatter), then cells inside the
        ≤block_capacity selected blocks (a few-M-element scatter instead of
        56M); surfaces are O(R²) so a fixed block budget of
        capacity/block_edge² holds with a wide margin,
      * neighbor lookup through a scattered inverse map (inv[cell_id] =
        compacted position, one 226 MB fill + capacity-sized scatter + 3×3
        gathers) instead of searchsorted — compaction order becomes
        irrelevant, so blockwise order is fine.

    Returns (verts [capacity,3] f32, quads [face_capacity,4] i32 — expand to
    triangles host-side with quads_to_tris (halves the transfer and skips a
    32 MB device materialization), nq [] i32, count [] i32, ok [] bool).
    ``ok=False`` ⇒ a capacity overflowed and the caller must fall back
    (dense/host path); outputs are undefined.
    """
    g = grid[0] if grid.ndim == 4 else grid
    R = g.shape[0]
    nc = R - 1
    E = block_edge
    nb = _cdiv(nc, E)
    P = nb * E

    occ = g > level
    base = occ[:-1, :-1, :-1]
    agree = None
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                if dx == dy == dz == 0:
                    continue
                c = occ[dx:nc + dx, dy:nc + dy, dz:nc + dz]
                eq = c == base
                agree = eq if agree is None else (agree & eq)
    active = ~agree                                            # [nc]³ bool
    count = jnp.sum(active.astype(jnp.int32))

    if P != nc:
        active = jnp.pad(active, ((0, P - nc),) * 3)
    ab = active.reshape(nb, E, nb, E, nb, E).transpose(
        0, 2, 4, 1, 3, 5).reshape(nb ** 3, E ** 3)

    # ---- stage A: compact the occupied spatial blocks --------------------
    if block_capacity is None:
        # same O(R²) surface argument as active_capacity, at block
        # granularity: 6·nb² is ~5× a sphere's block footprint
        block_capacity = max(1024, 6 * nb * nb)
    bcap = min(nb ** 3, block_capacity)
    blk_any = ab.any(axis=1)
    nblk = jnp.sum(blk_any.astype(jnp.int32))
    bpos = jnp.cumsum(blk_any.astype(jnp.int32)) - 1
    bdest = jnp.where(blk_any & (bpos < bcap), bpos, bcap)
    bsel = jnp.full((bcap + 1,), -1, jnp.int32).at[bdest].set(
        jnp.arange(nb ** 3, dtype=jnp.int32), mode="drop")[:bcap]
    ok = nblk <= bcap

    # ---- stage B: compact cells inside the selected blocks ---------------
    bsafe = jnp.maximum(bsel, 0)
    act_sel = ab[bsafe] & (bsel >= 0)[:, None]                 # [bcap, E³]
    flat = act_sel.reshape(-1)
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1
    bx = bsafe // (nb * nb)
    by = (bsafe // nb) % nb
    bz = bsafe % nb
    li = jnp.arange(E ** 3, dtype=jnp.int32)
    lx, ly, lz = li // (E * E), (li // E) % E, li % E
    gx = bx[:, None] * E + lx[None]
    gy = by[:, None] * E + ly[None]
    gz = bz[:, None] * E + lz[None]
    gid = ((gx * nc + gy) * nc + gz).reshape(-1)               # [bcap·E³]
    dest = jnp.where(flat & (pos < capacity), pos, capacity)
    cell_flat = jnp.full((capacity + 1,), -1, jnp.int32).at[dest].set(
        gid.astype(jnp.int32), mode="drop")[:capacity]
    ok = ok & (count <= capacity)

    # ---- corner values + vertices (identical math to surface_nets_device)
    pad = cell_flat < 0
    cf = jnp.maximum(cell_flat, 0).astype(jnp.int32)
    cx = cf // (nc * nc)
    cy = (cf // nc) % nc
    cz = cf % nc
    cells = jnp.stack([cx, cy, cz], axis=1)
    corners = jnp.asarray(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
         [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], jnp.int32)
    pflat = ((cx[:, None] + corners[None, :, 0]) * R
             + (cy[:, None] + corners[None, :, 1])) * R \
        + (cz[:, None] + corners[None, :, 2])
    v = g.reshape(-1)[pflat].astype(jnp.float32)               # [cap, 8]

    cube_edges = jnp.asarray([[0, 1], [1, 2], [2, 3], [3, 0],
                              [4, 5], [5, 6], [6, 7], [7, 4],
                              [0, 4], [1, 5], [2, 6], [3, 7]], jnp.int32)
    va = v[:, cube_edges[:, 0]]
    vb = v[:, cube_edges[:, 1]]
    cross = (va > level) != (vb > level)
    denom = jnp.where(jnp.abs(vb - va) < 1e-12, 1e-12, vb - va)
    t = jnp.clip((level - va) / denom, 0.0, 1.0)
    pa = corners[cube_edges[:, 0]].astype(jnp.float32)
    pb = corners[cube_edges[:, 1]].astype(jnp.float32)
    pts = pa[None] + t[..., None] * (pb - pa)[None]
    w = cross.astype(jnp.float32)
    local = (pts * w[..., None]).sum(1) / jnp.maximum(
        w.sum(1, keepdims=True), 1.0)
    verts = (cells.astype(jnp.float32) + local)
    verts = verts / (R - 1.0) * (2.0 * box_v) - box_v

    # ---- inverse map + faces ---------------------------------------------
    inv = jnp.full((nc ** 3 + 1,), -1, jnp.int32).at[
        jnp.where(pad, nc ** 3, cf)].set(
        jnp.arange(capacity, dtype=jnp.int32), mode="drop")

    def lookup(ids):
        # ids < nc³ always (cf - stride); negatives are masked by `interior`
        return inv[jnp.maximum(ids, 0)]

    strides = jnp.asarray([nc * nc, nc, 1], jnp.int32)
    occ0 = v[:, 0] > level
    end_corner = jnp.asarray([1, 3, 4], jnp.int32)
    me = jnp.arange(capacity, dtype=jnp.int32)
    quads, valids = [], []
    for d in range(3):
        u, vv = (d + 1) % 3, (d + 2) % 3
        change = occ0 != (v[:, end_corner[d]] > level)
        interior = (cells[:, u] > 0) & (cells[:, vv] > 0)
        su, sv = strides[u], strides[vv]
        n1 = lookup(cf - su)
        n2 = lookup(cf - su - sv)
        n3 = lookup(cf - sv)
        q = jnp.stack([me, n1, n2, n3], axis=1)
        q = jnp.where(occ0[:, None], q, q[:, ::-1])
        okq = (change & interior & ~pad
               & (n1 >= 0) & (n2 >= 0) & (n3 >= 0))
        quads.append(q)
        valids.append(okq)
    quads = jnp.concatenate(quads, axis=0)
    valid = jnp.concatenate(valids, axis=0)
    qbuf, nq = compact_rows(valid, quads, face_capacity, -1)
    ok = ok & (nq <= face_capacity)
    return verts, qbuf, nq, count, ok


def quads_to_tris(quads):
    """[n, 4] surface-nets quads → [2n, 3] triangles (host-side expansion,
    same interleaving as surface_nets_device's device emission)."""
    import numpy as np

    q = np.asarray(quads)
    return np.stack([q[:, (0, 1, 2)], q[:, (0, 2, 3)]],
                    axis=1).reshape(-1, 3)


def bucket_slice(device_arr, n: int, bucket: int = 65536):
    """Host transfer of device_arr[:n] with the slice length rounded up to a
    bucket multiple: each distinct slice length is a separate compiled
    program through the remote-device tunnel (~0.5 s per first-seen length),
    so production meshes (every mesh a different n) would pay it per mesh.
    Bucketing bounds the program count by capacity/bucket."""
    import numpy as np

    nb = min(int(device_arr.shape[0]), _cdiv(max(n, 1), bucket) * bucket)
    return np.asarray(device_arr[:nb])[:n]


def assemble_sparse_grid(coarse16, blk_idx, fine16, octree_resolution: int,
                         block: int, coarse_factor: int,
                         background: str = "nearest"):
    """Host-side (numpy) assembly of the sparse decode output into a dense
    [1, res, res, res] float16 grid.

    Every true surface cell lives inside a refined block (the decoder's
    near-surface selection), so the background only has to carry the correct
    SIGN — nearest-neighbor coarse upsampling (cheap np.take) is sufficient
    and ~4× faster than trilinear on host.
    """
    import numpy as np

    coarse = np.asarray(coarse16)                 # f16
    blk_idx = np.asarray(blk_idx)
    fine_vals = np.asarray(fine16)                # f16 [k, block³]
    res = octree_resolution + 1
    s = block // coarse_factor
    nb = _cdiv(res, block)
    res_pad = nb * block
    ncp = coarse.shape[0]

    del res_pad
    f_idx = np.arange(res)
    if background == "nearest":
        cn = np.minimum((f_idx + s // 2) // s, ncp - 1)
        bg = coarse[np.ix_(cn, cn, cn)]                        # [res]³ f16
    else:  # trilinear (aligned, matches the device path)
        c0 = np.minimum(f_idx // s, ncp - 2)
        frac = (f_idx - c0 * s).astype(np.float32) / s

        def lerp_axis(arr, axis):
            a0 = np.take(arr, c0, axis=axis).astype(np.float32)
            a1 = np.take(arr, c0 + 1, axis=axis).astype(np.float32)
            shape = [1, 1, 1]
            shape[axis] = res
            return a0 * (1.0 - frac.reshape(shape)) + a1 * frac.reshape(shape)

        bg = lerp_axis(lerp_axis(lerp_axis(coarse, 0), 1), 2).astype(np.float16)

    # direct flat-index scatter of the refined blocks (no giant transposes)
    bx = (blk_idx // (nb * nb)) * block
    by = ((blk_idx // nb) % nb) * block
    bz = (blk_idx % nb) * block
    loc = np.arange(block)
    lx, ly, lz = np.meshgrid(loc, loc, loc, indexing="ij")
    gx = bx[:, None] + lx.reshape(-1)[None]                    # [k, block³]
    gy = by[:, None] + ly.reshape(-1)[None]
    gz = bz[:, None] + lz.reshape(-1)[None]
    ok = (gx < res) & (gy < res) & (gz < res)                  # drop pad points
    flat = (gx.astype(np.int64) * res + gy) * res + gz
    bg.reshape(-1)[flat[ok]] = fine_vals[ok]
    return bg[None]


class FlashVDMVolumeDecoding(HierarchicalVolumeDecoding):
    """Hierarchical block-sparse decoding + top-k KV pruning.

    Parity target: FlashVDMVolumeDecoding + FlashVDM*CrossAttentionProcessor
    (volume_decoders.py:280-435, attention_processors.py:29-96): per query
    group, score the latent keys with a mean query and keep only the top-k
    K/V before cross-attention. Our groups are the spatial blocks themselves
    (already contiguous); the pruned decode path lives in
    models/shapevae.decode_queries_topk and is selected by the pipeline when
    ``enable_flashvdm`` is on. The block scheduling here is identical to
    HierarchicalVolumeDecoding (its capacities already give the static-shape
    win); this subclass exists to carry the topk_mode knob and tighter
    capacity defaults.
    """

    def __init__(self, topk_mode: str = "mean", block: int = 8,
                 capacity_frac: float = 0.06, coarse_factor: int = 1):
        # speed profile: one coarse sample per block corner (the reference's
        # FlashVDM coarse pass is comparably sparse: 63³ at octree 384) and a
        # tighter block budget. HierarchicalVolumeDecoding keeps the denser
        # quality profile.
        super().__init__(block=block, capacity_frac=capacity_frac,
                         coarse_factor=coarse_factor)
        self.topk_mode = topk_mode
