"""On-TPU triangle rasterization (Pallas z-buffer kernel).

TPU-native counterpart of the host rasterizer (native/hy3dnative.cpp
hy3d_rasterize) and of the reference's CUDA kernel
(custom_rasterizer/lib/custom_rasterizer_kernel/rasterizer_gpu.cu): a
z-buffer triangle rasterizer with a deterministic nearest-depth resolve.
Where CUDA uses one-thread-per-face atomicMin on a packed depth|face token,
the TPU design is tile-parallel: triangles are binned to screen tiles with
a sort (plain XLA), and a Pallas kernel sweeps each tile's face list
sequentially in ascending face order, updating a VMEM z-buffer with a
strict ``z < best`` compare — nearest depth wins, depth ties go to the
lowest face id, with no atomics and a bit-for-bit deterministic result.

Coordinate conventions match the host kernel exactly
(hy3dnative.cpp:50-73): screen x = (cx/cw*0.5+0.5)*(w-1), screen
y = (0.5-cy/cw*0.5)*(h-1), pixels sampled at integer coordinates, depth
z = cz/cw clamped to [0,1], coverage = all barycentrics >= 0 (either
winding). The host packs depth to 32 bits before comparing; this kernel
compares full fp32 depth, so the winning face can differ on (rare) pairs
that quantize to the same 32-bit depth but differ in fp32.

Static-shape design (everything jits):
  * each face gets ``SLOTS`` bin slots covering its tile bbox row-major;
  * faces whose bbox spans more than SLOTS tiles ("big" faces, e.g. a
    floor plane) get a pair entry for EVERY tile, capacity ``BIG`` faces;
  * pairs are sorted by tile*F+face so each tile's segment is ascending in
    face id; per-tile capacity ``K`` (overflow is reported, see
    RasterOverflow).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

TILE = 128          # screen tile edge (pixels)
SLOTS = 4           # bin slots per face (bbox up to 2x2 tiles / 4x1 etc.)
BIG = 64            # capacity for faces spanning > SLOTS tiles
REC = 16            # floats per face record (9 used, padded for tiling)


class RasterOverflowError(RuntimeError):
    """A static capacity (per-tile face list or big-face slots) was exceeded;
    the raster result may be missing faces. Production callers treat this as
    a signal to fall back to the host rasterizer (texgen.py:276)."""


def auto_k_cap(num_faces: int, num_tiles: int) -> int:
    """Static per-tile face capacity: cover the whole mesh (a face contributes
    at most one entry per tile, so k_cap >= F can never overflow) unless the
    gathered tile-record buffer (num_tiles * k_cap * REC * 4 bytes) would
    exceed ~256 MB. Small tile grids (the overflow-prone case: 512² cond maps
    = 16 tiles, where a 40k-face mesh piles ~2.5k faces per tile) always get
    full coverage; only large grids (2048², 256 tiles) fall back to a bound —
    there the same mesh averages ~160 faces/tile, leaving a wide margin."""
    mem_bound = max(4096, (1 << 28) // (REC * 4 * max(num_tiles, 1)))
    f_pad = -(-(num_faces + 1) // 512) * 512
    return min(f_pad, mem_bound)


def check_overflow(overflow, where: str = "rasterize_tpu") -> None:
    """Host-fetch the overflow scalars of one or more RasterOut.overflow
    arrays and raise RasterOverflowError if any capacity was exceeded."""
    import numpy as np

    arr = np.asarray(overflow)
    if (arr > 0).any():
        raise RasterOverflowError(
            f"{where}: per-tile/big-face capacity exceeded by "
            f"{arr.max()} entries — result would drop faces")


class RasterOut(NamedTuple):
    face_id: Array      # [h, w] int32, -1 where empty
    bary: Array         # [h, w, 3] float32 (perspective-corrected)
    depth: Array        # [h, w] float32 (0 where empty)
    overflow: Array     # [2] int32: [max tile count - K, big count - BIG]
                        # any positive entry ⇒ result may be incomplete


def _kernel(counts_ref, recs_ref, fid_out, z_out, w0_out, w1_out,
            *, chunk_k: int, tile: int):
    """One (tile_y, tile_x, face_chunk) grid step. The face-chunk axis is the
    innermost grid dimension; the output blocks (z-buffer state) map to the
    same block for every chunk, so they stay resident in VMEM and accumulate
    across chunks — each chunk's record block is only chunk_k·REC·4 bytes,
    keeping VMEM bounded for arbitrarily large per-tile face lists."""
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    c = pl.program_id(2)
    txn = pl.num_programs(1)
    py0 = (ty * tile).astype(jnp.float32)
    px0 = (tx * tile).astype(jnp.float32)
    # pixel coordinates for this tile: rows = y, cols = x
    py = py0 + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0).astype(
        jnp.float32)
    px = px0 + jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1).astype(
        jnp.float32)

    @pl.when(c == 0)
    def _init():
        z_out[:] = jnp.full((tile, tile), 2.0, jnp.float32)
        fid_out[:] = jnp.full((tile, tile), -1, jnp.int32)
        w0_out[:] = jnp.zeros((tile, tile), jnp.float32)
        w1_out[:] = jnp.zeros((tile, tile), jnp.float32)

    # faces remaining for this tile in this chunk
    count = counts_ref[ty * txn + tx] - c * chunk_k

    def body(k, carry):
        zbest, fbest, b0best, b1best = carry
        rec = recs_ref[0, 0, 0, k]        # [REC] vector
        a0, b0, c0 = rec[0], rec[1], rec[2]
        a1, b1, c1 = rec[3], rec[4], rec[5]
        z0, z1, zc = rec[6], rec[7], rec[8]
        fid = rec[9].astype(jnp.int32)   # exact: face count < 2^24
        w0 = c0 + a0 * px + b0 * py
        w1 = c1 + a1 * px + b1 * py
        w2 = 1.0 - w0 - w1
        z = zc + w0 * z0 + w1 * z1
        z = jnp.clip(z, 0.0, 1.0)
        upd = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & (z < zbest)
        zbest = jnp.where(upd, z, zbest)
        fbest = jnp.where(upd, fid, fbest)
        b0best = jnp.where(upd, w0, b0best)
        b1best = jnp.where(upd, w1, b1best)
        return zbest, fbest, b0best, b1best

    init = (z_out[:], fid_out[:], w0_out[:], w1_out[:])
    zbest, fbest, b0best, b1best = jax.lax.fori_loop(
        0, jnp.clip(count, 0, chunk_k), body, init)

    fid_out[:] = fbest
    z_out[:] = zbest
    w0_out[:] = b0best
    w1_out[:] = b1best

    @pl.when(c == pl.num_programs(2) - 1)
    def _finish():
        empty = fid_out[:] < 0
        z_out[:] = jnp.where(empty, 0.0, z_out[:])


@functools.partial(jax.jit, static_argnames=("h", "w", "tile", "slots",
                                             "big", "k_cap", "perspective",
                                             "interpret"))
def rasterize_tpu(verts: Array, faces: Array, h: int, w: int, *,
                  tile: int = TILE, slots: int = SLOTS, big: int = BIG,
                  k_cap: int | None = None, perspective: bool = False,
                  interpret: bool | None = None) -> RasterOut:
    """Rasterize ``faces`` of clip-space ``verts`` [V,4] into an h×w image.

    Returns RasterOut (face_id, perspective-corrected barycentrics, depth,
    overflow). Non-tile-multiple sizes are padded internally and sliced.
    With perspective=False (orthographic cameras, w≡1) the barycentric
    correction divide is skipped. ``interpret`` defaults to True off-TPU
    (Pallas interpreter) so the same code runs in CPU tests.
    ``k_cap=None`` auto-sizes the per-tile capacity from the face count
    (see auto_k_cap) so small tile grids can never overflow.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    f32 = jnp.float32
    F = faces.shape[0]
    tyn, txn = -(-h // tile), -(-w // tile)
    hp, wp = tyn * tile, txn * tile
    T = tyn * txn
    if k_cap is None:
        k_cap = auto_k_cap(F, T)

    tri = verts[faces.reshape(-1)].reshape(F, 3, 4)       # [F,3,4]
    vw = jnp.where(tri[:, :, 3] == 0.0, 1e-8, tri[:, :, 3])
    sx = (tri[:, :, 0] / vw * 0.5 + 0.5) * (w - 1)        # [F,3]
    sy = (0.5 - tri[:, :, 1] / vw * 0.5) * (h - 1)
    # NDC z ∈ [-1,1] → depth ∈ [0,1] (see host kernel note: without this
    # remap the [0,1] clamp zeroes every depth for OpenGL projections)
    sz = tri[:, :, 2] / vw * 0.5 + 0.5

    area = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0])
            - (sx[:, 2] - sx[:, 0]) * (sy[:, 1] - sy[:, 0]))
    valid = jnp.abs(area) >= 1e-12
    inv_area = jnp.where(valid, 1.0 / jnp.where(valid, area, 1.0), 0.0)

    # edge-function records: w0 = C0 + A0*px + B0*py, w1 = C1 + A1*px + B1*py
    a0 = (sy[:, 1] - sy[:, 2]) * inv_area
    b0 = (sx[:, 2] - sx[:, 1]) * inv_area
    c0 = (sx[:, 1] * sy[:, 2] - sx[:, 2] * sy[:, 1]) * inv_area
    a1 = (sy[:, 2] - sy[:, 0]) * inv_area
    b1 = (sx[:, 0] - sx[:, 2]) * inv_area
    c1 = (sx[:, 2] * sy[:, 0] - sx[:, 0] * sy[:, 2]) * inv_area
    recs = jnp.stack([a0, b0, c0, a1, b1, c1,
                      sz[:, 0] - sz[:, 2], sz[:, 1] - sz[:, 2], sz[:, 2],
                      jnp.arange(F, dtype=f32)], axis=1)    # [F,10]
    recs = jnp.pad(recs, ((0, 0), (0, REC - 10)))           # [F,REC]
    # sentinel record for masked slots: coverage test always fails
    sentinel = jnp.zeros((REC,), f32).at[2].set(-jnp.inf).at[9].set(-1.0)
    if F >= (1 << 24):
        raise ValueError("rasterize_tpu: face ids beyond fp32 exactness")

    # tile bbox per face (host uses floor(min)..ceil(max) pixel bounds)
    x0 = jnp.clip(jnp.floor(jnp.min(sx, 1)), 0, w - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(jnp.max(sx, 1)), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(jnp.min(sy, 1)), 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(jnp.max(sy, 1)), 0, h - 1).astype(jnp.int32)
    # cull faces fully outside the viewport
    offscreen = ((jnp.max(sx, 1) < 0) | (jnp.min(sx, 1) > w - 1)
                 | (jnp.max(sy, 1) < 0) | (jnp.min(sy, 1) > h - 1))
    valid = valid & ~offscreen
    tx0, tx1 = x0 // tile, x1 // tile
    ty0, ty1 = y0 // tile, y1 // tile
    ntx = tx1 - tx0 + 1
    nty = ty1 - ty0 + 1
    nt = ntx * nty

    small = valid & (nt <= slots)
    bigm = valid & (nt > slots)

    # --- small-face pairs: slot s → tile (tx0 + s%ntx, ty0 + s//ntx) -------
    s_ids = jnp.arange(slots, dtype=jnp.int32)[None, :]     # [1,S]
    stx = tx0[:, None] + s_ids % ntx[:, None]
    sty = ty0[:, None] + s_ids // ntx[:, None]
    s_tile = sty * txn + stx                                # [F,S]
    s_ok = small[:, None] & (s_ids < nt[:, None])
    s_tile = jnp.where(s_ok, s_tile, T)                     # sentinel tile
    s_face = jnp.broadcast_to(jnp.arange(F, dtype=jnp.int32)[:, None],
                              (F, slots))

    # --- big-face pairs: each big face pairs with EVERY tile ---------------
    big_order = jnp.sort(jnp.where(bigm, jnp.arange(F, dtype=jnp.int32),
                                   jnp.int32(F)))
    big_faces = big_order[:big]                             # [B], F = unused
    big_count = jnp.sum(bigm.astype(jnp.int32))
    b_face = jnp.broadcast_to(big_faces[:, None], (big, T)).astype(jnp.int32)
    b_tile = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32)[None, :],
                              (big, T))
    b_tile = jnp.where(b_face < F, b_tile, T)

    pair_tile = jnp.concatenate([s_tile.reshape(-1), b_tile.reshape(-1)])
    pair_face = jnp.concatenate([s_face.reshape(-1), b_face.reshape(-1)])
    pair_face = jnp.where(pair_face >= F, 0, pair_face)     # safe gather idx

    # sort by (tile, face): ascending face within each tile ⇒ deterministic
    # lowest-face-id tie-break, matching the host's packed-token compare
    if (T + 1) * (F + 1) >= 2**31:
        raise ValueError(
            f"rasterize_tpu: tiles*faces {(T + 1) * (F + 1)} overflows the "
            "int32 sort key — reduce the mesh or raise the tile size")
    key = pair_tile * jnp.int32(F + 1) + pair_face
    order = jnp.argsort(key)
    st = pair_tile[order]
    sf = pair_face[order]

    starts = jnp.searchsorted(st, jnp.arange(T + 1, dtype=jnp.int32))
    counts = jnp.diff(starts).astype(jnp.int32)             # [T]
    overflow = jnp.stack([jnp.max(counts) - k_cap,
                          big_count - big]).astype(jnp.int32)

    # per-tile face lists (capacity K), gathered records
    P = sf.shape[0]
    gather_idx = jnp.minimum(starts[:-1][:, None]
                             + jnp.arange(k_cap, dtype=jnp.int32)[None, :],
                             P - 1)                         # [T,K]
    list_face = sf[gather_idx]
    in_seg = (jnp.arange(k_cap, dtype=jnp.int32)[None, :]
              < jnp.minimum(counts, k_cap)[:, None])
    tile_recs = jnp.where(in_seg[..., None], recs[list_face], sentinel)
    # chunk the per-tile face lists: each kernel step stages only
    # chunk_k·REC·4 bytes in VMEM (k_cap can be the full face count — the
    # unchunked block at 40k faces was a 40 MB VMEM request, over the 16 MB
    # scoped limit)
    chunk_k = min(k_cap, 2048)
    n_chunks = -(-k_cap // chunk_k)
    kc_pad = n_chunks * chunk_k
    if kc_pad != k_cap:
        tile_recs = jnp.concatenate(
            [tile_recs, jnp.broadcast_to(sentinel, (T, kc_pad - k_cap, REC))],
            axis=1)
    tile_recs = tile_recs.reshape(tyn, txn, n_chunks, chunk_k, REC)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tyn, txn, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, chunk_k, REC),
                         lambda ty, tx, c, s: (ty, tx, c, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((tile, tile), lambda ty, tx, c, s: (ty, tx)),
            pl.BlockSpec((tile, tile), lambda ty, tx, c, s: (ty, tx)),
            pl.BlockSpec((tile, tile), lambda ty, tx, c, s: (ty, tx)),
            pl.BlockSpec((tile, tile), lambda ty, tx, c, s: (ty, tx)),
        ],
    )
    fid_img, z_img, w0_img, w1_img = pl.pallas_call(
        functools.partial(_kernel, chunk_k=chunk_k, tile=tile),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), f32),
            jax.ShapeDtypeStruct((hp, wp), f32),
            jax.ShapeDtypeStruct((hp, wp), f32),
        ],
        interpret=interpret,
    )(counts, tile_recs)
    if (hp, wp) != (h, w):
        fid_img = fid_img[:h, :w]
        z_img = z_img[:h, :w]
        w0_img = w0_img[:h, :w]
        w1_img = w1_img[:h, :w]

    w2_img = 1.0 - w0_img - w1_img
    if perspective:
        safe_fid = jnp.maximum(fid_img, 0)
        fw = vw[safe_fid]                                   # [h,w,3]
        iw = jnp.stack([w0_img, w1_img, w2_img], -1) / fw
        s = jnp.sum(iw, -1, keepdims=True)
        bary = iw / jnp.where(s == 0.0, 1.0, s)
    else:
        bary = jnp.stack([w0_img, w1_img, w2_img], -1)
    bary = jnp.where((fid_img >= 0)[..., None], bary, 0.0)
    return RasterOut(fid_img, bary, z_img, overflow)


def interpolate(out: RasterOut, faces: Array, attrs: Array) -> Array:
    """Barycentric attribute interpolation: [V,C] attrs → [h,w,C]
    (0 where empty), matching hy3d_rasterize_interp.

    Per-corner multiply-add, NOT an einsum: a "hwk,hwkc->hwc" contraction
    lowers to h·w tiny batched matmuls that each pad to MXU tiles —
    ~17 GB of padding at 2048² (observed as RESOURCE_EXHAUSTED)."""
    safe_fid = jnp.maximum(out.face_id, 0)
    tri = faces[safe_fid]                                   # [h,w,3]
    attrs = attrs.astype(jnp.float32)
    img = attrs[tri[..., 0]] * out.bary[..., 0:1]
    img = img + attrs[tri[..., 1]] * out.bary[..., 1:2]
    img = img + attrs[tri[..., 2]] * out.bary[..., 2:3]
    return jnp.where((out.face_id >= 0)[..., None], img, 0.0)
