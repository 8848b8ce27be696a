"""Pipeline parallelism (pp) for the DiT block stacks — shard_map + ppermute.

The reference is single-GPU (SURVEY.md §2.6: no distribution at all); dp/tp
sharding lives in parallel/sharding.py. This module adds the pipeline axis
for scaling past tensor-parallel limits: the stacked per-layer parameters of
models/dit.py (leading ``depth`` axis) are split across a ``pp`` mesh axis —
each stage holds ``depth // pp`` consecutive blocks — and microbatches flow
stage→stage over the ICI ring with ``jax.lax.ppermute`` in a GPipe schedule.

TPU-native design:
  * each stage's local blocks still run as ONE ``lax.scan`` (the same
    compiled block body as the single-device path);
  * the schedule is a static ``lax.scan`` over n_micro + pp − 1 ticks; at
    tick k stage s works on microbatch k−s (masked at the edges), banks
    finished microbatches on the last stage, and the ring ppermute hands
    activations downstream — no data-dependent control flow anywhere;
  * bubble fraction is (pp−1)/(n_micro+pp−1) — callers pick n_micro ≥ 2·pp;
  * timestep/guidance embeddings are recomputed per stage from the
    (replicated) microbatch inputs instead of riding the ring: one tiny MLP
    per tick buys one fewer ppermute per tick;
  * outputs return replicated via a masked psum from the last stage.

The DiT's two heterogeneous phases (double-stream over (img, txt), then
single-stream over their concatenation) run as two back-to-back pipelines
over the same ring; the final adaLN head is computed replicated. ``pp_apply``
reproduces ``models/dit.apply`` numerically — equivalence is asserted in
tests/test_pipeline_parallel.py on a virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hunyuan3d2_tpu.models import dit as dit_lib
from hunyuan3d2_tpu.ops.nn import Linear, layer_norm, silu

Array = jax.Array


def make_pp_mesh(pp: int) -> Mesh:
    """1-D ``pp`` mesh over the first pp devices (pure pipeline; compose with
    dp/tp by building a mesh with a 'pp' axis alongside the others)."""
    import numpy as np

    devices = jax.devices()[:pp]
    assert len(devices) == pp, f"pp mesh wants {pp} devices"
    return Mesh(np.array(devices), ("pp",))


def split_stages(params, cfg: dit_lib.DiTConfig, pp: int):
    """Stacked block params [depth, ...] → [pp, depth//pp, ...] (the leading
    stage axis is what the 'pp' mesh axis shards)."""
    d, ds = cfg.depth, cfg.depth_single_blocks
    assert d % pp == 0 and ds % pp == 0, (
        f"pp={pp} must divide depth={d} and depth_single_blocks={ds}")

    def reshape_group(tree, n):
        return jax.tree.map(
            lambda x: x.reshape((pp, n // pp) + x.shape[1:]), tree)

    out = dict(params)
    out["double_blocks"] = reshape_group(params["double_blocks"], d)
    out["single_blocks"] = reshape_group(params["single_blocks"], ds)
    return out


def stage_specs(staged):
    """PartitionSpec pytree: block stacks on 'pp', everything replicated."""

    def spec(path, leaf):
        name = path[0].key if hasattr(path[0], "key") else str(path[0])
        return P("pp") if name in ("double_blocks", "single_blocks") else P()

    return jax.tree_util.tree_map_with_path(spec, staged)


def stage_params(params, cfg: dit_lib.DiTConfig, mesh: Mesh):
    """Split the block stacks over 'pp' and place every leaf on the mesh —
    do this ONCE per model, then reuse across steps (ADVICE r3: re-staging
    per call re-transfers the full parameter pytree)."""
    staged = split_stages(params, cfg, mesh.shape["pp"])
    pspec = stage_specs(staged)
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)), staged, pspec)


class PipelinedDiT:
    """Reusable pipeline-parallel DiT: parameters staged/sharded once at
    construction, the shard_map program built once and jit-cached by input
    shapes — safe to call inside a denoise loop (one compile for the whole
    run, no per-step parameter transfer)."""

    def __init__(self, params, cfg: dit_lib.DiTConfig, mesh: Mesh,
                 n_micro: int = 4):
        self.cfg = cfg
        self.mesh = mesh
        self.n_micro = n_micro
        self.staged = stage_params(params, cfg, mesh)
        self._pspec = stage_specs(self.staged)
        self._run = _pp_program(cfg, mesh, n_micro,
                                _hashable_spec(self._pspec))

    def __call__(self, x: Array, t: Array, cond: Array,
                 guidance=None) -> Array:
        n_micro = self.n_micro
        b = x.shape[0]
        assert b % n_micro == 0, \
            f"batch {b} must divide into {n_micro} microbatches"
        cond = cond.astype(x.dtype)
        mb = b // n_micro
        xm = x.reshape((n_micro, mb) + x.shape[1:])
        tm = t.reshape((n_micro, mb))
        cm = cond.reshape((n_micro, mb) + cond.shape[1:])
        if guidance is not None:
            gm = jnp.asarray(guidance).reshape(n_micro, mb)
        else:
            gm = jnp.zeros((n_micro, mb), jnp.float32)
        return self._run(self.staged, xm, tm, cm, gm)


def pp_apply(params, cfg: dit_lib.DiTConfig, mesh: Mesh, x: Array, t: Array,
             cond: Array, n_micro: int = 4, guidance=None) -> Array:
    """Pipeline-parallel ``dit.apply``: identical math, blocks staged over
    the mesh's 'pp' axis, the batch split into ``n_micro`` microbatches.

    x [B, L, C] · t [B] · cond [B, Lc, D]; n_micro must divide B.
    One-shot convenience wrapper — the underlying program is cached on
    (cfg, mesh, n_micro) so repeated calls don't retrace, but parameters are
    re-placed each call; loops should hold a :class:`PipelinedDiT`.
    """
    return PipelinedDiT(params, cfg, mesh, n_micro)(x, t, cond, guidance)


def _hashable_spec(pspec) -> tuple:
    """Flatten a PartitionSpec pytree into a hashable cache key."""
    leaves, treedef = jax.tree_util.tree_flatten(pspec)
    return (tuple(leaves), treedef)


@functools.lru_cache(maxsize=16)
def _pp_program(cfg: dit_lib.DiTConfig, mesh: Mesh, n_micro: int,
                spec_key: tuple):
    """Build (once per (cfg, mesh, n_micro)) the jitted shard_map GPipe
    program; jit further caches per input shapes."""
    pp = mesh.shape["pp"]
    n_ticks = n_micro + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    spec_leaves, spec_treedef = spec_key
    pspec = jax.tree_util.tree_unflatten(spec_treedef, list(spec_leaves))

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(pspec, P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False)
    def run(pstaged, xm, tm, cm, gm):
        mb = xm.shape[1]
        b = xm.shape[0] * mb
        stage = jax.lax.axis_index("pp")
        # only the block stacks carry the stage axis (local leading dim 1);
        # embeddings/head params arrive replicated and full
        local = dict(pstaged)
        local["double_blocks"] = jax.tree.map(lambda a: a[0],
                                              pstaged["double_blocks"])
        local["single_blocks"] = jax.tree.map(lambda a: a[0],
                                              pstaged["single_blocks"])
        dt = xm.dtype

        def embeds(idx):
            vec = dit_lib._mlp_embed(
                local["time_in"],
                dit_lib.timestep_embedding(
                    tm[idx], 256, max_period=cfg.time_factor,
                    time_factor=cfg.time_factor).astype(dt))
            if cfg.guidance_embed:
                vec = vec + dit_lib._mlp_embed(
                    local["guidance_in"],
                    dit_lib.timestep_embedding(
                        gm[idx], 256, max_period=cfg.time_factor,
                        time_factor=cfg.time_factor).astype(dt))
            return vec

        def my_mb(k):
            # the microbatch this stage works on at tick k (edge-clamped;
            # out-of-range ticks compute masked garbage that is never banked)
            return jnp.clip(k - stage, 0, n_micro - 1)

        l, lc, h = xm.shape[2], cm.shape[2], cfg.hidden_size

        # ---- phase 1: double-stream pipeline --------------------------------
        def tick1(carry, k):
            img, txt, oi, ot = carry
            idx = my_mb(k)
            inject = stage == 0
            img = jnp.where(inject,
                            Linear.apply(local["latent_in"], xm[idx]), img)
            txt = jnp.where(inject,
                            Linear.apply(local["cond_in"], cm[idx]), txt)
            vec = embeds(idx)

            def body(c, p):
                i, tx = c
                return dit_lib._double_block(p, i, tx, vec, cfg), None

            (img, txt), _ = jax.lax.scan(body, (img, txt),
                                         local["double_blocks"])
            done = k - (pp - 1)
            bank = (stage == pp - 1) & (done >= 0)
            slot = jnp.maximum(done, 0)
            oi = jnp.where(bank, oi.at[slot].set(img), oi)
            ot = jnp.where(bank, ot.at[slot].set(txt), ot)
            img = jax.lax.ppermute(img, "pp", perm)
            txt = jax.lax.ppermute(txt, "pp", perm)
            return (img, txt, oi, ot), None

        z_img = jnp.zeros((mb, l, h), dt)
        z_txt = jnp.zeros((mb, lc, h), dt)
        acc_i = jnp.zeros((n_micro, mb, l, h), dt)
        acc_t = jnp.zeros((n_micro, mb, lc, h), dt)
        (_, _, acc_i, acc_t), _ = jax.lax.scan(
            tick1, (z_img, z_txt, acc_i, acc_t), jnp.arange(n_ticks))
        mask = (stage == pp - 1).astype(dt)
        acc_i = jax.lax.psum(acc_i * mask, "pp")
        acc_t = jax.lax.psum(acc_t * mask, "pp")

        # ---- phase 2: single-stream pipeline over concat(txt, img) ----------
        xcat_all = jnp.concatenate([acc_t, acc_i], axis=2)  # [n_micro,mb,lc+l,h]

        def tick2(carry, k):
            xc, acc = carry
            idx = my_mb(k)
            xc = jnp.where(stage == 0, xcat_all[idx], xc)
            vec = embeds(idx)

            def body(c, p):
                return dit_lib._single_block(p, c, vec, cfg), None

            xc, _ = jax.lax.scan(body, xc, local["single_blocks"])
            done = k - (pp - 1)
            bank = (stage == pp - 1) & (done >= 0)
            slot = jnp.maximum(done, 0)
            acc = jnp.where(bank, acc.at[slot].set(xc), acc)
            xc = jax.lax.ppermute(xc, "pp", perm)
            return (xc, acc), None

        z_cat = jnp.zeros((mb, lc + l, h), dt)
        acc2 = jnp.zeros((n_micro, mb, lc + l, h), dt)
        (_, acc2), _ = jax.lax.scan(tick2, (z_cat, acc2), jnp.arange(n_ticks))
        acc2 = jax.lax.psum(acc2 * mask, "pp")

        # ---- final adaLN head (replicated, vectorized over microbatches) ----
        latent = acc2[:, :, lc:]
        fl = local["final_layer"]

        def head(lat_mb, idx):
            vec = embeds(idx)
            shift, scale = jnp.split(
                Linear.apply(fl["adaLN"], silu(vec)), 2, axis=-1)
            lat_mb = (1.0 + scale[:, None]) * layer_norm(lat_mb) \
                + shift[:, None]
            return Linear.apply(fl["linear"], lat_mb)

        out = jax.vmap(head)(latent, jnp.arange(n_micro))
        return out.reshape((b,) + out.shape[2:])

    return run
