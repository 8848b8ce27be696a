"""Sharding rules: param pytree paths → PartitionSpecs.

Megatron-style tensor parallelism for the DiT (and the other transformers):
column-parallel first matmul (shard the output features over "tp"),
row-parallel second matmul (shard the input features over "tp") so the pair
needs a single all-reduce that XLA's SPMD partitioner inserts automatically.
Fused QKV projections are sharded on the output axis too — with
head_dim-contiguous layout the shards stay head-aligned as long as
tp divides (heads // 3·…); GSPMD inserts the (cheap, ICI) collectives where
our layout deviates. Norm scales/biases and small embeddings replicate.

Batch ("dp") shards the leading batch axis of activations: CFG pairs, paint
multiview stacks, and volume-decode query tiles are all batch-like
(SURVEY.md §2.6: the natural TPU sharding for this workload).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# path-suffix → spec for weight kernels [in, out]
_COL = P(None, "tp")   # column-parallel: shard out features
_ROW = P("tp", None)   # row-parallel: shard in features
_REP = P()


def _spec_for_path(path: str):
    # column-parallel (first of each pair / fused qkv / modulation producers)
    col_keys = ("img_qkv/w", "txt_qkv/w", "img_mlp_in/w", "txt_mlp_in/w",
                "linear1/w", "img_mod/w", "txt_mod/w", "mod/w",
                "c_qkv/w", "mlp_fc/w", "ffn_in/w", "c_kv/w", "c_q/w",
                "q/w", "k/w", "v/w", "adaLN/w",
                # paint UNet / CLIP
                "to_q/w", "to_k/w", "to_v/w", "ff_in/w", "proj_in/w", "fc1/w")
    # row-parallel (second of each pair / output projections)
    row_keys = ("img_proj/w", "txt_proj/w", "img_mlp_out/w", "txt_mlp_out/w",
                "linear2/w", "c_proj/w", "mlp_proj/w", "ffn_out/w", "out/w",
                "to_out/w", "ff_out/w", "proj_out/w", "fc2/w")
    for k in col_keys:
        if path.endswith(k):
            return _COL
    for k in row_keys:
        if path.endswith(k):
            return _ROW
    # biases of column-parallel layers follow the out-feature shard
    col_bias = tuple(k.replace("/w", "/b") for k in col_keys)
    for k in col_bias:
        if path.endswith(k):
            return P("tp")
    return _REP


def dit_param_spec(params):
    """PartitionSpec pytree for any of our transformer param trees (DiT,
    ShapeVAE, DINOv2, UNet): stacked block params keep the leading depth axis
    unsharded and shard the feature axes per _spec_for_path."""

    def spec(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        s = _spec_for_path(path)
        # stacked per-layer leaves have one extra leading axis
        extra = leaf.ndim - len(s)
        if extra > 0:
            s = P(*([None] * extra + list(s)))
        return s

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree on the mesh according to dit_param_spec."""
    specs = dit_param_spec(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_batch(batch, mesh: Mesh):
    """Shard array leading (batch) axes over "dp"."""
    def put(x):
        spec = P("dp", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)
