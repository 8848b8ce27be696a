"""orbax checkpoint round-trip, torch ckpt remapping, debug stats."""

import os

import numpy as np

import jax
import jax.numpy as jnp


def test_orbax_roundtrip(tmp_path):
    from hunyuan3d2_tpu.io.orbax_io import load_pytree, save_pytree
    from hunyuan3d2_tpu.models import dit

    cfg = dit.DiTConfig(in_channels=4, context_in_dim=8, hidden_size=32,
                        num_heads=2, depth=1, depth_single_blocks=1)
    params = dit.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ckpt")
    save_pytree(path, params)
    back = load_pytree(path)
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32), atol=0)


def test_deepspeed_key_remap(tmp_path):
    """Parity: hunyuan3ddit.py:361-377 — '_forward_module.' and 'model.'
    prefixes stripped on load."""
    import torch

    from hunyuan3d2_tpu.io.checkpoints import load_torch_ckpt

    sd = {"_forward_module.model.latent_in.weight": torch.ones(2, 3),
          "model.latent_in.bias": torch.zeros(2)}
    p = str(tmp_path / "x.ckpt")
    torch.save(sd, p)
    out = load_torch_ckpt(p)
    assert set(out) == {"latent_in.weight", "latent_in.bias"}


def test_split_by_top_key():
    from hunyuan3d2_tpu.io.checkpoints import split_by_top_key

    sd = {"model.a.w": 1, "model.b.w": 2, "vae.c.w": 3, "conditioner.d": 4}
    out = split_by_top_key(sd)
    assert set(out) == {"model", "vae", "conditioner"}
    assert out["model"] == {"a.w": 1, "b.w": 2}


def test_output_var(capsys):
    from hunyuan3d2_tpu.utils.debug import output_var, tensor_stats

    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    s = tensor_stats(x)
    assert s["size"] == [2, 3] and s["mean"] == 2.5
    os.environ["HY3DGEN_DEBUG"] = "1"
    try:
        output_var("x", x)
    finally:
        os.environ.pop("HY3DGEN_DEBUG")
    out = capsys.readouterr().out
    assert "tensor [x] size: [2, 3]" in out
