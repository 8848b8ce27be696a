"""Cross-framework parity: random torch state dicts are ingested through the
production checkpoint mapper (io/checkpoints.py) and the JAX models must
reproduce the torch fixtures' outputs (tests/torch_ref.py) on random inputs.
This validates both the model math and the torch-name mapping in one shot —
the rebuild's version of the reference's golden-stat methodology
(SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests import torch_ref
from hunyuan3d2_tpu.io import checkpoints
from hunyuan3d2_tpu.models import dinov2, dit, shapevae


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _tree_f32(params):
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x), jnp.float32), params)


def test_dit_parity_with_torch():
    torch.manual_seed(0)
    tm = torch_ref.TorchDiT(in_channels=8, context_in_dim=16, hidden=64, heads=2,
                            depth=2, depth_single=2).eval()
    cfg = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=64,
                        num_heads=2, depth=2, depth_single_blocks=2)
    params = _tree_f32(checkpoints.map_dit(_sd(tm), cfg, np.float32))

    rs = np.random.RandomState(0)
    x = rs.randn(2, 6, 8).astype(np.float32)
    t = np.array([0.25, 0.75], np.float32)
    cond = rs.randn(2, 10, 16).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(cond)).numpy()
    ours = np.asarray(dit.apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(cond)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_dit_guidance_embed_parity():
    torch.manual_seed(1)
    tm = torch_ref.TorchDiT(in_channels=8, context_in_dim=16, hidden=64, heads=2,
                            depth=1, depth_single=1, guidance_embed=True).eval()
    cfg = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=64,
                        num_heads=2, depth=1, depth_single_blocks=1,
                        guidance_embed=True)
    params = _tree_f32(checkpoints.map_dit(_sd(tm), cfg, np.float32))
    rs = np.random.RandomState(1)
    x = rs.randn(1, 6, 8).astype(np.float32)
    t = np.array([0.5], np.float32)
    cond = rs.randn(1, 10, 16).astype(np.float32)
    g = np.array([5.0], np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor(t), torch.tensor(cond),
                 torch.tensor(g)).numpy()
    ours = np.asarray(dit.apply(params, cfg, jnp.asarray(x), jnp.asarray(t),
                                jnp.asarray(cond), jnp.asarray(g)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_shapevae_parity_with_torch():
    torch.manual_seed(2)
    tm = torch_ref.TorchShapeVAE(embed_dim=8, w=32, heads=2, layers=2).eval()
    cfg = shapevae.ShapeVAEConfig(num_latents=5, embed_dim=8, width=32, heads=2,
                                  num_decoder_layers=2)
    params = _tree_f32(checkpoints.map_shapevae(_sd(tm), cfg, np.float32))

    rs = np.random.RandomState(2)
    latents = rs.randn(1, 5, 8).astype(np.float32)
    queries = rs.uniform(-1.01, 1.01, (1, 17, 3)).astype(np.float32)

    with torch.no_grad():
        ref = tm(torch.tensor(latents), torch.tensor(queries)).numpy()[..., 0]

    hidden = shapevae.decode_latents(params, cfg, jnp.asarray(latents))
    kv = shapevae.compute_kv(params, cfg, hidden)
    ours = np.asarray(shapevae.decode_queries(params, cfg, jnp.asarray(queries), kv))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_dinov2_parity_with_torch():
    torch.manual_seed(3)
    tm = torch_ref.TorchDino(h=48, heads=4, layers=2, patch=14, image=56,
                             swiglu_hidden=64).eval()
    cfg = dinov2.DinoConfig(hidden_size=48, num_layers=2, num_heads=4,
                            patch_size=14, image_size=56, swiglu_hidden=64)
    params = _tree_f32(checkpoints.map_dinov2(_sd(tm), cfg, np.float32, prefix=""))

    rs = np.random.RandomState(3)
    img = rs.randn(2, 56, 56, 3).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.tensor(img.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(dinov2.apply(params, cfg, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_dit_scan_stack_equals_python_loop():
    """The lax.scan over stacked block params must equal applying blocks in
    order (catches stacking-order bugs in the mapper)."""
    torch.manual_seed(4)
    tm = torch_ref.TorchDiT(in_channels=4, context_in_dim=8, hidden=32, heads=2,
                            depth=3, depth_single=2).eval()
    cfg = dit.DiTConfig(in_channels=4, context_in_dim=8, hidden_size=32,
                        num_heads=2, depth=3, depth_single_blocks=2)
    params = _tree_f32(checkpoints.map_dit(_sd(tm), cfg, np.float32))
    # block 0 and block 2 of the stack must differ (ordering sanity)
    w0 = np.asarray(params["double_blocks"]["img_qkv"]["w"][0])
    w2 = np.asarray(params["double_blocks"]["img_qkv"]["w"][2])
    assert not np.allclose(w0, w2)
    ref_w0 = _sd(tm)["double_blocks.0.img_attn.qkv.weight"].T
    np.testing.assert_allclose(w0, ref_w0, atol=0)
