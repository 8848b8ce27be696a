"""Checkpoint/resume for the training loop (SURVEY §5 aux subsystem):
training N steps straight must equal training k steps, saving params +
optimizer state with orbax, restoring in a fresh pytree, and training the
remaining N−k steps."""

import jax
import jax.numpy as jnp
import numpy as np

from hunyuan3d2_tpu.io.orbax_io import load_pytree, save_pytree
from hunyuan3d2_tpu.models import dit
from hunyuan3d2_tpu.training.flow_match import make_train_step

CFG = dit.DiTConfig(in_channels=8, context_in_dim=16, hidden_size=32,
                    num_heads=2, depth=1, depth_single_blocks=1)


def _batch(i):
    k = jax.random.PRNGKey(100 + i)
    k1, k2 = jax.random.split(k)
    return (jax.random.normal(k1, (2, 4, CFG.in_channels)),
            jax.random.normal(k2, (2, 6, CFG.context_in_dim)).astype(jnp.bfloat16))


def _run(params, opt_state, train_step, steps, start=0):
    for i in range(start, start + steps):
        lat, cond = _batch(i)
        params, opt_state, loss = train_step(
            params, opt_state, jax.random.PRNGKey(i), lat, cond)
    return params, opt_state, loss


def test_train_checkpoint_resume_equivalence(tmp_path):
    optimizer, train_step = make_train_step(CFG)

    def fresh():  # train_step donates its buffers — re-init per branch
        p = dit.init(jax.random.PRNGKey(0), CFG)
        return p, optimizer.init(p)

    # straight 4 steps
    p_ref, _, loss_ref = _run(*fresh(), train_step, 4)

    # 2 steps → orbax save → restore → 2 more steps
    p_mid, o_mid, _ = _run(*fresh(), train_step, 2)
    save_pytree(str(tmp_path / "ckpt"), {"params": p_mid, "opt": o_mid})
    restored = load_pytree(str(tmp_path / "ckpt"),
                           target={"params": p_mid, "opt": o_mid})
    p_res, _, loss_res = _run(restored["params"], restored["opt"],
                              train_step, 2, start=2)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-5, rtol=1e-5),
        p_ref, p_res)
    np.testing.assert_allclose(float(loss_ref), float(loss_res), atol=1e-5)
