"""Block-size sweep for the Pallas flash attention at paint-UNet shapes."""

import time

import jax
import jax.numpy as jnp

from hunyuan3d2_tpu.ops.flash_attention import flash_attention


def timed(name, fn, n=5):
    fn(0)
    t0 = time.perf_counter()
    for i in range(1, n + 1):
        fn(i)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1e3:8.1f} ms", flush=True)
    return dt


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    key = jax.random.PRNGKey(0)
    shapes = [
        ("mv L0 (1,5,24576)", (1, 5, 24576, 64), (1, 5, 24576, 64)),
        ("mv L1 (1,10,6144)", (1, 10, 6144, 64), (1, 10, 6144, 64)),
        ("self L0 (6,5,4096)", (6, 5, 4096, 64), (6, 5, 4096, 64)),
        ("ref L0 (6,5,4096x8192)", (6, 5, 4096, 64), (6, 5, 8192, 64)),
    ]
    for name, qs, ks in shapes:
        q = jax.random.normal(key, qs, jnp.bfloat16)
        k = jax.random.normal(key, ks, jnp.bfloat16)
        for bq, bk in [(256, 256), (256, 512), (512, 512), (512, 1024),
                       (1024, 512), (1024, 1024), (2048, 1024)]:
            fa = jax.jit(lambda q, k, bq=bq, bk=bk: flash_attention(
                q, k, k, bq=bq, bk=bk))
            try:
                timed(f"{name} bq={bq} bk={bk}",
                      lambda i: sync(fa(q + i * 0.01, k)))
            except Exception as e:
                print(f"{name} bq={bq} bk={bk} FAILED {type(e).__name__}")


if __name__ == "__main__":
    main()
