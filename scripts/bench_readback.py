"""Isolate the tunnel readback anomaly: uint8 device->host measured ~100x
slower than the same bytes as f32/int32 (round-3 profiling).  Times readback
of equal-byte buffers in several dtypes, both device_put inputs and jit
outputs."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def t_readback(x, n=3, label=""):
    jax.block_until_ready(x)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(x)
        best = min(best, (time.perf_counter() - t0) * 1e3)
    print(f"  {label:<42} {best:9.1f} ms")


print("devices:", jax.devices())
h, w = 1080, 1920

f = jax.jit(lambda a: (a + 1))
enc8 = jax.jit(lambda a: jnp.round(jnp.clip(a, 0, 1) * 255).astype(jnp.uint8))
lin = jax.block_until_ready(jnp.zeros((h, w, 4), jnp.float32) + 0.5)

u8 = jax.block_until_ready(enc8(lin))
t_readback(u8, label="uint8 (H,W,4) jit output 8.3MB")
u32 = jax.block_until_ready(jax.jit(
    lambda a: jax.lax.bitcast_convert_type(a, jnp.uint32))(u8))
print("  u32 shape:", u32.shape)
t_readback(u32, label="uint32 bitcast (H,W) jit output 8.3MB")
i8put = jax.device_put(np.zeros((h, w, 4), np.uint8))
t_readback(i8put, label="uint8 device_put 8.3MB")
f32s = jax.block_until_ready(f(jnp.zeros((h // 2, w // 2, 4), jnp.float32)))
t_readback(f32s, label="f32 (H/2,W/2,4) jit output 8.3MB")
f16 = jax.block_until_ready(jax.jit(lambda a: a.astype(jnp.float16))(lin))
t_readback(f16, label="f16 (H,W,4) jit output 16.6MB")
t_readback(jax.block_until_ready(f(lin)), label="f32 (H,W,4) jit output 33MB")
