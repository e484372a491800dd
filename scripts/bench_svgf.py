"""SVGF standalone on the real TPU: temporal reprojection vs a-trous
iterations at 1080p, after the patch-row temporal rewrite."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def main():
    from vulkanhybridrenderer_tpu.core.types import TemporalState
    from vulkanhybridrenderer_tpu.ops import svgf

    h, w = 1080, 1920
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)
    normal = jax.random.normal(ks[0], (3, h, w))
    normal = normal / jnp.linalg.norm(normal, axis=0, keepdims=True)
    normal_oid = jnp.concatenate(
        [normal, jax.random.randint(ks[1], (1, h, w), 0, 5).astype(jnp.float32)]
    )
    motion_mr = jax.random.uniform(ks[2], (4, h, w)) * 0.01
    shadow_ao = jax.random.uniform(ks[3], (4, h, w))
    state = TemporalState(
        shadow_ao_history=jax.random.uniform(ks[4], (2, h, w)),
        moments_history=jax.random.uniform(ks[5], (4, h, w)),
        prev_normal_oid=normal_oid,
    )

    temporal = jax.jit(svgf.temporal)
    ms = timeit(temporal, normal_oid, motion_mr, shadow_ao, state)
    print(f"temporal (patch-row): {ms:7.1f} ms")

    integrated = jnp.concatenate([shadow_ao[:2], shadow_ao[2:] * 0.1])

    one = jax.jit(lambda x: svgf.atrous_iteration(x, normal_oid, 2))
    ms = timeit(one, integrated)
    print(f"one a-trous iter:     {ms:7.1f} ms")

    den = jax.jit(lambda s, st: svgf.denoise(normal_oid, motion_mr, s, st))
    ms = timeit(den, shadow_ao, state)
    print(f"full denoise (t+5i):  {ms:7.1f} ms")


if __name__ == "__main__":
    main()
