"""Round-5 probe: per-row gather rates for the G-buffer resolve's tables.

resolve_gbuffer measured 121 ms at 1080p (scripts/attr_gbuffer.py) with a
~14 idx/px budget; this probe measures each table shape's actual rate at
2M-index width to decide the restructure (quad-packed atlas rows, prim
folded into TriRow, row widths).

Run: python scripts/bench_resolve_gathers.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=4, inner=8):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main():
    key = jax.random.PRNGKey(0)
    nidx = 1920 * 1080  # one index per pixel
    print(f"devices: {jax.devices()}  idx width {nidx}", flush=True)

    g = jax.jit(lambda tab, i: jnp.sum(tab[i], axis=-1))
    g2d = jax.jit(lambda tab, i: jnp.sum(tab[i], axis=-1))

    for n, w_row in [
        (108732, 40),   # TriRow today
        (108732, 72),   # TriRow + folded prim
        (108732, 128),  # full-width row
        (1024, 32),     # PrimRow (tiny table)
        (16384, 4),     # small atlas, 4-channel rows (atlas4 today)
        (16384, 16),    # small atlas, quad rows
        (262144, 4),    # 512^2 atlas, atlas4
        (262144, 16),   # 512^2 atlas, quad rows
        (262144, 128),  # 512^2 atlas padded to full rows
        (1048576, 16),  # 1024^2 atlas, quad rows
    ]:
        tab = jax.random.normal(key, (n, w_row), jnp.float32)
        idx = jax.random.randint(key, (nidx,), 0, n)
        jax.block_until_ready((tab, idx))
        t = timeit(g, tab, idx)
        print(f"({n:>8},{w_row:>4}) gather x 2M idx: {t:8.2f} ms  "
              f"{t * 1e6 / nidx:6.2f} ns/idx", flush=True)

    # 2-D image-shaped indices (the resolve's actual shape): same table,
    # (H, W) idx
    tab = jax.random.normal(key, (108732, 40), jnp.float32)
    idx = jax.random.randint(key, (1080, 1920), 0, 108732)
    jax.block_until_ready((tab, idx))
    t = timeit(g2d, tab, idx)
    print(f"(108732, 40) gather, (1080,1920) idx: {t:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
