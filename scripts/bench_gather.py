"""Gather cost-shape microbench on the real TPU.

Decides the traversal data layout: cost of row gathers vs column-split 1-D
gathers at wavefront sizes 16k..2M, row widths 8..64.  All timings min-of-3,
np.asarray-materialized.
"""
from __future__ import annotations

import time

import numpy as np


def bench(fn, n=3):
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    total = 217_463  # sponza-proxy node count
    rng = np.random.default_rng(0)
    tbl = {w: jnp.asarray(rng.normal(size=(total, w)).astype(np.float32))
           for w in (8, 16, 32, 64)}
    flat = {w: t.reshape(-1) for w, t in tbl.items()}

    for r in (16_384, 262_144, 2_073_600):
        idx = jnp.asarray(rng.integers(0, total, r).astype(np.int32))

        @jax.jit
        def row16(i=idx):
            return tbl[16][i].sum()

        @jax.jit
        def row64(i=idx):
            return tbl[64][i].sum()

        @jax.jit
        def cols16(i=idx):
            f = flat[16]
            return sum(f[i * 16 + c] for c in range(16)).sum()

        @jax.jit
        def cols8(i=idx):
            f = flat[8]
            return sum(f[i * 8 + c] for c in range(8)).sum()

        @jax.jit
        def col1(i=idx):
            return flat[16][i].sum()

        for name, fn in (("row16", row16), ("row64", row64),
                         ("cols16", cols16), ("cols8", cols8), ("col1", col1)):
            t = bench(fn)
            print(f"R={r:9d} {name}: {t*1e6:10.1f} us  "
                  f"({t/r*1e9:8.2f} ns/ray)", flush=True)


if __name__ == "__main__":
    main()
