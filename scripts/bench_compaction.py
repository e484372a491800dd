"""Round-5 design probe: what does RAY-level compaction actually cost on v5e?

The round-4 postmortem says the AO wavefront pays strip-MAX walks (~26 eff
steps vs mean 12); killing the tax needs requeue/compaction so retired rays
free lanes.  Rule 3 of the cost model ("scatters/nonzero at multi-million
widths ~100-200 ms") dates from round 2 and was measured on a different
formulation — this script re-measures each primitive a compacting traversal
would actually use, at the AO wavefront's widths:

  1. nonzero(mask, size=cap)            — survivor index extraction
  2. (N,128)/(N,32) row gather at[idx]  — packed per-ray state pickup
  3. (N,128)/(N,32) row scatter         — state/result write-back
  4. (K,M)[:, idx] lane-axis gather     — the _trace8_subpacket_phased layout
  5. (D,M)[:, idx] stack gather         — per-ray stacks in (D,R) layout
  6. lax.sort of (key, val) at width N  — binning-style partition alternative
  7. cumsum at width N                  — rank computation

Run: python scripts/bench_compaction.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def timeit(fn, *args, reps=4, inner=4):
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
    print(f"devices: {jax.devices()}", flush=True)

    for n, frac in [(1 << 20, 0.25), (1 << 22, 0.25), (1 << 22, 0.10)]:
        cap = int(n * frac)
        mask = jax.random.uniform(key, (n,)) < frac
        rows128 = jax.random.normal(key, (n, 128), jnp.float32)
        rows32 = jax.random.normal(key, (n, 32), jnp.float32)
        idx = jnp.sort(jax.random.randint(key, (cap,), 0, n))
        keys_ = jax.random.randint(key, (n,), 0, 1 << 20)
        vals = jnp.arange(n, dtype=jnp.int32)
        km = jax.random.normal(key, (4, n), jnp.float32)
        dm = jax.random.normal(key, (12, n), jnp.float32)
        jax.block_until_ready((mask, rows128, rows32, idx, keys_, km, dm))
        tag = f"n={n>>20}M cap={frac:.2f}"

        nz = jax.jit(partial(jnp.nonzero, size=cap, fill_value=n))
        t = timeit(nz, mask)
        print(f"{tag} nonzero(size)         {t:8.2f} ms", flush=True)

        g128 = jax.jit(lambda r, i: r[i])
        t = timeit(g128, rows128, idx)
        print(f"{tag} gather (cap,128)rows  {t:8.2f} ms  "
              f"{t*1e6/cap:.2f} ns/row", flush=True)
        t = timeit(g128, rows32, idx)
        print(f"{tag} gather (cap,32)rows   {t:8.2f} ms  "
              f"{t*1e6/cap:.2f} ns/row", flush=True)

        sc = jax.jit(lambda r, i, src: r.at[i].set(src))
        small128 = rows128[:cap]
        t = timeit(sc, rows128, idx, small128)
        print(f"{tag} scatter (cap,128)rows {t:8.2f} ms  "
              f"{t*1e6/cap:.2f} ns/row", flush=True)
        small32 = rows32[:cap]
        t = timeit(sc, rows32, idx, small32)
        print(f"{tag} scatter (cap,32)rows  {t:8.2f} ms  "
              f"{t*1e6/cap:.2f} ns/row", flush=True)

        glane = jax.jit(lambda a, i: a[:, i])
        t = timeit(glane, km, idx)
        print(f"{tag} gather (4,M)[:,idx]   {t:8.2f} ms  "
              f"{t*1e6/cap:.2f} ns/col", flush=True)
        t = timeit(glane, dm, idx)
        print(f"{tag} gather (12,M)[:,idx]  {t:8.2f} ms  "
              f"{t*1e6/cap:.2f} ns/col", flush=True)

        srt = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        t = timeit(srt, keys_, vals)
        print(f"{tag} lax.sort (k,v)        {t:8.2f} ms", flush=True)

        cs = jax.jit(lambda m: jnp.cumsum(m.astype(jnp.int32)))
        t = timeit(cs, mask)
        print(f"{tag} cumsum                {t:8.2f} ms", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
