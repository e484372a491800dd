"""Round-5 design probe: can Pallas gather BVH8 rows at >= the XLA rate?

The round-4 verdict asks for a compacting Pallas traversal (persistent-threads)
to kill the strip-max tax on the AO wavefront.  Its feasibility hinges on one
number: the in-kernel rate of a data-dependent row gather from a VMEM-resident
(N, 128) f32 table.  XLA's gather measured ~3.6 ns/index VMEM-resident
(docs/PERF_STATUS.md rule 2/5); this script measures the Pallas candidates:

  A. XLA baseline: dependent-gather while_loop at width W (re-confirm 3.6).
  B. Pallas, vector gather: jnp.take(table, idx, axis=0) inside the kernel.
  C. Pallas, one-hot/take_along_axis variants if B fails to lower.
  D. Pallas, scalar fori_loop of dynamically indexed row loads.

Synthetic dependent walk: table col 48 holds random next-row ids, so step i's
gather depends on step i-1's rows (no pipelining-away the chase).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 20480  # rows (10.5 MB f32 table, Sponza-sized)
W = 1024  # gather width per step (8 x 128)
STEPS = 512


def make_table(key):
    tab = jax.random.normal(key, (N, 128), jnp.float32)
    nxt = jax.random.randint(key, (N,), 0, N).astype(jnp.float32)
    return tab.at[:, 48].set(nxt)


def timeit(fn, *args, reps=5, inner=8):
    """np.asarray-materialized timing (block_until_ready can return early on
    the tunneled runtime); `inner` back-to-back dispatches amortize the ~23 ms
    dispatch latency out of the per-call number."""
    out = np.asarray(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(inner):
            o = fn(*args)
        out = np.asarray(o)
        best = min(best, (time.perf_counter() - t0) / inner)
    return best, out


@jax.jit
def xla_walk(tab, idx0):
    def body(c):
        idx, acc, s = c
        rows = tab[idx]  # (W, 128) gather
        acc = acc + jnp.sum(rows[:, 0])
        idx = rows[:, 48].astype(jnp.int32)
        return idx, acc, s + 1

    idx, acc, _ = jax.lax.while_loop(
        lambda c: c[2] < STEPS, body, (idx0, jnp.float32(0), jnp.int32(0))
    )
    return acc + jnp.sum(idx)


def pallas_vector_gather():
    """B: jnp.take inside the kernel, full table in VMEM."""

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(s, c):
            idx, acc = c
            rows = jnp.take(tab, idx.reshape(-1), axis=0)  # (W, 128)
            acc = acc + jnp.sum(rows[:, 0])
            idx = rows[:, 48].astype(jnp.int32).reshape(8, W // 8)
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, STEPS, body, (idx_ref[:], jnp.float32(0))
        )
        out_ref[0, 0] = acc + jnp.sum(idx).astype(jnp.float32)

    @jax.jit
    def run(tab, idx0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab, idx0.reshape(8, W // 8))

    return run


def pallas_dyn_slice_loop():
    """D: scalar fori_loop of dynamic row loads (idx in SMEM)."""

    def kernel(idx_ref, tab_ref, out_ref, acc_ref):
        def step(s, acc):
            def ray(i, a):
                j = idx_ref[i]
                row = tab_ref[j, :]  # (128,) dynamic sublane load
                return a + row[0]

            return jax.lax.fori_loop(0, W, ray, acc)

        acc_ref[0, 0] = jax.lax.fori_loop(0, STEPS, step, jnp.float32(0))
        out_ref[0, 0] = acc_ref[0, 0]

    @jax.jit
    def run(tab, idx0):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            grid_spec=grid_spec,
        )(idx0, tab)

    return run


def pallas_take_along_axis():
    """C: take_along_axis on the sublane axis (tpu.DynamicGatherOp probe):
    out[i, j] = tab[idx[i, j], j] — per-LANE row indices.  Not the row gather
    traversal needs (each ray needs a whole row), but if this lowers fast we
    can restructure the table as 128 lane-planes."""

    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(s, c):
            idx, acc = c
            rows = jnp.take_along_axis(tab, idx, axis=0)  # (8, 128)
            acc = acc + jnp.sum(rows[:, 0])
            idx = (idx + rows.astype(jnp.int32) * 7 + s) % N
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, STEPS, body, (idx_ref[:], jnp.float32(0))
        )
        out_ref[0, 0] = acc + jnp.sum(idx).astype(jnp.float32)

    @jax.jit
    def run(tab, idx0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab, idx0.reshape(8, W // 8))

    return run


def main():
    key = jax.random.PRNGKey(0)
    tab = make_table(key)
    idx0 = jax.random.randint(key, (W,), 0, N)
    jax.block_until_ready(tab)
    total_idx = W * STEPS

    t, out = timeit(xla_walk, tab, idx0)
    print(f"A xla dependent gather: {t*1e3:.3f} ms  "
          f"{t/total_idx*1e9:.2f} ns/idx  (out={float(out):.1f})")

    for name, maker in [
        ("B pallas jnp.take", pallas_vector_gather),
        ("C pallas take_along_axis", pallas_take_along_axis),
        ("D pallas scalar loop", pallas_dyn_slice_loop),
    ]:
        try:
            run = maker()
            t, out = timeit(run, tab, idx0)
            n_idx = total_idx if name[0] != "C" else 8 * 128 * STEPS
            print(f"{name}: {t*1e3:.3f} ms  {t/n_idx*1e9:.2f} ns/idx  "
                  f"(out={float(out.reshape(-1)[0]):.1f})")
        except Exception as e:
            msg = str(e).split("\n")[0][:200]
            print(f"{name}: FAILED — {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
