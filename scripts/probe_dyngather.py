"""Probe: tpu.dynamic_gather on the TensorCore with idx shape != source shape.

The Pallas lax.gather lowering artificially requires idx.shape == source.shape;
the MLIR op itself only requires the non-collapsed dims to match
(out[s, j] = src[idx[s, j] mod N, j]).  If the Mosaic TC compiler accepts a
(S, 128) gather from an (N, 128) source, broadcasting each ray's node id
across lanes gives a FULL-ROW gather: out[s, :] = src[node_s, :] — the
traversal gather, inside one kernel.  Measures cost scaling with N to learn
whether the lowering is a hardware gather (flat) or a select-loop (linear).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax._src import core as jax_core
from jax._src.pallas.mosaic import lowering as tc_lowering
from jax.experimental import pallas as pl
from jax.experimental.mosaic.dialects import tpu
from jax.experimental.pallas import tpu as pltpu

dyn_gather_p = jax_core.Primitive("bvh_dyn_gather")


@dyn_gather_p.def_abstract_eval
def _abs(source, idx):
    return jax_core.ShapedArray(idx.shape, source.dtype)


@tc_lowering.register_lowering_rule(dyn_gather_p)
def _rule(ctx, source, idx):
    return tpu.dynamic_gather(source, idx, [0])


def dyn_gather(source, idx):
    return dyn_gather_p.bind(source, idx)


def make_kernel(n, steps, s_rows=8):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:]

        def body(s, c):
            idx, acc = c
            # idx: (S, 128) — each sublane s holds one node id broadcast
            # across lanes, so the gather returns S full rows
            rows = dyn_gather(tab, idx)  # (S, 128)
            acc = acc + rows
            nxt = rows[:, 48:49].astype(jnp.int32)  # (S, 1)
            idx = jnp.broadcast_to(nxt, idx.shape)
            return idx, acc

        idx, acc = jax.lax.fori_loop(
            0, steps, body, (idx_ref[:], jnp.zeros((s_rows, 128), jnp.float32))
        )
        out_ref[:] = acc + idx.astype(jnp.float32)

    @jax.jit
    def run(tab, idx0):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((s_rows, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx0)

    return run


def main():
    key = jax.random.PRNGKey(0)
    steps = 512
    for n in (256, 2048, 20480):
        tab = jax.random.normal(key, (n, 128), jnp.float32)
        tab = tab.at[:, 48].set(
            jax.random.randint(key, (n,), 0, n).astype(jnp.float32)
        )
        idx0 = jnp.broadcast_to(
            jax.random.randint(key, (8, 1), 0, n), (8, 128)
        ).astype(jnp.int32)
        try:
            run = make_kernel(n, steps)
            out = np.asarray(run(tab, idx0))
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                for _ in range(8):
                    o = run(tab, idx0)
                np.asarray(o)
                best = min(best, (time.perf_counter() - t0) / 8)
            n_rows = 8 * steps
            print(f"N={n}: {best*1e3:.3f} ms, {best/n_rows*1e9:.1f} ns/row "
                  f"(out[0,0]={out[0,0]:.2f})")
        except Exception as e:
            msg = str(e).split("\n")[0][:300]
            print(f"N={n}: FAILED — {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
