"""HBM bandwidth probe: what fraction of the v5e's 819 GB/s spec can
this chip actually deliver for the access patterns decode uses?

Three rates, each measured as bytes-moved / wall-clock over a jitted
multi-step scan (one dispatch, fetch-timed — see bench.py notes on
dispatch-relay timing):

1. pure-read reduce: jnp.sum over a large bf16 array — the practical
   read speed-of-light (no MXU, no writes).
2. pallas stream-reduce: a Pallas kernel DMA-ing [block, 128*k] tiles
   through VMEM with a ring buffer — what hand-written streaming
   achieves vs XLA's reduce.
3. skinny GEMM chain: [BS, d] x [d, F] matmuls over stacked layers (the
   decode shape) — the weight-streaming envelope the engine lives under.

If (1) lands well below spec, the roofline gap in bench.py is platform,
not engine. Usage: python scripts/hbm_probe.py [BS]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _rate(fn, args, nbytes, steps, label):
    np.asarray(fn(*args))  # compile + first run
    t0 = time.perf_counter()
    np.asarray(fn(*args))
    dt = time.perf_counter() - t0
    gbs = nbytes * steps / dt / 1e9
    print(f"{label}: {gbs:.1f} GB/s  ({dt*1e3:.1f} ms / {steps} steps)")
    return gbs


def probe_reduce(nbytes=2 << 30, steps=20):
    n = nbytes // 2
    x = jnp.ones((n,), jnp.bfloat16)
    span = n - steps

    @jax.jit
    def run(x):
        # per-iteration dynamic-slice offset makes the reduce
        # loop-VARIANT (XLA LICM would hoist a loop-invariant sum and
        # measure one read instead of `steps`); the slice fuses into the
        # reduce, so each step still streams ~the whole array once
        def step(c, off):
            w = jax.lax.dynamic_slice(x, (off,), (span,))
            return c + jnp.sum(w, dtype=jnp.float32), None

        c, _ = jax.lax.scan(
            step, jnp.float32(0), jnp.arange(steps, dtype=jnp.int32)
        )
        return c

    return _rate(run, (x,), span * 2, steps, "xla reduce (pure read)")


def probe_pallas_stream(nbytes=2 << 30, steps=20, block=2048, lanes=512):
    from jax.experimental import pallas as pl

    if jax.default_backend() != "tpu":
        print("pallas stream-reduce: skipped (TPU only)")
        return 0.0

    rows = nbytes // 2 // lanes
    rows = rows // block * block
    x = jnp.ones((rows, lanes), jnp.bfloat16)

    def kernel(c_ref, x_ref, o_ref):
        # the carry flows THROUGH the kernel so the pallas_call is
        # loop-variant (LICM cannot hoist it out of the scan). Lane-wide
        # accumulator: Mosaic rejects scalar stores to VMEM.
        @pl.when(pl.program_id(0) == 0)
        def _():
            o_ref[...] = jnp.broadcast_to(
                c_ref[...], o_ref.shape
            ).astype(jnp.float32)

        o_ref[...] += jnp.sum(x_ref[...], dtype=jnp.float32)

    grid = rows // block
    reduce_p = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec((block, lanes), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, lanes), jnp.float32),
    )

    @jax.jit
    def run(x):
        def step(c, _):
            return reduce_p(c.reshape(1, 1), x)[0, 0], None

        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=steps)
        return c

    return _rate(
        run, (x,), rows * lanes * 2, steps,
        f"pallas stream-reduce (block={block}x{lanes})",
    )


def probe_gemm_chain(bs=16, d=2048, f=5632, layers=44, steps=20):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (layers, d, f), jnp.bfloat16)
    w2 = jax.random.normal(key, (layers, f, d), jnp.bfloat16)
    x0 = jax.random.normal(key, (bs, d), jnp.bfloat16)

    @jax.jit
    def run(x, w, w2):
        def layer(x, ws):
            a, b = ws
            h = jnp.dot(x, a, preferred_element_type=jnp.float32)
            return jnp.dot(
                h.astype(jnp.bfloat16), b, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16), None

        def step(x, _):
            x, _ = jax.lax.scan(layer, x, (w, w2))
            return x, None

        x, _ = jax.lax.scan(step, x, None, length=steps)
        return x

    nbytes = (w.size + w2.size) * 2
    return _rate(
        run, (x0, w, w2), nbytes, steps,
        f"skinny GEMM chain (bs={bs}, {layers}x[{d},{f}])",
    )


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    print("backend:", jax.default_backend(), jax.devices()[0])
    r1 = probe_reduce()
    r2 = probe_pallas_stream()
    r3 = probe_gemm_chain(bs=bs)
    spec = 819.0
    print(
        f"fractions of 819 GB/s spec: reduce {r1/819:.2f}, "
        f"pallas {r2/819:.2f}, gemm {r3/819:.2f}"
    )


if __name__ == "__main__":
    main()
