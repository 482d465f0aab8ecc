#!/usr/bin/env python
"""Microbenchmark: per-slot reduction strategies inside a Pallas TPU kernel.

The backward compositor needs, per chunk of K=64 slots, 9 scalar reductions
per slot over the [8, 128] pixel block. This script times candidate
implementations of that inner pattern in isolation (same grid/chunk structure
as the real kernel) to pick the winner:

  A  per-slot jnp.sum + stack              (round-1 shipping version)
  B  two-step vectorized reduce            (lane reduce then sublane reduce)
  C  batched dot_general per basis field   (rows as batch dim, MXU)
  D  reshape [K,8,128]->[K,1024] + one dot (MXU, single matmul)

Each kernel consumes the same [NT, C] parameter table and produces [NT, C]
sums; timings use the chained fori_loop protocol (see bench.py).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 468          # tiles at 802x550 / 32x32
C = 512           # capacity
K = 64            # chunk
ROWS, LANES = 8, 128
N_CHUNKS = C // K
NRED = 9


def _fields(x, base):
    """Slot-broadcast planes for a chunk, mimicking the real load."""
    v = x[0, pl.ds(base, K), 0]            # [K]
    ones = jnp.ones((1, ROWS, LANES), jnp.float32)
    return v.reshape(K, 1, 1) * ones        # [K, ROWS, LANES]


def kern_a(x_ref, o_ref):
    def chunk(k, acc):
        base = k * K
        f = _fields(x_ref, base)
        outs = []
        for j in range(K):
            s = 0.0
            for r in range(NRED):
                s = s + jnp.sum(f[j] * (1.0 + r))
            outs.append(s)
        o_ref[0, pl.ds(base, K), 0] = jnp.stack(outs)
        return acc + 1

    jax.lax.fori_loop(0, N_CHUNKS, chunk, 0)


def kern_b(x_ref, o_ref):
    def chunk(k, acc):
        base = k * K
        f = _fields(x_ref, base)
        s = jnp.zeros((K,), jnp.float32)
        for r in range(NRED):
            prod = f * (1.0 + r)
            s = s + jnp.sum(jnp.sum(prod, axis=2), axis=1)
        o_ref[0, pl.ds(base, K), 0] = s
        return acc + 1

    jax.lax.fori_loop(0, N_CHUNKS, chunk, 0)


def kern_c(x_ref, o_ref):
    basis = [
        jnp.full((ROWS, LANES), 1.0 + r, jnp.float32) for r in range(NRED)
    ]

    def chunk(k, acc):
        base = k * K
        f = _fields(x_ref, base)
        s = jnp.zeros((K,), jnp.float32)
        for r in range(NRED):
            # [K,ROWS,LANES] x [ROWS,LANES] -> batch over rows -> [ROWS, K]
            d = jax.lax.dot_general(
                f, basis[r],
                dimension_numbers=(((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.float32,
            )
            s = s + jnp.sum(d, axis=0)
        o_ref[0, pl.ds(base, K), 0] = s
        return acc + 1

    jax.lax.fori_loop(0, N_CHUNKS, chunk, 0)


def kern_d(x_ref, o_ref):
    cols = []
    for r in range(NRED):
        cols.append(jnp.full((ROWS * LANES, 1), 1.0 + r, jnp.float32))
    bmat = jnp.concatenate(cols, axis=1)  # [P, NRED]

    def chunk(k, acc):
        base = k * K
        f = _fields(x_ref, base).reshape(K, ROWS * LANES)
        d = jax.lax.dot_general(
            f, bmat, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [K, NRED]
        o_ref[0, pl.ds(base, K), 0] = jnp.sum(d, axis=1)
        return acc + 1

    jax.lax.fori_loop(0, N_CHUNKS, chunk, 0)


def run(kern, name, x):
    call = pl.pallas_call(
        kern,
        grid=(NT,),
        in_specs=[pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, C, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((NT, C, 1), jnp.float32),
    )

    @jax.jit
    def loop(s):
        def body(i, carry):
            out = call(x + carry * 1e-20)
            return out[0, 0, 0] * 0.0 + carry + 1.0
        return jax.lax.fori_loop(0, 50, body, s)

    try:
        float(loop(jnp.zeros(())))  # compile + warm
        t0 = time.perf_counter()
        float(loop(jnp.zeros(())))
        dt = (time.perf_counter() - t0) / 50
        print(f"{name}: {dt*1e3:8.3f} ms")
        return dt
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED — {type(e).__name__}: {str(e)[:200]}")
        return None


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    x = jax.random.uniform(jax.random.PRNGKey(0), (NT, C, 1), jnp.float32)
    run(kern_a, "A per-slot sum loop      ", x)
    run(kern_b, "B two-step vector reduce ", x)
    run(kern_c, "C batched dot per field  ", x)
    run(kern_d, "D reshape + single dot   ", x)


if __name__ == "__main__":
    main()
