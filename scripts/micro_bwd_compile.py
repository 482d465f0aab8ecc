#!/usr/bin/env python
"""Isolated compile+run check of the backward compositor Pallas kernel.

Usage: python scripts/micro_bwd_compile.py [--nt 8] [--cap 128]
Compares GSAVATARS_BWD_IMPL variants for compile time and runtime.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nt", type=int, default=8)
    p.add_argument("--cap", type=int, default=128)
    p.add_argument("--ntx", type=int, default=4)
    p.add_argument("--iters", type=int, default=50)
    a = p.parse_args()

    from gaussianavatars_tpu.ops.pallas import composite as C

    nt, cap = a.nt, a.cap
    th = tw = 32
    pdim = th * tw
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    g_mean2d = jax.random.uniform(ks[0], (nt, cap, 2)) * 32.0
    g_conic = jnp.abs(jax.random.normal(ks[1], (nt, cap, 3))) * 0.1 + 0.05
    g_color = jax.random.uniform(ks[2], (nt, cap, 3))
    g_opac = jax.random.uniform(ks[3], (nt, cap), minval=0.3, maxval=0.9)
    counts = jnp.full((nt,), cap, jnp.int32)

    def f(m, co, cl, op):
        acc, tfin = C.composite_tiles_pallas((th, tw, a.ntx), m, co, cl, op, counts)
        return jnp.sum(acc * 1.7) + jnp.sum(tfin)

    grad_fn = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))
    t0 = time.time()
    g = grad_fn(g_mean2d, g_conic, g_color, g_opac)
    jax.block_until_ready(g)
    print(f"impl={os.environ.get('GSAVATARS_BWD_IMPL', 'moments')} "
          f"compile+run: {time.time() - t0:.1f}s")

    @jax.jit
    def loop(s):
        def body(i, carry):
            g = grad_fn(g_mean2d + carry * 1e-20, g_conic, g_color, g_opac)
            return carry + g[0][0, 0, 0] * 0 + 1.0
        return jax.lax.fori_loop(0, a.iters, body, s)

    float(loop(jnp.zeros(())))
    t0 = time.perf_counter()
    float(loop(jnp.zeros(())))
    print(f"fwd+bwd per call: {(time.perf_counter()-t0)/a.iters*1e3:.3f} ms "
          f"(nt={nt} cap={cap})")


if __name__ == "__main__":
    main()
