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
    p.add_argument("--fwd", action="store_true",
                   help="also compile+time the forward kernel variants "
                        "(GSAVATARS_FWD_IMPL loop vs cumprod)")
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

    # Sweep the backward implementations (or just the one forced via env):
    # each gets a fresh jax.jit so GSAVATARS_BWD_IMPL is re-read at trace
    # time. The fastest one that compiles+runs is printed as BEST= for the
    # measurement runbook to export; exit nonzero only if ALL fail.
    forced = os.environ.get("GSAVATARS_BWD_IMPL")
    impls = [forced] if forced else ["cumsum", "moments", "replay"]
    timings: dict[str, float] = {}
    for impl in impls:
        os.environ["GSAVATARS_BWD_IMPL"] = impl
        grad_fn = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))

        @jax.jit
        def loop(s, grad_fn=grad_fn):
            def body(i, carry):
                g = grad_fn(g_mean2d + carry * 1e-20, g_conic, g_color, g_opac)
                return carry + g[0][0, 0, 0] * 0 + 1.0
            return jax.lax.fori_loop(0, a.iters, body, s)

        try:
            t0 = time.time()
            float(loop(jnp.zeros(())))
            t_compile = time.time() - t0
            t0 = time.perf_counter()
            float(loop(jnp.zeros(())))
            per_call = (time.perf_counter() - t0) / a.iters * 1e3
            timings[impl] = per_call
            print(f"bwd impl={impl}: compile+run {t_compile:.1f}s, "
                  f"fwd+bwd {per_call:.3f} ms/call (nt={nt} cap={cap})")
        except Exception as e:
            print(f"bwd impl={impl}: FAILED {type(e).__name__}: {e}")
    if forced:
        os.environ["GSAVATARS_BWD_IMPL"] = forced
    else:
        os.environ.pop("GSAVATARS_BWD_IMPL", None)
    if not timings:
        print("BEST=none")
        sys.exit(1)
    best = min(timings, key=timings.get)
    print(f"BEST={best}")

    if a.fwd:
        # Forward-only kernel variants: a fresh jax.jit per impl re-reads the
        # env var at trace time.
        for impl in ("loop", "cumprod"):
            os.environ["GSAVATARS_FWD_IMPL"] = impl

            def fwd_only(m):
                acc, tfin = C.composite_tiles_pallas(
                    (th, tw, a.ntx), m, g_conic, g_color, g_opac, counts)
                return jnp.sum(acc) + jnp.sum(tfin)

            @jax.jit
            def floop(s):
                def body(i, carry):
                    return carry + fwd_only(g_mean2d + carry * 1e-20) * 0 + 1.0
                return jax.lax.fori_loop(0, a.iters, body, s)

            try:
                t0 = time.time()
                float(floop(jnp.zeros(())))
                t_compile = time.time() - t0
                t0 = time.perf_counter()
                float(floop(jnp.zeros(())))
                print(f"fwd impl={impl}: compile+run {t_compile:.1f}s, "
                      f"{(time.perf_counter()-t0)/a.iters*1e3:.3f} ms/call")
            except Exception as e:  # a failed variant must not fail the gate
                print(f"fwd impl={impl}: FAILED {type(e).__name__}: {e}")
        os.environ.pop("GSAVATARS_FWD_IMPL", None)


if __name__ == "__main__":
    main()
