"""Micro-bench: span-sum strategies for 50k convex-hull window reductions.

Decides how check_convex_polygons should fetch per-hull map values:
A) row-span prefix gathers (round-1 shipped: 2x 2-wide jnp.take per row)
B) one vmapped dynamic_slice window per hull + masked reduce (1 packed plane)
C) crossing-test inside mask via factored monotone compare (cheaper flops)
"""

from __future__ import annotations

import statistics
import os
import sys
import time

import numpy as np

# self-bootstrap: run from a fresh checkout without installing the package.
# APPEND (never overwrite PYTHONPATH / prepend): this host's TPU plugin lives
# on PYTHONPATH and must keep winning import resolution.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    H = W = 336
    B = 50176
    wi, wj = 37, 27
    rng = np.random.default_rng(0)

    plane = jnp.asarray(rng.random((H, W)), jnp.float32)
    anchors = jnp.asarray(
        np.stack(
            [rng.integers(0, H, B), rng.integers(0, W, B)], axis=-1
        ).astype(np.int32)
    )
    inside = jnp.asarray(rng.random((B, wi, wj)) < 0.6)

    _probe = jax.jit(lambda a: a + 1.0)
    np.asarray(_probe(jnp.ones((8, 8))))
    rtts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(_probe(jnp.ones((8, 8))))
        rtts.append(time.perf_counter() - t)
    RTT = statistics.median(rtts)
    print(f"RTT {RTT*1e3:.1f} ms", file=sys.stderr)

    def timed(name, fn, arg, K=8):
        looped = jax.jit(
            lambda a: jax.lax.scan(lambda c, _: (fn(c), None), a, None, length=K)[0]
        )
        jax.block_until_ready(looped(arg))
        t0 = time.perf_counter()
        jax.block_until_ready(looped(arg))
        dt = max(time.perf_counter() - t0 - RTT, 1e-9) / K
        print(f"{name:44s} {dt*1e3:8.3f} ms", file=sys.stderr)
        return dt

    pad = max(wi, wj)
    padded = jnp.pad(plane, pad, constant_values=jnp.nan)

    # B) one dynamic_slice window per hull, masked reduce
    def window_reduce(x):
        start = anchors + pad - jnp.asarray([wi // 2, wj // 2], jnp.int32)
        start = start + (x[0, 0] * 0).astype(jnp.int32)

        def one(ij):
            return jax.lax.dynamic_slice(padded, (ij[0], ij[1]), (wi, wj))

        win = jax.vmap(one)(start)  # (B, wi, wj)
        p = jnp.where(inside, win, jnp.nan)
        n = jnp.sum(jnp.where(p >= 0.0, 1.0, 0.0), axis=(1, 2))
        s = jnp.sum(jnp.where(p >= 0.0, p, 0.0), axis=(1, 2))
        return x + 1e-12 * (n[0] + s[0])

    timed("B window dynamic_slice + reduce", window_reduce, jnp.zeros((4, 4)))

    # B') window fetch alone
    def window_only(x):
        start = anchors + pad - jnp.asarray([wi // 2, wj // 2], jnp.int32)
        start = start + (x[0, 0] * 0).astype(jnp.int32)

        def one(ij):
            return jax.lax.dynamic_slice(padded, (ij[0], ij[1]), (wi, wj))

        win = jax.vmap(one)(start)
        return x + 1e-12 * jnp.sum(win[:, 0, 0])

    timed("B' window fetch only", window_only, jnp.zeros((4, 4)))

    # A) row-span style gathers for comparison (2 ends x 2-wide per row)
    combo = jnp.stack([plane, plane * 0.5], axis=-1).reshape(-1, 2)
    g0 = jnp.asarray(rng.integers(0, W, (B, wi)).astype(np.int32))
    g1 = jnp.clip(g0 + 10, 0, W - 1)
    rows = jnp.clip(anchors[:, 0:1] + jnp.arange(wi, dtype=jnp.int32) - wi // 2, 0, H - 1)

    def span_gathers(x):
        lin0 = rows * W + g0 + (x[0, 0] * 0).astype(jnp.int32)
        lin1 = rows * W + g1
        v0 = jnp.take(combo, lin0, axis=0)
        v1 = jnp.take(combo, lin1, axis=0)
        d = v1 - v0
        return x + 1e-12 * jnp.sum(d[:, 0, :])

    timed("A span prefix takes (2x2-wide per row)", span_gathers, jnp.zeros((4, 4)))



if __name__ == "__main__":
    main()
