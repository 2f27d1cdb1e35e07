"""Micro-benchmark: batch-lane-packed fused fusion blocks vs the standard
(B, nW, NP, C) kernels, at the flagship geometry and the same slope/value-
fetch protocol as bench_fusion_micro.py.

Usage: python scripts/bench_fusion_bp.py [self|cross|both] [fwd|train|both]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from scripts.bench_fusion_micro import (B, RATES, make_inputs)  # noqa: E402
from multimodal_neuroimage_tpu.ops.fusion_block_bp import (  # noqa: E402
    fused_cross_fusion_block_bp, fused_fusion_block_bp, to_bp)


def stack_fn(depth, cross=False, train=True):
    x, y, params, bias, mask, dp = make_inputs(cross=cross)
    xb, yb = to_bp(x), to_bp(y)
    import numpy as np
    mask_np = np.asarray(mask)          # static for _tiled_mask_bp

    def body_fn(i, carry, seed):
        h, hy = carry
        if cross:
            return (fused_cross_fusion_block_bp(
                h, hy, params, bias, mask_np, dp, seed + i, RATES, train),
                hy)
        return (fused_fusion_block_bp(h, params, bias, mask_np, dp,
                                      seed + i, RATES, train), hy)

    if train:
        @jax.jit
        def run(x0, seed):
            def loss(xx):
                h, _ = jax.lax.fori_loop(
                    0, depth, lambda i, c: body_fn(i, c, seed), (xx, yb))
                return jnp.sum(h)
            v, g = jax.value_and_grad(loss)(x0)
            return v + jnp.sum(g)
    else:
        @jax.jit
        def run(x0, seed):
            h, _ = jax.lax.fori_loop(
                0, depth, lambda i, c: body_fn(i, c, seed), (x0, yb))
            return jnp.sum(h)
    return run, xb


def time_depth(depth, cross, train, iters=12):
    fn, x = stack_fn(depth, cross=cross, train=train)
    seed = jnp.asarray(1, jnp.int32)
    float(fn(x, seed))
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            v = fn(x + (i + w) * 1e-6, seed + i)   # defeat content dedupe
        float(v)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def slope(cross, train, d1=int(os.environ.get('MICRO_D1', '4')),
          d2=int(os.environ.get('MICRO_D2', '28'))):
    t1 = time_depth(d1, cross, train)
    t2 = time_depth(d2, cross, train)
    per = (t2 - t1) / (d2 - d1)
    kind = "bp/" + ("cross" if cross else "self") + \
        ("/train" if train else "/fwd")
    print(f"{kind}: {per*1e3:.3f} ms/block  (d{d1}={t1*1e3:.1f} ms, "
          f"d{d2}={t2*1e3:.1f} ms)", flush=True)
    return per


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    phase = sys.argv[2] if len(sys.argv) > 2 else "both"
    for cross in ([False, True] if which == "both" else [which == "cross"]):
        for train in ([False, True] if phase == "both"
                      else [phase == "train"]):
            slope(cross, train)


if __name__ == "__main__":
    main()
