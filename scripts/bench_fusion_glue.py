"""Micro-benchmark: inter-block layout glue cost (window<->image round trip).

Same slope protocol as bench_fusion_micro.py, but the depth-loop body wraps
every fused block in the model's actual glue: slice pad rows -> window_reverse
-> roll -> roll -> window_partition -> pad (nn/swinfusion.py FusionBlock).
slope(glue) - slope(bare) attributes the per-block XLA glue cost.

Usage: python scripts/bench_fusion_glue.py [fwd|train]
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

from multimodal_neuroimage_tpu.nn.common import (window_partition,  # noqa: E402
                                                 window_reverse)
from scripts.bench_fusion_micro import (B, C, GRID, N, NP, NW, RATES,  # noqa: E402
                                        WS, make_inputs)
from multimodal_neuroimage_tpu.ops.fusion_block import (  # noqa: E402
    fused_fusion_block)

H_IMG = W_IMG = GRID * WS


GLUE_MODE = os.environ.get("GLUE_MODE", "chain")   # chain | perm


def glue_stack_fn(depth, train=True):
    x, _, params, bias, mask, dp = make_inputs()
    from multimodal_neuroimage_tpu.nn.common import window_perm_indices
    e0, x0_ = window_perm_indices(H_IMG, W_IMG, WS, 0, NP)
    e3, x3_ = window_perm_indices(H_IMG, W_IMG, WS, 3, NP)
    perms = {0: (jnp.asarray(e0), jnp.asarray(x0_)),
             3: (jnp.asarray(e3), jnp.asarray(x3_))}

    def one_block_perm(h, i, seed, shift):
        """h rides flattened token-major (B, L, C); ONE gather each way."""
        entry, exit_ = perms[3 if shift else 0]
        t = jnp.take(h, entry, axis=1).reshape(B, NW, NP, C)
        out = fused_fusion_block(t, params, bias, mask if shift else None,
                                 dp, seed + i, RATES, train)
        return jnp.take(out.reshape(B, NW * NP, C), exit_, axis=1)

    def one_block(h, i, seed, shift):
        if GLUE_MODE == "perm":
            return one_block_perm(h, i, seed, shift)
        t = window_reverse(h[:, :, :N, :], WS, H_IMG, W_IMG)
        if shift:
            t = jnp.roll(t, shift=(-3, -3), axis=(1, 2))
        t = window_partition(t, WS)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, NP - N), (0, 0)))
        out = fused_fusion_block(t, params, bias, mask if shift else None,
                                 dp, seed + i, RATES, train)
        t = window_reverse(out[:, :, :N, :], WS, H_IMG, W_IMG)
        if shift:
            t = jnp.roll(t, shift=(3, 3), axis=(1, 2))
        t = window_partition(t, WS)
        return jnp.pad(t, ((0, 0), (0, 0), (0, NP - N), (0, 0)))

    def fwd_loss(x0, seed):
        if GLUE_MODE == "perm":                     # carry rides (B, L, C)
            x0 = jnp.take(x0.reshape(B, NW * NP, C), perms[0][1], axis=1)

        def body(i, h):
            h = one_block(h, 2 * i, seed, False)
            h = one_block(h, 2 * i + 1, seed, True)
            return h
        h = jax.lax.fori_loop(0, depth // 2, body, x0)
        return jnp.sum(h)

    if train:
        @jax.jit
        def run(x0, seed):
            v, g = jax.value_and_grad(fwd_loss)(x0, seed)
            return v + jnp.sum(g)
    else:
        run = jax.jit(fwd_loss)
    return run, x


def time_depth(depth, train, iters=12):
    fn, x = glue_stack_fn(depth, train=train)
    seed = jnp.asarray(1, jnp.int32)
    float(fn(x, seed))
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            v = fn(x + (i + w) * 1e-6, seed + i)
        float(v)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    train = (sys.argv[1] if len(sys.argv) > 1 else "train") == "train"
    d1 = int(os.environ.get('MICRO_D1', '4'))
    d2 = int(os.environ.get('MICRO_D2', '28'))
    t1, t2 = time_depth(d1, train), time_depth(d2, train)
    per = (t2 - t1) / (d2 - d1)
    print(f"glue+block/{'train' if train else 'fwd'}: {per*1e3:.3f} ms/block"
          f"  (d{d1}={t1*1e3:.1f} ms, d{d2}={t2*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
