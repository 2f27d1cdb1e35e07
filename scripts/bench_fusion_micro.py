"""Micro-benchmark: fused fusion-block kernels at the flagship geometry.

Slope timing per the measurement protocol (ROADMAP): time a stack of D1 and
D2 sequential blocks and report (t(D2)-t(D1))/(D2-D1) so fixed dispatch/fetch
overhead cancels. Every window ends with a VALUE FETCH (true sync on the
axon-tunneled backend). Inputs are re-derived from the previous output so the
tunnel's same-content dedupe cannot cache executions.

Usage: python scripts/bench_fusion_micro.py [self|cross|both] [fwd|train|both]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from multimodal_neuroimage_tpu.ops.fusion_block import (  # noqa: E402
    fused_cross_fusion_block, fused_fusion_block, packed_bias_from_table,
    param_shapes, round_up)
from multimodal_neuroimage_tpu.nn.swin2d import (  # noqa: E402
    relative_position_index, shift_attn_mask)

# flagship geometry: 84x84 tokens, window 6 -> nW=196, NP=40, C=12, H=6
B, WS, GRID, C, H, MLP = 8, 6, 14, 12, 6, 4.0
NW, N = GRID * GRID, WS * WS
NP = round_up(N, 8)
CH = int(C * MLP)
RATES = tuple(float(v) for v in
         os.environ.get("MICRO_RATES", "0.1,0.1").split(","))


def make_inputs(seed=0, cross=False):
    rng = np.random.default_rng(seed)
    sdtype = (jnp.bfloat16 if os.environ.get("MICRO_DTYPE") == "bf16"
              else jnp.float32)
    x = jnp.asarray(rng.normal(size=(B, NW, NP, C)), sdtype)
    y = jnp.asarray(rng.normal(size=(B, NW, NP, C)), sdtype)
    params = tuple(jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)
                   for s in param_shapes(C, CH, cross))
    table = jnp.asarray(rng.normal(size=((2 * WS - 1) ** 2, H)) * 0.02,
                        jnp.float32)
    rel = relative_position_index(WS, WS)
    bias = packed_bias_from_table(table, WS, H, NP, np.asarray(rel))
    mask_small = shift_attn_mask(GRID * WS, GRID * WS, WS, WS // 2)
    mask = np.full((NW, NP, NP), 0.0, np.float32)
    mask[:, :N, :N] = np.asarray(mask_small)
    mask = jnp.asarray(mask)
    dp = jnp.ones((B, 2), jnp.float32)
    return x, y, params, bias, mask, dp


def stack_fn(depth, cross=False, train=True, with_mask=True):
    x, y, params, bias, mask, dp = make_inputs(cross=cross)
    m = mask if with_mask else None

    @jax.jit
    def run(x0, seed):
        def body(i, carry):
            h, hy = carry
            if cross:
                out = fused_cross_fusion_block(h, hy, params, bias, m, dp,
                                               seed + i, RATES, train)
                return out, hy
            return fused_fusion_block(h, params, bias, m, dp, seed + i,
                                      RATES, train), hy
        h, _ = jax.lax.fori_loop(0, depth, body, (x0, y))
        return jnp.sum(h)

    if train:
        @jax.jit
        def run_train(x0, seed):
            def loss(xx):
                def body(i, carry):
                    h, hy = carry
                    if cross:
                        return (fused_cross_fusion_block(
                            h, hy, params, bias, m, dp, seed + i, RATES,
                            True), hy)
                    return (fused_fusion_block(h, params, bias, m, dp,
                                               seed + i, RATES, True), hy)
                h, _ = jax.lax.fori_loop(0, depth, body, (xx, y))
                return jnp.sum(h)
            v, g = jax.value_and_grad(loss)(x0)
            return v + jnp.sum(g)
        return run_train, x
    return run, x


def time_depth(depth, cross, train, iters=12):
    fn, x = stack_fn(depth, cross=cross, train=train)
    seed = jnp.asarray(1, jnp.int32)
    v = fn(x, seed)
    float(v)
    best = float("inf")
    for w in range(3):
        t0 = time.perf_counter()
        out = x
        for i in range(iters):
            v = fn(x + (i + w) * 1e-6, seed + i)  # defeat content dedupe
        float(v)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def slope(cross, train, d1=int(os.environ.get('MICRO_D1', '4')),
          d2=int(os.environ.get('MICRO_D2', '28'))):
    t1 = time_depth(d1, cross, train)
    t2 = time_depth(d2, cross, train)
    per = (t2 - t1) / (d2 - d1)
    kind = ("cross" if cross else "self") + ("/train" if train else "/fwd")
    print(f"{kind}: {per*1e3:.3f} ms/block  (d{d1}={t1*1e3:.1f} ms, "
          f"d{d2}={t2*1e3:.1f} ms)", flush=True)
    return per


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    phase = sys.argv[2] if len(sys.argv) > 2 else "both"
    for cross in ([False, True] if which == "both"
                  else [which == "cross"]):
        for train in ([False, True] if phase == "both"
                      else [phase == "train"]):
            slope(cross, train)


if __name__ == "__main__":
    main()
