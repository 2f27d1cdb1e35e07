"""Micro-benchmark: fused BERT layer (ops/bert_layer.py) per-layer train
cost at the flagship geometry (B=8, T=369 -> TP=376? no: round_up(369,8)=376
— the encoder actually pads to 384-lane-friendly TP via round_up; we use the
same helper). Slope/value-fetch protocol of bench_fusion_micro.py.

Usage: python scripts/bench_bert_micro.py [fwd|train|both]
Env:   BERT_ATTN=packed|loop selects the attention plan, MICRO_D1/D2 depths.
"""
from __future__ import annotations

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

from multimodal_neuroimage_tpu.ops import bert_layer as bl  # noqa: E402
from multimodal_neuroimage_tpu.ops.fusion_block import round_up  # noqa: E402

B = int(os.environ.get("MICRO_B", "8"))
T = int(os.environ.get("MICRO_T", "369"))
H = int(os.environ.get("MICRO_H", "84"))
F = int(os.environ.get("MICRO_F", "3072"))
HEADS = int(os.environ.get("MICRO_HEADS", "12"))
RATES = tuple(float(v) for v in
              os.environ.get("MICRO_RATES", "0.1,0.1").split(","))
DTYPE = (jnp.bfloat16 if os.environ.get("MICRO_DTYPE", "bf16") == "bf16"
         else jnp.float32)


def make_inputs():
    rng = np.random.default_rng(7)
    TP = round_up(T, 8)
    x = jnp.asarray(rng.normal(size=(B, TP, H)), DTYPE)
    params = tuple(jnp.asarray(rng.normal(size=s) * 0.05, jnp.float32)
                   for s in bl.param_shapes(H, F))
    return x, params


def stack_fn(depth, train=True):
    x, params = make_inputs()

    def body(i, h, seed):
        return bl.bert_layer_call(h, params, seed + i, HEADS, T, RATES,
                                  train)

    if train == "fwdonly":
        # training-MODE forward without the backward: dropout PRNG + the
        # ctx/a2 residual saves run, value_and_grad does not. This is the
        # graph whose per-layer cost is the flagship's "BERT fwd" band
        # (the `fwd` phase below is inference: no dropout, no saves).
        @jax.jit
        def run(x0, seed):
            h = jax.lax.fori_loop(0, depth,
                                  lambda i, c: body(i, c, seed), x0)
            return jnp.sum(h.astype(jnp.float32))
    elif train:
        @jax.jit
        def run(x0, seed):
            def loss(xx):
                h = jax.lax.fori_loop(0, depth,
                                      lambda i, c: body(i, c, seed), xx)
                return jnp.sum(h.astype(jnp.float32))
            v, g = jax.value_and_grad(loss)(x0)
            return v + jnp.sum(g.astype(jnp.float32))
    else:
        @jax.jit
        def run(x0, seed):
            h = jax.lax.fori_loop(0, depth, lambda i, c: body(i, c, seed),
                                  x0)
            return jnp.sum(h.astype(jnp.float32))
    return run, x


def time_depth(depth, train, iters=12):
    fn, x = stack_fn(depth, train=train)
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


def slope(train, d1=int(os.environ.get('MICRO_D1', '4')),
          d2=int(os.environ.get('MICRO_D2', '28'))):
    t1 = time_depth(d1, train)
    t2 = time_depth(d2, train)
    per = (t2 - t1) / (d2 - d1)
    mode = os.environ.get("BERT_ATTN", "packed")
    tag = {True: "/train", False: "/fwd", "fwdonly": "/trainfwd"}[train]
    abl = os.environ.get("BERT_ABLATE", "")
    kind = f"bert/{mode}{tag}" + (f"[{abl}]" if abl else "")
    print(f"{kind}: {per*1e3:.3f} ms/layer  (d{d1}={t1*1e3:.1f} ms, "
          f"d{d2}={t2*1e3:.1f} ms)", flush=True)
    return per


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "train"
    if phase == "trainfwd":
        slope("fwdonly")
        return
    for train in ([False, True] if phase == "both" else [phase == "train"]):
        slope(train)


if __name__ == "__main__":
    main()
