"""Measure candidate MXU dot formulations for the fusion window attention.

Round-5 fix of the round-4 postmortem: every grid cell now writes its OWN
output block (distinct leading-axis index map), so Mosaic cannot elide any
cell's work and the measured rates are trustworthy. (The original version
pointed every cell at block 0 and reported >bf16-peak rates.) The in-kernel
FUSION_ABLATE ladder on the real kernels (scripts/bench_fusion_bp.py)
remains the ground truth for full-block attribution.

The BP fusion kernels spend ~81% of their time in packed window dots shaped
(Wc, NP=40, BC=96) x (Wc, BC, L=1920) — M=40 rows per window leaves the MXU
mostly idle (ROADMAP round-3 attribution). This benchmark times the candidate
restructures as bare Pallas kernels with a dependency-chained scores+context
dot pair (output feeds the next input, so Mosaic cannot CSE repeats):

  cur    — current layout: batch=windows, M=NP=40,  N=B*H*NP=1920
  sm     — subject-major:  batch=windows, M=B*NP=320, N=H*NP=240
           (subjects move from lanes to rows; SAME total FLOPs as cur —
           the redundancy moves from K_pack's lane replication into a
           block-diagonal Q)
  st     — transposed scores: M=L=1920, N=NP=40
  ffold  — F=4 window fold into M with lane-concat K (VERDICT r3 #3
           suggestion; F^2 FLOP growth)
  flat   — shared-B full-M dot (7840, 96) x (96, 1920): not a valid
           attention (windows mixed) — the pure MXU-efficiency upper bound

Slope timing over in-kernel repeat count per the ROADMAP protocol (value
fetch, varied content). Run on the v5e; CPU run uses interpret=False XLA:CPU
lowering and is only a smoke test.

Usage: python scripts/bench_dot_shapes.py [f32|bf16] [variants...]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

# flagship geometry (G=8 lane group)
B, NW, NP, C, H = 8, 196, 40, 12, 6
BC = B * C            # 96
L = B * H * NP        # 1920
LS = H * NP           # 240 (subject-major lane axis)
WC = 28               # windows per grid cell (S fits VMEM at f32)
NCH = NW // WC


def _bdot(a, b, ca, cb):
    return jax.lax.dot_general(a, b, (((ca,), (cb,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)


def _mk(variant: str, reps: int, dtype):
    """Kernel: chained scores+context dot pairs, `reps` times."""
    cast = (lambda t: t.astype(dtype))

    if variant == "cur":
        shapes = [(WC, NP, BC), (WC, BC, L), (WC, L, BC)]

        def body(q, K, V):
            for _ in range(reps):
                S = _bdot(cast(q), cast(K), 2, 1)          # (WC, NP, L)
                q = _bdot(cast(S * 1e-3), cast(V), 2, 1)   # (WC, NP, BC)
            return q
    elif variant == "sm":
        M = B * NP                                          # 320
        shapes = [(WC, M, BC), (WC, BC, LS), (WC, LS, BC)]

        def body(q, K, V):
            for _ in range(reps):
                S = _bdot(cast(q), cast(K), 2, 1)          # (WC, 320, 240)
                q = _bdot(cast(S * 1e-3), cast(V), 2, 1)   # (WC, 320, 96)
            return q
    elif variant == "st":
        shapes = [(WC, L, BC), (WC, BC, NP), (WC, NP, BC)]

        def body(K, q, V):
            for _ in range(reps):
                S = _bdot(cast(K), cast(q), 2, 1)          # (WC, L, NP)
                K = _bdot(cast(S * 1e-3), cast(V), 2, 1)   # (WC, L, BC)
            return K
    elif variant == "ffold":
        F = 4
        shapes = [(WC // F, F * NP, BC), (WC // F, BC, F * L),
                  (WC // F, F * L, BC)]

        def body(q, K, V):
            for _ in range(reps):
                S = _bdot(cast(q), cast(K), 2, 1)          # (49,160,7680)
                q = _bdot(cast(S * 1e-3), cast(V), 2, 1)
            return q
    elif variant == "flat":
        shapes = [(WC * NP, BC), (BC, L), (L, BC)]

        def body(q, K, V):
            for _ in range(reps):
                S = jax.lax.dot_general(cast(q), cast(K),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
                q = jax.lax.dot_general(cast(S * 1e-3), cast(V),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
            return q
    else:
        raise ValueError(variant)

    def kernel(q_ref, k_ref, v_ref, o_ref):
        o_ref[0] = body(q_ref[:], k_ref[:], v_ref[:]).astype(o_ref.dtype)

    def _in_spec(s):
        # all cells read block 0 of each input (a broadcast read — cheap and
        # legal); the OUTPUT below is distinct per cell, which is what keeps
        # Mosaic from eliding any cell's work (round-4 postmortem: all-zero
        # output index maps let every cell but the last be dead code and the
        # script reported >bf16-peak rates)
        return pl.BlockSpec(s, lambda i, _n=len(s): (0,) * _n,
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1,) + shapes[0], lambda i: (i,) + (0,) *
                            len(shapes[0]), memory_space=pltpu.VMEM)

    @jax.jit
    def run(q, K, V):
        return pl.pallas_call(
            kernel,
            grid=(NCH,),
            in_specs=[_in_spec(s) for s in shapes],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((NCH,) + shapes[0], jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(q, K, V)

    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
            for s in shapes]
    return run, args


def time_variant(variant, dtype, r1=2, r2=10, iters=8):
    def t(reps):
        run, args = _mk(variant, reps, dtype)
        out = run(*args)
        float(jnp.sum(out))
        best = float("inf")
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                # unique content per call ACROSS windows too: the tunnel
                # dedupes re-executions with identical (executable, args)
                out = run(args[0] + (w * iters + i + reps * 1000) * 1e-6,
                          *args[1:])
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / iters)
        return best
    ta, tb = t(r1), t(r2)
    per = (tb - ta) / (r2 - r1) * 1e3
    print(f"{variant:6s} {np.dtype(dtype).name:8s} "
          f"{per:7.3f} ms per scores+context pair over {NW} windows "
          f"(r{r1}={ta*1e3:.2f} ms, r{r2}={tb*1e3:.2f} ms)", flush=True)
    return per


def main():
    dtypes = {"f32": jnp.float32, "bf16": jnp.bfloat16}
    which = sys.argv[1] if len(sys.argv) > 1 else "bf16"
    variants = sys.argv[2:] or ["cur", "sm", "st", "ffold", "flat"]
    for v in variants:
        time_variant(v, dtypes[which])


if __name__ == "__main__":
    main()
