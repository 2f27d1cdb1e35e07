"""Profiling & analytic cost model.

Replaces the reference's NVTX/Nsight instrumentation (reference
trainer.py:373-430, 532-547, 700-707; model.py:221-228; main.py:98) with JAX
native tooling:

  * ``trace_annotation(name)`` — ``jax.profiler.TraceAnnotation`` context,
    the NVTX range_push/range_pop equivalent, visible in XProf/TensorBoard;
  * ``profile_trace(dir)`` — start/stop_trace around a region;
  * analytic FLOPs for the attention stacks (the reference carries
    per-module ``flops()`` methods — swin_v2_module.py:184-195, 310-322,
    438-444; swinfusion_module.py:150-161, 386-398; model.py:721-728,
    1540-1555) plus ``compiled_cost`` which pulls XLA's own
    ``cost_analysis()`` from a lowered function so the two can be compared.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, Optional

import jax


def trace_annotation(name: str):
    """NVTX-range equivalent (reference trainer.py:373-377)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """Capture an XProf trace around the enclosed region (replaces
    --profiling + Nsight, main.py:98)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Analytic cost model
# ---------------------------------------------------------------------------

def attention_flops(tokens: int, dim: int, heads: int) -> int:
    """One MHSA block: qkv + scores + context + out proj
    (swin_v2_module.py:184-195 structure)."""
    head_dim = dim // heads
    return (tokens * dim * 3 * dim            # qkv
            + heads * tokens * head_dim * tokens  # q @ k^T
            + heads * tokens * tokens * head_dim  # attn @ v
            + tokens * dim * dim)             # out proj


def mlp_flops(tokens: int, dim: int, mlp_ratio: float = 4.0) -> int:
    return int(2 * tokens * dim * dim * mlp_ratio)


def swin_block_flops(h: int, w: int, dim: int, heads: int, window: int,
                     mlp_ratio: float = 4.0) -> int:
    """One Swin block (swin_v2_module.py:310-322)."""
    n_windows = (h * w) // (window * window)
    return (n_windows * attention_flops(window * window, dim, heads)
            + mlp_flops(h * w, dim, mlp_ratio)
            + 2 * dim * h * w)                # norms


def swin_encoder_flops(img: int = 84, patch: int = 7, embed_dim: int = 12,
                       depths=(2, 2, 6), heads=(3, 6, 12), window: int = 6,
                       mlp_ratio: float = 4.0) -> int:
    """Full SwinV2 classifier cost (model.py:1540-1555 shape)."""
    res = img // patch
    total = img * img * embed_dim * patch * patch  # patch embed conv
    for i, (d, h) in enumerate(zip(depths, heads)):
        dim = embed_dim * 2 ** i
        r = res // 2 ** i
        total += d * swin_block_flops(r, r, dim, h, window, mlp_ratio)
        if i < len(depths) - 1:
            total += (r // 2) ** 2 * 4 * dim * 2 * dim  # patch merging
    return total


def bert_flops(seq: int, hidden: int, layers: int,
               intermediate: int = 3072) -> int:
    per_layer = (attention_flops(seq, hidden, 1)
                 + 2 * seq * hidden * intermediate)
    return layers * per_layer


def compiled_cost(fn: Callable, *args) -> Dict[str, float]:
    """XLA's own cost analysis for a jittable fn — compare against the
    analytic model above (SURVEY §5.1). CAVEAT: XLA cannot see inside
    ``tpu_custom_call`` (Pallas) kernels, so on kernel-heavy models this
    reports only the non-kernel FLOPs — use ``traced_flops`` for a count
    that includes the kernels."""
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, (list, tuple)):
        analysis = analysis[0]
    return dict(analysis or {})


def _dot_flops(eqn) -> int:
    """2*M*N*K (x batch dims) for one dot_general from its avals."""
    (lc, _), (lb, _) = eqn.params["dimension_numbers"]
    a = eqn.invars[0].aval.shape
    b = eqn.invars[1].aval.shape
    k = 1
    for d in lc:
        k *= a[d]
    batch = 1
    for d in lb:
        batch *= a[d]
    m = 1
    for i, s in enumerate(a):
        if i not in lc and i not in lb:
            m *= s
    rc = eqn.params["dimension_numbers"][0][1]
    rb = eqn.params["dimension_numbers"][1][1]
    n = 1
    for i, s in enumerate(b):
        if i not in rc and i not in rb:
            n *= s
    return 2 * batch * m * n * k


def _grid_size(params) -> int:
    gm = params.get("grid_mapping")
    grid = getattr(gm, "grid", None) if gm is not None else params.get("grid")
    size = 1
    for g in (grid or ()):
        size *= int(g)
    return size


def jaxpr_flops(jaxpr) -> int:
    """Static matmul-FLOP census of a (closed) jaxpr, INCLUDING Pallas
    kernels (x grid size) and scan bodies (x trip count) — the counts XLA's
    ``cost_analysis`` misses because ``tpu_custom_call`` is opaque to it.
    Counts dot_general only (this framework's conv is one patch-embed
    einsum, also a dot at trace level); while-loop bodies are counted once
    (lax.scan carries an explicit length; nothing hot here lowers to a bare
    while)."""
    total = 0
    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim == "dot_general":
            total += _dot_flops(eqn)
        elif prim == "scan":
            total += eqn.params["length"] * jaxpr_flops(
                eqn.params["jaxpr"].jaxpr)
        elif prim == "pallas_call":
            total += _grid_size(eqn.params) * jaxpr_flops(
                eqn.params["jaxpr"])
        elif prim == "while":
            total += jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif prim == "cond":
            branches = eqn.params["branches"]
            total += max(jaxpr_flops(b.jaxpr) for b in branches)
        else:
            for key in ("jaxpr", "call_jaxpr", "fun_jaxpr"):
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None:
                    total += jaxpr_flops(getattr(sub, "jaxpr", sub))
                    break
    return total


def traced_flops(fn: Callable, *args) -> int:
    """Matmul-FLOP count of one call of ``fn`` via jaxpr traversal (no
    compile). Includes Pallas kernel bodies — the self-validating twin of
    the hand-rolled analytic models above."""
    return jaxpr_flops(jax.make_jaxpr(fn)(*args).jaxpr)
