"""Static jaxpr census guards for the flagship train step.

Round-2 work eliminated every stream-sized gather/scatter from the bpr
(window-resident) flagship step: bijective transitions with gather-only
VJPs (nn/common.transition_permutation_fn), explicit slices in the stack
exit glue, and reshape-based PatchMerging. The only legitimate remaining
scatters are the relative-position-bias TABLE gradients — a few hundred
floats each. This test traces the (tiny-geometry) flagship step and fails
if a large-operand scatter ever reappears (e.g. someone reintroduces
numpy-style strided/None-mixed indexing on a stream, which JAX lowers to
lax.gather with a scatter-add VJP).
"""

import re

import jax
import pytest


@pytest.mark.slow
def test_flagship_bpr_step_has_no_stream_sized_scatter():
    import multimodal_neuroimage_tpu.nn.swinfusion as sf
    from multimodal_neuroimage_tpu.ops.attention import set_fused_attention
    from __graft_entry__ import _example_batch, _flagship_cfg
    from multimodal_neuroimage_tpu.models.registry import create_model
    from multimodal_neuroimage_tpu.train.losses import active_losses
    from multimodal_neuroimage_tpu.train.state import (create_train_state,
                                                       make_train_step,
                                                       optimizer_from_config)

    prev = sf._LAYOUT
    sf._LAYOUT = "bpr"
    set_fused_attention(True)
    try:
        cfg = _flagship_cfg(tiny=True)
        model = create_model(cfg)
        batch = _example_batch(4, r=cfg.intermediate_vec)
        tx, _ = optimizer_from_config(cfg, steps_per_epoch=10)
        state = create_train_state(model, batch, tx, cfg.seed)
        specs = active_losses(cfg.task, cfg.fine_tune_task)
        step = make_train_step(model, specs, compute_dtype=cfg.compute_dtype)
        jaxpr_lines = str(jax.make_jaxpr(step)(state, batch)).splitlines()
    finally:
        sf._LAYOUT = prev
        set_fused_attention(None)

    offenders = []
    for line in jaxpr_lines:
        if not re.search(r"= scatter", line):
            continue
        # target shape = the eqn output's type annotation
        m = re.search(r":\w+\[([0-9,]+)\] = scatter", line)
        assert m, f"unparseable scatter eqn: {line.strip()[:120]}"
        numel = 1
        for d in m.group(1).split(","):
            numel *= int(d)
        if numel > 10_000:          # bias tables are a few hundred floats
            offenders.append(line.strip()[:160])
    assert not offenders, (
        "stream-sized scatter reappeared in the flagship step:\n"
        + "\n".join(offenders))
