"""Parity: ops/fused_update.fused_adam vs the exact optax chain it replaces
(train/state.create_optimizer with fused='off'). Same math, one Pallas
kernel: clip -> (torch-Adam L2 | AdamW decoupled decay) -> moments -> bias
correction -> -lr(schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_neuroimage_tpu.ops.fused_update import fused_adam
from multimodal_neuroimage_tpu.train.state import create_optimizer


def _tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "dense": {"kernel": jnp.asarray(rng.normal(size=(13, 37)), jnp.float32),
                  "bias": jnp.asarray(rng.normal(size=(37,)), jnp.float32)},
        "ln": {"scale": jnp.asarray(rng.normal(size=(5,)), jnp.float32)},
        "odd": jnp.asarray(rng.normal(size=(3, 7, 11)), jnp.float32),
    }


def _schedule(count):
    return 1e-3 * (0.9 ** jnp.asarray(count, jnp.float32))


@pytest.mark.parametrize("optim", ["adam", "adamw"])
@pytest.mark.parametrize("clipping", [False, True])
def test_fused_matches_optax_chain(optim, clipping):
    params = _tree(1)
    ref_tx = create_optimizer(optim, _schedule, weight_decay=0.01,
                              gradient_clipping=clipping, clip_max_norm=0.5,
                              fused="off")
    fus_tx = fused_adam(_schedule, weight_decay=0.01, mode=optim,
                        gradient_clipping=clipping, clip_max_norm=0.5)
    ref_state = ref_tx.init(params)
    fus_state = fus_tx.init(params)
    p_ref = params
    p_fus = params
    for step in range(4):
        grads = jax.tree_util.tree_map(
            lambda x: jnp.sin(x * (step + 1)) * (3.0 if clipping else 0.3),
            params)
        ur, ref_state = ref_tx.update(grads, ref_state, p_ref)
        uf, fus_state = fus_tx.update(grads, fus_state, p_fus)
        p_ref = optax.apply_updates(p_ref, ur)
        p_fus = optax.apply_updates(p_fus, uf)
    for a, b in zip(jax.tree_util.tree_leaves(p_ref),
                    jax.tree_util.tree_leaves(p_fus)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)


def test_create_optimizer_auto_selects_fused():
    tx = create_optimizer("adam", _schedule, 0.0)
    params = _tree(2)
    state = tx.init(params)
    # fused state: (count, padded 2-D mu, padded 2-D nu)
    assert hasattr(state, "mu") and state.mu.ndim == 2
    assert state.mu.shape[1] == 1024
    # accumulation forces the optax path
    tx2 = create_optimizer("adam", _schedule, 0.0, accumulation_steps=2)
    st2 = tx2.init(params)
    assert not hasattr(st2, "mu")
    # sgd-like unknown optimizers fall through (and 'on' refuses)
    with pytest.raises(ValueError):
        create_optimizer("adam", _schedule, 0.0, accumulation_steps=2,
                         fused="on")


def test_fused_update_is_jittable_and_donatable():
    params = _tree(3)
    tx = fused_adam(_schedule, 0.01, mode="adamw")
    state = tx.init(params)

    @jax.jit
    def step(state, params, grads):
        upd, state = tx.update(grads, state, params)
        return optax.apply_updates(params, upd), state

    grads = jax.tree_util.tree_map(lambda x: x * 0.1, params)
    p2, state = step(state, params, grads)
    p3, state = step(state, p2, grads)
    assert int(state.count) == 2
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(p3))
