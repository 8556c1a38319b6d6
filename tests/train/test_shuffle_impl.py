"""ops.phase_shuffle._SELECT_IMPL=2 (pshuf/pshuft primitive pair, round-5
glue lever) through the FULL WGAN-GP train step.

The primitive's forward is the same select expression as form 1 and its
hand-written transpose computes the same per-element sums (for every
output element at most one scatter term is nonzero, and the reflect edge
folds touch disjoint rows at these lengths), so the whole step — critic
backward, GP double-backprop, weight grads, both optimizer updates — must
match the select-form step exactly on CPU.
"""

import importlib

import jax
import numpy as np

# NOT `import ... as ps_mod` via attribute: ops/__init__ rebinds the package
# attribute `phase_shuffle` to the function, shadowing the submodule.
ps_mod = importlib.import_module("audiogan_tpu.ops.phase_shuffle")
from audiogan_tpu.train.state import create_train_state
from audiogan_tpu.train.step import build_train_step

from helpers_train import raw_batch, tiny_config


def _run(cfg, select_impl, n_steps=3, seed=11):
    saved = ps_mod._SELECT_IMPL
    try:
        ps_mod._SELECT_IMPL = select_impl
        state = create_train_state(cfg)
        step = jax.jit(build_train_step(cfg))
        hist = []
        for s in range(n_steps):
            clips, labels = raw_batch(cfg, seed=seed + s)
            state, m = step(state, clips, labels)
            hist.append(jax.device_get(m))
    finally:
        ps_mod._SELECT_IMPL = saved
    return state, hist


def test_prim_form_step_matches_select_form_exactly():
    cfg = tiny_config()  # phase_shuffle=1, fused_shuffle_sites=0 (all
    #                      shuffle sites route through ops.phase_shuffle)
    assert cfg.model.phase_shuffle >= 1
    assert cfg.model.fused_shuffle_sites == 0
    st_sel, h_sel = _run(cfg, select_impl=1)
    st_prim, h_prim = _run(cfg, select_impl=2)
    for m0, m1 in zip(h_sel, h_prim):
        for k in m0:
            np.testing.assert_array_equal(np.asarray(m1[k]),
                                          np.asarray(m0[k]), err_msg=k)
    for l0, l1 in zip(jax.tree.leaves(st_sel.params_g),
                      jax.tree.leaves(st_prim.params_g)):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    for l0, l1 in zip(jax.tree.leaves(st_sel.params_d),
                      jax.tree.leaves(st_prim.params_d)):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_model_shuffle_impl_knob_sets_the_lowering():
    """config.ModelCfg.shuffle_impl is applied at step-build time (like
    train.wgrad_form): "prim" traces the pshuf primitive into the step
    graph, "select"/"" do not, and the build RESETS the module global so
    one preset's choice never leaks into the next build in-process."""
    import dataclasses as dc

    cfg = tiny_config()
    assert cfg.model.phase_shuffle >= 1 and cfg.model.fused_shuffle_sites == 0

    def trace(c):
        state = create_train_state(c)
        clips, labels = raw_batch(c, seed=3)
        return str(jax.make_jaxpr(build_train_step(c))(state, clips, labels))

    prim_cfg = dc.replace(
        cfg, model=dc.replace(cfg.model, shuffle_impl="prim")).validate()
    assert "audiogan_pshuf" in trace(prim_cfg)
    # a following default-config build must NOT inherit the prim setting
    assert "audiogan_pshuf" not in trace(cfg)
    assert ps_mod._SELECT_IMPL == ps_mod._impl_default()
