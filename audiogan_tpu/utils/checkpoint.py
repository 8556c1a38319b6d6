"""Orbax checkpointing of the full TrainState (SURVEY C17, §5).

Reference equivalent: torch.save of G/D/optimizer state dicts. Here the
whole TrainState pytree (both nets, both optax states, PRNG key data, step)
saves/restores as a unit; keep-last-k via CheckpointManager. Restore is
sharding-aware: pass the abstract state built under the target mesh and
orbax lays the arrays out accordingly (write on v5e-16, restore on 1 chip).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


def make_manager(workdir: str | Path, keep: int = 3,
                 best_metric: str | None = None,
                 best_mode: str = "min") -> ocp.CheckpointManager:
    """keep-last-k manager; best_metric switches to keep-best-k by that
    metric (SURVEY §5 'keep-last-k + best-by-metric policies')."""
    path = (Path(workdir) / "ckpt").absolute()
    path.mkdir(parents=True, exist_ok=True)
    kw = {}
    if best_metric is not None:
        kw = dict(best_fn=lambda m: float(m[best_metric]),
                  best_mode=best_mode)
    opts = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True, **kw)
    return ocp.CheckpointManager(path, options=opts)


def save(mngr: ocp.CheckpointManager, state: Any, wait: bool = False,
         metrics: dict | None = None) -> None:
    mngr.save(int(state.step), args=ocp.args.StandardSave(state),
              metrics=metrics)
    if wait:
        mngr.wait_until_finished()


def latest_step(mngr: ocp.CheckpointManager) -> int | None:
    return mngr.latest_step()


def restore(mngr: ocp.CheckpointManager, abstract_state: Any,
            step: int | None = None) -> Any:
    """Restore `step` (default: latest) into the layout of abstract_state."""
    step = mngr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError("no checkpoint to restore")
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
    return mngr.restore(step, args=ocp.args.StandardRestore(target))
