"""Checkpoint / resume.

The reference's only checkpoint is the per-epoch `.wts` file written at
process exit; momentum state is lost every epoch and the lr/momentum schedule
lives in the Perl recipe (SURVEY.md §5.4).  Here:

* `save_checkpoint` / `restore_checkpoint`: Orbax-backed, carrying params AND
  optimizer state (momentum deltas) AND the step/epoch counters + schedule
  position, so training resumes exactly.
* `latest_step` + `restore_or_init`: crash recovery — pick up from the newest
  complete checkpoint automatically.
* `.wts` import/export stays available for parity testing and for feeding the
  reference's decode tooling (tpu_sednn.io.wts).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from tpu_sednn.train.step import TrainState, init_train_state


def _manager(ckpt_dir: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, step: int, state: TrainState,
                    extra: Optional[Dict[str, Any]] = None,
                    max_to_keep: int = 3) -> None:
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {
        "params": state.params,
        "deltas": state.deltas,
        "step": np.asarray(state.step),
        "extra": extra or {},
    }
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    s = mgr.latest_step()
    mgr.close()
    return s


def restore_checkpoint(ckpt_dir: str, step: Optional[int] = None):
    """-> (TrainState, extra dict, step). Raises if nothing to restore."""
    mgr = _manager(ckpt_dir)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint in {ckpt_dir}")
    payload = mgr.restore(step)
    mgr.close()

    def _norm(tree):  # orbax restores tuples as lists; restore our structure
        return {"w": tuple(jax.numpy.asarray(a) for a in tree["w"]),
                "b": tuple(jax.numpy.asarray(a) for a in tree["b"])}

    state = TrainState(
        params=_norm(payload["params"]),
        deltas=_norm(payload["deltas"]),
        step=jax.numpy.asarray(payload["step"]),
    )
    return state, payload.get("extra", {}), step


def restore_or_init(ckpt_dir: str, init_params_fn):
    """Crash-resilient bring-up: newest checkpoint if present, else fresh."""
    s = latest_step(ckpt_dir)
    if s is not None:
        state, extra, step = restore_checkpoint(ckpt_dir, s)
        return state, extra, step
    return init_train_state(init_params_fn()), {}, 0
