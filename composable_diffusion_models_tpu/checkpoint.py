"""Checkpointing via orbax, preserving the reference's directory contract.

Reference (SURVEY.md §5.4): torch.save dicts {epoch, model, optimizer}
(mnist/utils.py:16-31) and a CheckpointManager with layout
``base/exp_name/run_id/{checkpoints,results,logs}`` writing
``{name}_final`` / ``{name}_epoch_{n}`` (src/utils/tools.py:6-29), save-only.
The rebuild keeps the layout and adds true step-level RESUME: states carry
{params, opt_state, step, key} and restore bitwise.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

Pytree = Any


class CheckpointManager:
    """Directory contract: base/exp_name/run_id/{checkpoints,results,logs}."""

    def __init__(self, base_dir: str, exp_name: str, run_id: str = "run_0"):
        self.root = os.path.abspath(os.path.join(base_dir, exp_name, run_id))
        self.ckpt_dir = os.path.join(self.root, "checkpoints")
        self.results_dir = os.path.join(self.root, "results")
        self.logs_dir = os.path.join(self.root, "logs")
        for d in (self.ckpt_dir, self.results_dir, self.logs_dir):
            os.makedirs(d, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str, epoch: Optional[int]) -> str:
        suffix = "final" if epoch is None else f"epoch_{epoch}"
        return os.path.join(self.ckpt_dir, f"{name}_{suffix}")

    def save(self, name: str, state: Pytree, epoch: Optional[int] = None,
             overwrite: bool = True) -> str:
        path = self._path(name, epoch)
        if overwrite and os.path.exists(path):
            import shutil
            shutil.rmtree(path)
        self._ckptr.save(path, state)
        self._ckptr.wait_until_finished()
        return path

    def load(self, name: str, epoch: Optional[int] = None,
             like: Optional[Pytree] = None) -> Pytree:
        path = self._path(name, epoch)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        if like is not None:
            target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
            return self._ckptr.restore(path, target)
        return self._ckptr.restore(path)

    # -- step-level resume (new capability over the reference's save-only
    #    checkpoints, SURVEY.md §5.3/5.4: preemption recovery) ---------------
    def _step_path(self, name: str, step: int) -> str:
        return os.path.join(self.ckpt_dir, f"{name}_step_{step:09d}")

    def save_step(self, name: str, state: Pytree, step: int,
                  keep: int = 3, wait: bool = False) -> str:
        """Save a resumable training state at ``step``; prune to the ``keep``
        most recent DURABLE step checkpoints (keep-latest-k; the in-flight
        write is extra, so up to keep+1 directories exist transiently).

        Async by default (new over the reference's save-only torch.save):
        the state is snapshotted to HOST first — safe even when the caller
        immediately donates the device buffers into the next training chunk —
        and the write overlaps training. Call :meth:`flush` (or pass
        ``wait=True``) to block until durable; a crash mid-write just falls
        back to the previous step checkpoint (orbax writes are atomic).
        """
        assert keep >= 1, "keep-latest-k needs k >= 1"
        path = self._step_path(name, step)
        if os.path.exists(path):
            self.flush()  # never rmtree under an in-flight write
            import shutil
            shutil.rmtree(path)
        state = jax.device_get(state)
        self._ckptr.save(path, state)
        if wait:
            self._ckptr.wait_until_finished()
        # prune DURABLE checkpoints only, to the newest `keep` of them. The
        # in-flight step is excluded from the budget: counting it would let
        # keep=1 delete the previous durable checkpoint while the new one is
        # still writing — a crash in that window would leave zero restorable
        # states, contradicting the fallback guarantee above. Steady state is
        # `keep` durable + 1 in-flight directory.
        durable = [s for s in self.step_list(name) if s != step]
        for old in durable[:-keep]:
            import shutil
            shutil.rmtree(self._step_path(name, old), ignore_errors=True)
        return path

    def flush(self) -> None:
        """Block until every in-flight async save is durable on disk."""
        self._ckptr.wait_until_finished()

    def step_list(self, name: str):
        """Sorted steps for which a step checkpoint of ``name`` exists."""
        prefix = f"{name}_step_"
        steps = []
        for d in os.listdir(self.ckpt_dir):
            if d.startswith(prefix):
                try:
                    steps.append(int(d[len(prefix):]))
                except ValueError:
                    continue
        return sorted(steps)

    def restore_latest(self, name: str, like: Pytree):
        """Restore the newest step checkpoint. Returns (state, step) or
        (None, 0) when no step checkpoint exists."""
        self.flush()  # an in-flight save of this process must be visible
        steps = self.step_list(name)
        if not steps:
            return None, 0
        step = steps[-1]
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
        return self._ckptr.restore(self._step_path(name, step), target), step


def save_checkpoint(path: str, state: Pytree) -> str:
    """Flat save (the mnist/utils.py style): state = {params, opt_state?, step}."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, like: Optional[Pytree] = None) -> Pytree:
    path = os.path.abspath(path)
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
        return ckptr.restore(path, target)
    return ckptr.restore(path)
