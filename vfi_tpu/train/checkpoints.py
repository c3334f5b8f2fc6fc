"""Orbax checkpointing with resume.

The reference only ever *saves* (`torch.save(model.state_dict())` per epoch
+ a "best" save whose comparison is broken — reference train.py:180-190); it
never restores, so a crashed run restarts from scratch. Here checkpoints
carry params + optimizer state + step + epoch + scheduler state, support
`latest_step`/restore, and keep a bounded history (the exceed-the-reference
requirement from SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from vfi_tpu.train.state import PlateauScheduler, TrainState, set_learning_rate


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager for (state, scheduler, epoch)."""

    def __init__(self, directory: str, keep: int = 3):
        self.path = os.path.abspath(directory)
        os.makedirs(self.path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(self, epoch: int, state: TrainState, scheduler: PlateauScheduler,
             extra: Optional[dict] = None) -> None:
        extra = extra or {}
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            # fixed meta schema so restore templates always match
            "meta": {
                "epoch": epoch,
                "scheduler": scheduler.state_dict(),
                "val_loss": float(extra.get("val_loss", float("nan"))),
                "best_val": float(extra.get("best_val", float("nan"))),
            },
        }
        self._mgr.save(epoch, args=ocp.args.StandardSave(payload))

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state: TrainState, scheduler: PlateauScheduler,
                epoch: Optional[int] = None) -> tuple[TrainState, int]:
        """Restore into an existing (template) state; returns (state, epoch)."""
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint under {self.path}")
        template = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": state.step,
            "meta": {"epoch": 0, "scheduler": scheduler.state_dict(),
                     "val_loss": 0.0, "best_val": 0.0},
        }
        restored = self._mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        scheduler.load_state_dict(restored["meta"]["scheduler"])
        state = state.replace(
            params=restored["params"],
            opt_state=jax.tree.map(lambda t, r: r, state.opt_state, restored["opt_state"]),
            step=restored["step"],
        )
        state = set_learning_rate(state, scheduler.lr)
        self.last_meta = {k: restored["meta"][k] for k in ("val_loss", "best_val")}
        return state, int(restored["meta"]["epoch"])

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params_npz(params: Any, out_path: str) -> None:
    """Portable single-file params export (shared format with
    vfi_tpu.utils.convert)."""
    from vfi_tpu.utils.convert import save_params_npz as _save

    _save(jax.tree.map(np.asarray, params), out_path)
