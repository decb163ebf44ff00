"""Orbax checkpointing with the reference's latest/best/periodic semantics.

Reference utils/io.py:8-58 + main.py:254-327: `checkpoint.pth` every epoch,
`checkpoint_best.pth` on AP25 improvement, `checkpoint_{epoch:04d}.pth`
every N epochs, and resume-from-latest on restart (restores model +
optimizer and continues at epoch+1).
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


_DETACHED_FROZEN = ("teacher2d", "image_bank")


def _split_teacher(state):
    """Detach reloadable static data from a TrainState (if present):
    the frozen 2D-teacher weights and the device-resident image bank.

    Both are loaded from source data (RegionCLIP checkpoint / dataset
    canvases) and never change, so persisting them in every train
    checkpoint would add ~180MB (teacher) + up to ~3GB (bank) per save and
    make checkpoints structurally incompatible between configurations
    (the reference likewise keeps the teacher outside its model
    state_dict — it lives in the criterion, criterion.py:397)."""
    frozen = getattr(state, "frozen", None)
    if isinstance(frozen, dict) and any(k in frozen for k in _DETACHED_FROZEN):
        kept = {k: v for k, v in frozen.items() if k not in _DETACHED_FROZEN}
        detached = {k: frozen[k] for k in _DETACHED_FROZEN if k in frozen}
        return state.replace(frozen=kept), detached
    return state, None


class CheckpointManager:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Any, epoch: int, name: str = "checkpoint", extra: Optional[dict] = None):
        state, _ = _split_teacher(state)
        payload = {
            "state": jax.device_get(state),
            "epoch": np.asarray(epoch),
        }
        path = self._path(name)
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if extra:
            self.write_extra(extra, name)

    def write_extra(self, extra: dict, name: str = "checkpoint"):
        """Small scalar payload (best_val_metrics equivalent, reference
        utils/io.py:8-30 stores it inside checkpoint.pth) — a JSON sidecar
        keeps the orbax tree structure independent of it, and lets the
        train loop refresh best-AP bookkeeping without rewriting the
        checkpoint itself."""
        with open(self._path(name) + ".extra.json", "w") as fh:
            json.dump({k: float(v) for k, v in jax.device_get(extra).items()}, fh)

    def save_latest(self, state, epoch, extra=None):
        self.save(state, epoch, "checkpoint", extra)

    def save_best(self, state, epoch, extra=None):
        self.save(state, epoch, "checkpoint_best", extra)

    def save_periodic(self, state, epoch, extra=None):
        self.save(state, epoch, f"checkpoint_{epoch:04d}", extra)

    def restore(self, abstract_state: Any, name: str = "checkpoint"):
        """Restore (state, epoch, extra); returns (None, -1, None) if absent.

        Resume semantics match reference utils/io.py:33-58: caller should
        continue at epoch+1.
        """
        path = self._path(name)
        if not os.path.isdir(path):
            return None, -1, None
        abstract_state, teacher = _split_teacher(abstract_state)
        abstract = {
            "state": abstract_state,
            "epoch": np.asarray(0),
        }
        restored = self._ckptr.restore(path, abstract)
        state = restored["state"]
        if teacher is not None:
            # reattach the LIVE detached entries (teacher weights / image
            # bank — frozen; sourced externally, not from this checkpoint)
            state = state.replace(frozen={**state.frozen, **teacher})
        extra = None
        if os.path.isfile(path + ".extra.json"):
            with open(path + ".extra.json") as fh:
                extra = json.load(fh)
        return state, int(restored["epoch"]), extra


def restore_eval_checkpoint(abstract_state, test_ckpt=None, checkpoint_dir=None):
    """Resolve --test_ckpt (one orbax checkpoint dir, reference
    main.py:374-375) or fall back to checkpoint_dir's latest checkpoint;
    returns (state, epoch). Shared by the test-only and pseudo-label CLIs."""
    if test_ckpt:
        ckpt_dir, name = os.path.split(os.path.abspath(test_ckpt.rstrip("/")))
    else:
        assert checkpoint_dir, "set --test_ckpt or --checkpoint_dir"
        ckpt_dir, name = checkpoint_dir, "checkpoint"
    restored, epoch, _ = CheckpointManager(ckpt_dir).restore(
        abstract_state, name=name
    )
    assert restored is not None, f"no checkpoint at {ckpt_dir}/{name}"
    return restored, epoch
