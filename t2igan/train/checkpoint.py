"""Orbax checkpointing for train states.

Parity target: the reference's epoch-indexed ``torch.save`` snapshots —
``netG_epoch_%d.pth`` holding the EMA generator weights, ``netD%d.pth`` and
``clip%d.pth`` (trainer.py:189-200, :459-462; pretrain_DAMSM.py:491-495) —
and the resume path that parses the epoch from the checkpoint filename
(trainer.py:127-154).

TPU-native redesign: a single Orbax step-indexed directory per run holding
the full train state (params, EMA, optimizer states, spectral/batch-stats
collections) written asynchronously off the training thread; plus a
``load_torch_clip`` helper that can ingest the reference's ``clip*.pth``
torch checkpoints through the converter for cross-framework migration.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin wrapper over orbax CheckpointManager with async saves."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


class GracefulShutdown:
    """Preemption-safe stop flag.

    The reference's only failure handling is a KeyboardInterrupt catch
    (pretrain_DAMSM.py:498-500).  On managed TPU pools preemption arrives as
    SIGTERM; installing this sets a flag the training loop checks so the
    current step finishes, a checkpoint lands, and the process exits
    cleanly — resume picks up from the same step.
    """

    def __init__(self, signals=None):
        import signal as _signal

        self.requested = False
        self._signal = _signal
        sigs = signals if signals is not None else (_signal.SIGTERM,
                                                    _signal.SIGINT)
        self._prev = {}
        for s in sigs:
            try:
                self._prev[s] = _signal.signal(s, self._handler)
            except (ValueError, OSError):
                pass  # non-main thread or unsupported signal

    def _handler(self, signum, frame):
        self.requested = True

    def restore(self):
        for s, prev in self._prev.items():
            try:
                self._signal.signal(s, prev)
            except (ValueError, OSError):
                pass


def parse_epoch_from_path(path: str) -> int:
    """Epoch from a reference-style checkpoint name, e.g.
    ``.../netG_epoch_550.pth`` -> 550 (trainer.py:137-140)."""
    m = re.search(r"(\d+)(?:\.[A-Za-z]+)?$", path)
    return int(m.group(1)) if m else 0


def _load_torch_sd(path: str):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_torch_clip(path: str):
    """Load a reference ``clip%d.pth`` torch checkpoint into flax variables
    (cross-framework resume).  Requires torch for unpickling."""
    from t2igan.models.clip import convert_torch_clip_state

    return convert_torch_clip_state(_load_torch_sd(path))


def load_torch_generator(path: str, branch_num: int = 3,
                         num_residual: int = 2, dcgan: bool = False):
    """Load a reference ``netG_epoch_%d.pth`` (EMA generator weights,
    trainer.py:189-200) into :class:`GNet` flax variables."""
    from t2igan.models.convert import convert_torch_generator_state

    return convert_torch_generator_state(
        _load_torch_sd(path), branch_num=branch_num,
        num_residual=num_residual, dcgan=dcgan)


def load_torch_discriminator(path: str, img_size: int):
    """Load a reference ``netD%d.pth`` (trainer.py:195-198) into
    :class:`DNetWithHeads` flax variables."""
    from t2igan.models.convert import convert_torch_discriminator_state

    return convert_torch_discriminator_state(_load_torch_sd(path),
                                             img_size=img_size)
