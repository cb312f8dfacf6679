"""Training runtime: schedules, train states, jitted steps, checkpointing."""

from .schedule import WarmupSchedule, MultiStepSchedule
from .checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_checkpoint,
)

__all__ = [
    "WarmupSchedule",
    "MultiStepSchedule",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
]
