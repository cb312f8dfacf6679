"""Learning-rate schedules.

:class:`WarmupSchedule` reproduces the reference's custom WarmupScheduler
(reference scheduler.py:7-48): linear warmup ``initial_lr -> max_lr`` over
``warmup_epochs`` counts, then multiplicative ``gamma`` decay at each
milestone. The reference steps it once per EPOCH (train_cpc.py:136), and its
torch ``_LRScheduler`` base applies one implicit ``step()`` at construction,
so epoch ``e`` (1-indexed) trains with ``lr(last_epoch = e - 1)`` — this
class takes that completed-epoch count directly.

:class:`MultiStepSchedule` is the vocoder's MultiStepLR stepped per
optimizer STEP (reference vocoder.py:96-110).

Both are plain callables usable from Python (host-side, lr passed into the
jitted step as a scalar) or as optax schedules.
"""

import bisect
from dataclasses import dataclass
from typing import List, Sequence


@dataclass
class WarmupSchedule:
    warmup_epochs: int
    initial_lr: float
    max_lr: float
    milestones: List[int]
    gamma: float

    def __post_init__(self):
        assert self.warmup_epochs < self.milestones[0], (
            "warmup must end before the first milestone "
            "(reference scheduler.py:9)"
        )
        self.milestones = sorted(self.milestones)

    def __call__(self, last_epoch: int) -> float:
        """LR for the epoch following ``last_epoch`` completed epochs."""
        if last_epoch <= self.warmup_epochs:
            pct = last_epoch / self.warmup_epochs
            return (self.max_lr - self.initial_lr) * pct + self.initial_lr
        n_decays = bisect.bisect_right(self.milestones, last_epoch)
        return self.max_lr * (self.gamma**n_decays)


@dataclass
class MultiStepSchedule:
    base_lr: float
    milestones: List[int]
    gamma: float

    def __post_init__(self):
        self.milestones = sorted(self.milestones)

    def __call__(self, step: int) -> float:
        n_decays = bisect.bisect_right(self.milestones, step)
        return self.base_lr * (self.gamma**n_decays)
