"""One-shot warnings for silent performance degradations.

The fused Pallas kernels have shape/mesh preconditions (lane alignment,
batch divisibility) under which they quietly fall back to the XLA
formulation. The fallbacks are always CORRECT — parity-tested — but a
user with a non-reference shape would silently lose an advertised kernel
(VERDICT r4 #6). Every such downgrade funnels through :func:`warn_once`,
which emits a single ``PerformanceWarning`` per distinct reason per
process.
"""

import warnings
from typing import Set


class PerformanceWarning(UserWarning):
    """A documented fast path was not taken; results are unaffected."""


_seen: Set[str] = set()


def warn_once(reason: str) -> None:
    """Emit ``reason`` as a PerformanceWarning once per process.

    Keyed on the exact reason string, so distinct shapes/conditions each
    get one report but a hot loop never spams.
    """
    if reason in _seen:
        return
    _seen.add(reason)
    warnings.warn(reason, PerformanceWarning, stacklevel=3)


def reset_for_tests() -> None:
    _seen.clear()
