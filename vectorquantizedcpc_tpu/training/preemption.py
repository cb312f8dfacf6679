"""Preemption-signal checkpointing (SURVEY.md §5.3).

The reference's crash story is "rerun the same command" (CPC `resume=`,
train_cpc.py:65-76; the vocoder's auto-resume from last.ckpt,
train_vocoder.py:117-134). TPU fleets add *planned* interruption: preemptible
slices get SIGTERM with a grace window. This module turns that signal into a
flag the train loops poll at step/epoch boundaries — they save a final
checkpoint and return cleanly, so the rerun-the-same-command contract picks
up exactly where the preemption hit.

Signal handlers are process-global and must be installed from the main
thread; installation is idempotent, a no-op elsewhere, and chains any
previously installed handler.
"""

import signal
import threading
from typing import Iterable

_FLAG = threading.Event()
_INSTALLED: set = set()


def install_preemption_handler(
    signals: Iterable[int] = (signal.SIGTERM,),
) -> bool:
    """Route ``signals`` to the preemption flag. Returns True if active."""
    if threading.current_thread() is not threading.main_thread():
        return False
    for signum in signals:
        if signum in _INSTALLED:
            continue
        prev = signal.getsignal(signum)

        def handler(s, frame, _prev=prev):
            _FLAG.set()
            print(
                "Preemption signal received: will checkpoint and exit at "
                "the next step boundary.",
                flush=True,
            )
            if callable(_prev) and _prev not in (
                signal.SIG_IGN,
                signal.SIG_DFL,
                signal.default_int_handler,
            ):
                _prev(s, frame)

        try:
            signal.signal(signum, handler)
        except (ValueError, OSError):
            return False
        _INSTALLED.add(signum)
    return True


def preemption_requested() -> bool:
    return _FLAG.is_set()


def request_preemption() -> None:
    """Set the flag programmatically (tests; external orchestrators)."""
    _FLAG.set()


def clear_preemption() -> None:
    """Reset the flag (tests; or after a handled save when continuing)."""
    _FLAG.clear()
