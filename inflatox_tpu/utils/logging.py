"""Logging, badges and progress reporting.

Reference parity: the Rust crate prints styled stderr badges
``[Inflatox Info]`` / ``[Inflatox Warning]`` / ``[Inflatox PANIC]``
(lib.rs:53-66) and exposes ``log_info``/``log_warn`` to Python
(lib.rs:94-102, re-exported at __init__.py:28).  The compute kernels print a
start/finish line with a wall-clock duration and an optional 2 Hz progress bar
(anguelova.rs:42-50, 203, 254-258).

On TPU a grid scan is a single fused device launch, so there is no meaningful
intra-scan progress; :class:`Progress` reports start/finish + duration (and
per-chunk ticks for host-chunked launches such as checkpointed sweeps).
"""

from __future__ import annotations

import os
import sys
import time

_COLOR = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None


def _badge(text: str, color_code: str) -> str:
    if _COLOR:
        return f"\x1b[1;{color_code}m[{text}]\x1b[0m\n"
    return f"[{text}]\n"


BADGE_INFO = _badge("Inflatox Info", "35")  # bold magenta, lib.rs:53-56
BADGE_WARN = _badge("Inflatox Warning", "33")  # bold yellow, lib.rs:58-61
BADGE_PANIC = _badge("Inflatox PANIC", "31")  # bold red, lib.rs:63-66


def log_info(msg: str) -> None:
    """Print an informational message with the inflatox badge (lib.rs:94-97)."""
    print(f"{BADGE_INFO}{msg}", file=sys.stderr)


def log_warn(msg: str) -> None:
    """Print a warning message with the inflatox badge (lib.rs:99-102)."""
    print(f"{BADGE_WARN}{msg}", file=sys.stderr)


def log_panic(msg: str) -> None:
    """Print a panic-styled message (BADGE_PANIC, lib.rs:63-66)."""
    print(f"{BADGE_PANIC}{msg}", file=sys.stderr)


def _human_duration(seconds: float) -> str:
    if seconds < 1e-3:
        return f"{seconds * 1e6:.0f} µs"
    if seconds < 1.0:
        return f"{seconds * 1e3:.0f} ms"
    if seconds < 60.0:
        return f"{seconds:.2f} s"
    m, s = divmod(seconds, 60.0)
    if m < 60:
        return f"{int(m)} m {s:.0f} s"
    h, m = divmod(m, 60.0)
    return f"{int(h)} h {int(m)} m"


class Progress:
    """Start/finish reporter for device launches.

    Usage::

        with Progress("Calculating full analysis", enabled=progress) as prog:
            ...            # one or more device launches
            prog.tick(3, 8)  # optional: per-chunk progress for host loops

    Prints the same style of messages as the reference kernels
    (anguelova.rs:203, 254-258) when ``enabled``.
    """

    def __init__(self, what: str, enabled: bool = True):
        self.what = what
        self.enabled = enabled
        self._t0 = 0.0

    def __enter__(self) -> "Progress":
        if self.enabled:
            log_info(f"{self.what}.")
        self._t0 = time.perf_counter()
        return self

    def tick(self, done: int, total: int) -> None:
        if self.enabled:
            elapsed = time.perf_counter() - self._t0
            print(
                f"\r{self.what}: {done}/{total} chunks "
                f"({_human_duration(elapsed)} elapsed)",
                end="",
                file=sys.stderr,
            )
            if done == total:
                print(file=sys.stderr)

    def __exit__(self, exc_type, exc, tb) -> None:
        if self.enabled and exc_type is None:
            dt = time.perf_counter() - self._t0
            log_info(f"Calculation finished. Took {_human_duration(dt)}.")
