"""Accumulating event logger -> stderr stream + ``log.json``.

Reference parity: event_logger.f90.

Semantics cloned from the reference:

* ``add_event(name, val)`` — events with the same name accumulate: ``val`` is
  summed and ``num_repeated`` is bumped (event_logger.f90:46-55); insertion
  order of first occurrence is preserved.
* On the master process an immediate line ``[Event <t>] name,val`` is
  streamed to stderr, where ``<t>`` is seconds since the logger epoch
  (event_logger.f90:41-43).
* ``events_to_json()`` exports ``[{"name":..., "num_repeated":..., "val":...}]``
  (event_logger.f90:104-141), to be embedded as the ``events`` array of
  ``log.json``.

Hierarchical naming convention ``parent:child`` (e.g. ``main:eigen_solver``,
``reduce_generalized:cholesky``) is kept so downstream tooling can compare
runs against reference logs.

The TPU twist: phase boundaries must call ``jax.block_until_ready`` on the
phase's outputs before the timer is read, otherwise XLA's async dispatch makes
the numbers meaningless.  ``timed_event`` does that when given a pytree.
"""

from __future__ import annotations

import contextlib
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Iterator


@dataclass
class _Event:
    name: str
    num_repeated: int
    val: float


def _is_proc0() -> bool:
    """True unless a multi-process jax runtime is up with process_index>0.
    Never initializes the backend (safe before jax.distributed.initialize)."""
    try:
        import jax

        if not jax.distributed.is_initialized():
            return True
        return jax.process_index() == 0
    except Exception:
        return True


@dataclass
class EventLog:
    """Ordered, accumulating event list (reference: linked list of events)."""

    stream: bool = True
    epoch: float = field(default_factory=time.time)
    _events: dict[str, _Event] = field(default_factory=dict)

    def reset_epoch(self, epoch: float | None = None) -> None:
        self.epoch = time.time() if epoch is None else epoch

    def add_event(self, name: str, val: float) -> None:
        ev = self._events.get(name)
        if ev is None:
            self._events[name] = _Event(name, 1, float(val))
        else:
            ev.num_repeated += 1
            ev.val += float(val)
        if self.stream and _is_proc0():
            # Reference format: write(0,'(A, F16.6, A)') '[Event', t, '] name,val'
            # — streamed on rank 0 only (event_logger.f90:41-43)
            t = time.time() - self.epoch
            print(f"[Event{t:16.6f}] {name},{val}", file=sys.stderr, flush=True)

    @contextlib.contextmanager
    def timed(self, name: str, block_on: Any = None) -> Iterator[None]:
        """Time a ``with`` body and record it as one event.

        ``block_on`` may be a callable returning a pytree (evaluated at exit)
        or a pytree of jax arrays to block on before stopping the clock.
        """
        t0 = time.time()
        try:
            yield
        finally:
            obj = block_on() if callable(block_on) else block_on
            if obj is not None:
                _block(obj)
            self.add_event(name, time.time() - t0)

    def events(self) -> list[dict[str, Any]]:
        return [
            {"name": e.name, "num_repeated": e.num_repeated, "val": e.val}
            for e in self._events.values()
        ]

    def get(self, name: str) -> float | None:
        ev = self._events.get(name)
        return None if ev is None else ev.val

    def print_events(self, file=None) -> None:
        """Dump all accumulated events (reference: print_events, :80-101)."""
        file = file or sys.stdout
        print("Events:", file=file)
        for e in self._events.values():
            print(f"  {e.name} ({e.num_repeated} times): {e.val:.6f}", file=file)

    def clear(self) -> None:
        self._events.clear()


def _block(obj: Any) -> None:
    import jax

    jax.block_until_ready(obj)


# Module-level default logger, mirroring the reference's global event list.
GLOBAL_LOG = EventLog(stream=False)


def add_event(name: str, val: float) -> None:
    GLOBAL_LOG.add_event(name, val)
