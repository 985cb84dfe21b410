"""Hierarchical host-side timer with exclusive accounting.

Same contract as the reference timer (``utils/timer.py``): starting a timer
pauses the enclosing one so totals are exclusive; `env` is the context
manager sprinkled through the pipeline; `print_stats` renders the table used
by benchmark mode.  On TPU this only times host-visible stages (device work
is async — call `block()` or use jax.profiler for on-device timing).
"""

from __future__ import annotations

import time
from collections import OrderedDict
from contextlib import contextmanager
from typing import Dict, List, Optional

_total: "OrderedDict[str, float]" = OrderedDict()
_start: Dict[str, float] = {}
_stack: List[str] = []
_disabled: set = set()
_disable_all = False


def disable_all(value: bool = True) -> None:
    global _disable_all
    _disable_all = value


def disable(name: str) -> None:
    _disabled.add(name)


def enable(name: str) -> None:
    _disabled.discard(name)


def reset() -> None:
    _total.clear()
    _start.clear()
    _stack.clear()


def start(name: str) -> None:
    if _disable_all or name in _disabled:
        return
    now = time.perf_counter()
    if _stack:
        top = _stack[-1]
        _total[top] = _total.get(top, 0.0) + (now - _start[top])
    _stack.append(name)
    _start[name] = now
    _total.setdefault(name, 0.0)


def stop(name: Optional[str] = None) -> None:
    if _disable_all or (name is not None and name in _disabled):
        return
    now = time.perf_counter()
    if not _stack:
        return
    top = _stack.pop()
    _total[top] = _total.get(top, 0.0) + (now - _start[top])
    if _stack:
        _start[_stack[-1]] = now


@contextmanager
def env(name: str):
    start(name)
    try:
        yield
    finally:
        stop(name)


def total_time() -> float:
    return sum(_total.values())


def print_stats() -> None:
    if not _total:
        print(' No timing data ')
        return
    width = max(max(len(k) for k in _total), 30)
    print()
    print(f'{"Timer":>{width}} | Time (ms)')
    print('-' * (width + 13))
    for k, v in _total.items():
        print(f'{k:>{width}} | {v * 1000:9.2f}')
    print('-' * (width + 13))
    print(f'{"Total":>{width}} | {total_time() * 1000:9.2f}')
    print()
