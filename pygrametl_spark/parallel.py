"""API facades for the reference's process-parallelism constructs.

The reference hand-builds parallelism with OS processes and queues
(ref parallel.py: splitpoint/endsplits decorators, createflow pipelines,
Decoupled proxies, shared connections and sequence factories) because
its execution model is one row at a time in one Python interpreter.
This engine's execution model is Spark: every DataFrame operation is
already distributed over executors, so these constructs are dropped BY
DESIGN (SURVEY §2.10, COVERAGE.md) — but reference call sites still
compile and run through the facades below, which preserve each API's
observable semantics (call order, results, sequence values) with
serial, deterministic execution. Nothing here touches the data plane.
"""

from __future__ import annotations

import itertools
from collections import deque

from pygrametl_spark.operators.dimension import DecoupledDimension  # noqa: F401
from pygrametl_spark.operators.facttable import DecoupledFactTable  # noqa: F401

__all__ = [
    "Decoupled", "DecoupledDimension", "DecoupledFactTable", "Flow",
    "FutureResult", "SharedConnectionWrapperClient",
    "SharedConnectionWrapperServer", "createflow", "endsplits",
    "getsharedsequencefactory", "shareconnectionwrapper", "splitpoint",
]

#: Parity with ref parallel.py: the worker index of the current
#: splitpoint process. Facade execution is in-process, so always 0.
splitno = 0


def splitpoint(*arg, **kwargs):
    """Decorator facade: run the function inline (ref parallel.py:183-282).

    Supports all three reference forms — ``@splitpoint``,
    ``@splitpoint()``, and ``@splitpoint(output=q, instances=2,
    queuesize=200)``. Calls return None (as in the reference, where the
    real result lands on ``output``); if ``output`` is given, the
    function's results are ``put`` there.
    """
    output = kwargs.get("output")

    def decorator(func):
        def wrapper(*a, **kw):
            result = func(*a, **kw)
            if output is not None:
                output.put(result)
            return None  # parity: calls of a splitpoint return None

        wrapper.__name__ = getattr(func, "__name__", "splitpoint")
        wrapper.__wrapped__ = func
        return wrapper

    if arg and callable(arg[0]):  # bare @splitpoint
        return decorator(arg[0])
    return decorator


def endsplits():
    """Barrier for splitpoint workers — a no-op: facade calls are inline."""


class Flow:
    """Serial facade of the reference's multi-process Flow
    (ref parallel.py:323-437): calling the flow runs every stage on the
    arguments in order (side-effects preserved, return values dropped);
    processed items are fetched with get/getall or iteration."""

    def __init__(self, functions):
        self._functions = functions
        self._results: deque = deque()
        self._closed = False

    def __call__(self, *args):
        self.process(*args)

    def process(self, *args):
        if self._closed:
            raise RuntimeError("flow is closed")
        for f in self._functions:
            f(*args)
        self._results.append(args[0] if len(args) == 1 else args)

    def get(self):
        return self._results.popleft()

    def getall(self):
        out = list(self._results)
        self._results.clear()
        return out

    def __iter__(self):
        while self._results:
            yield self._results.popleft()

    def close(self):
        self._closed = True

    def join(self):
        """All work already happened inline; nothing to wait for."""


def createflow(*functions, **options):
    """Build a Flow; grouped stages ``(f2, f3)`` flatten to sequential
    calls exactly as the reference's group functions do."""
    flat = []
    for item in functions:
        if callable(item):
            flat.append(item)
        elif hasattr(item, "__iter__"):
            group = list(item)
            for f in group:
                if not callable(f):
                    raise ValueError("An element in a sequence is not callable")
            flat.extend(group)
        else:
            raise ValueError("An element is neither iterable nor callable")
    return Flow(flat)


class FutureResult:
    """Eager stand-in for the reference's deferred result handle."""

    def __init__(self, value):
        self._value = value

    def get(self):
        return self._value


class Decoupled:
    """Identity proxy base (ref parallel.py:588-760): method calls go
    straight to the wrapped object; results come back as plain values.
    Spark's lazy distributed execution IS the decoupling."""

    def __init__(self, obj, **_ignored):
        self._obj = obj

    def __getattr__(self, name):
        return getattr(self._obj, name)


def shareconnectionwrapper(targetconnection, maxclients=10, userfuncs=()):
    """Facade of the shared-connection server (ref parallel.py:1025-1120):
    returns an object whose ``copy()`` hands out the same wrapper — one
    driver-side connection is exactly the sharing the reference builds."""

    class _Shared:
        def __init__(self, wrapped):
            self._wrapped = wrapped
            for f in userfuncs:
                setattr(self, f.__name__, f)

        def copy(self):
            return self

        def __getattr__(self, name):
            return getattr(self._wrapped, name)

    return _Shared(targetconnection)


SharedConnectionWrapperServer = shareconnectionwrapper  # API alias
SharedConnectionWrapperClient = shareconnectionwrapper  # API alias


def getsharedsequencefactory(startvalue, intervallen=5000):
    """Deterministic sequence factory (ref parallel.py:1121-1180): the
    returned factory's sequences all draw from one shared counter.
    ``intervallen`` is accepted for parity; with inline execution there
    is no interval hand-out to amortize, so values are simply dense."""
    counter = itertools.count(startvalue)

    def factory():
        def nextval(*_ignored):
            return next(counter)

        return nextval

    return factory
