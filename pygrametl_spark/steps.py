"""Step pipeline (reference ``pygrametl/steps.py`` parity).

The reference wires per-row push-based Step objects (``process(row)`` ->
mutate -> hand to ``next``, steps.py:57-141). In Spark a "step" is a
``DataFrame -> DataFrame`` transformation and a pipeline is function
composition over a lazy plan — Catalyst fuses the chain exactly as the
reference's generators pipeline row-by-row, so there is no execution
machinery to port, only the combinator vocabulary.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Step", "connectsteps", "MappingStep", "ValueMappingStep",
    "RenamingFromToStep", "RenamingToFromStep", "ConditionalStep", "CopyStep",
    "GarbageStep", "PrintStep", "SourceStep", "AggregatingStep",
    "AggregatedRow", "DimensionStep", "SCDimensionStep",
    "SumAggregator", "AvgAggregator", "MaxAggregator", "MinAggregator",
]


class AggregatedRow(dict):
    """Marker type for a finalized aggregate row (ref steps.py:467-468).

    In the reference, pushing an ``AggregatedRow`` into an
    ``AggregatingStep`` triggers the finalizer instead of the worker. In
    the Spark engine aggregation finalization is the action boundary of
    the aggregated DataFrame, so this is a pure API-parity type — it
    still works as a plain dict for any user code that constructs one.
    """


class Step:
    """A composable transformation (ref Step steps.py:57-141). Subclass
    and override :meth:`apply`, or pass ``worker``. ``next`` chains to a
    following step, mirroring the reference's defaultworker->next flow."""

    def __init__(self, worker: Callable[[DataFrame], DataFrame] | None = None,
                 next: "Step | None" = None):  # noqa: A002
        self.worker = worker
        self.next = next

    def apply(self, df: DataFrame) -> DataFrame:
        return self.worker(df) if self.worker else df

    def __call__(self, df: DataFrame) -> DataFrame:
        out = self.apply(df)
        return self.next(out) if self.next is not None else out


def connectsteps(*steps: Step) -> Step:
    """Wire steps into a chain (ref connectsteps steps.py:51-54)."""
    for a, b in zip(steps, steps[1:]):
        a.next = b
    return steps[0]


class MappingStep(Step):
    """Apply a function per attribute (ref steps.py:172-204)."""

    def __init__(self, callables: Mapping[str, Callable[[Column], Column]], **kw):
        super().__init__(**kw)
        self.callables = callables

    def apply(self, df: DataFrame) -> DataFrame:
        for c, fn in self.callables.items():
            df = df.withColumn(c, fn(F.col(c)))
        return df


class ValueMappingStep(Step):
    """Dict-based value translation with default (ref steps.py:207-256),
    e.g. {'DK': 'Denmark'}. Executes as one ``element_at(create_map)``
    expression — a tiny broadcast-free lookup table inside codegen."""

    def __init__(self, outputatt: str, inputatt: str, mapping: Mapping, defaultvalue=None, **kw):
        super().__init__(**kw)
        self.outputatt, self.inputatt = outputatt, inputatt
        self.mapping, self.defaultvalue = dict(mapping), defaultvalue

    def apply(self, df: DataFrame) -> DataFrame:
        m = F.create_map(*[F.lit(x) for kv in self.mapping.items() for x in kv])
        expr = F.coalesce(F.element_at(m, F.col(self.inputatt)), F.lit(self.defaultvalue))
        return df.withColumn(self.outputatt, expr)


class RenamingFromToStep(Step):
    """(ref steps.py:336-357)"""

    def __init__(self, renaming: Mapping[str, str], **kw):
        super().__init__(**kw)
        self.renaming = renaming

    def apply(self, df: DataFrame) -> DataFrame:
        for old, new in self.renaming.items():
            df = df.withColumnRenamed(old, new)
        return df


class RenamingToFromStep(RenamingFromToStep):
    """(ref steps.py:360-370)"""

    def apply(self, df: DataFrame) -> DataFrame:
        for new, old in self.renaming.items():
            df = df.withColumnRenamed(old, new)
        return df


class ConditionalStep(Step):
    """Route rows to one of two branches by predicate; rows failing both
    are dropped (ref steps.py:390-422). ``apply`` returns the true-branch
    result unioned with the false-branch result when both are set."""

    def __init__(self, condition: Column | str, whentrue: Step | None,
                 whenfalse: Step | None = None, **kw):
        super().__init__(**kw)
        self.condition = F.expr(condition) if isinstance(condition, str) else condition
        self.whentrue, self.whenfalse = whentrue, whenfalse

    def apply(self, df: DataFrame) -> DataFrame:
        parts = []
        t = df.filter(self.condition)
        parts.append(self.whentrue(t) if self.whentrue else t)
        if self.whenfalse is not None:
            parts.append(self.whenfalse(df.filter(~self.condition)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out


class CopyStep(Step):
    """Send the relation to two destinations (ref steps.py:425-461);
    lineage makes the copy free — both branches share the same plan."""

    def __init__(self, dest1: Step, dest2: Step, **kw):
        super().__init__(**kw)
        self.dest1, self.dest2 = dest1, dest2

    def apply(self, df: DataFrame) -> DataFrame:
        self.dest2(df)
        return self.dest1(df)


class GarbageStep(Step):
    """Sink to nowhere (ref steps.py:259-271)."""

    def apply(self, df: DataFrame) -> DataFrame:
        return df.limit(0)


class PrintStep(Step):
    """Debug print (ref steps.py:274-278)."""

    def __init__(self, n: int = 20, **kw):
        super().__init__(**kw)
        self.n = n

    def apply(self, df: DataFrame) -> DataFrame:
        df.show(self.n)
        return df


class SourceStep(Step):
    """Pump a source into the chain (ref steps.py:373-387): here simply
    the identity carrying a fixed DataFrame."""

    def __init__(self, source: DataFrame, **kw):
        super().__init__(**kw)
        self.source = source

    def apply(self, df: DataFrame) -> DataFrame:  # noqa: ARG002
        return self.source


class AggregatingStep(Step):
    """Aggregate the stream (ref steps.py:464-560, experimental in the
    reference): groupBy + agg expressions."""

    def __init__(self, keys: list[str], aggs: list[Column], **kw):
        super().__init__(**kw)
        self.keys, self.aggs = keys, aggs

    def apply(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).agg(*self.aggs) if self.keys else df.agg(*self.aggs)


class DimensionStep(Step):
    """Ensure each row's member in one or more dimensions and decorate
    the stream with the surrogate key(s) (ref DimensionStep
    steps.py:240-278: per-row ``dimension.ensure`` + key insertion).
    Batch restatement: one ``ensure`` per dimension over the whole
    micro-batch — same decoration, set-at-a-time."""

    def __init__(self, *dimensions, keymapping: Mapping[str, str] | None = None, **kw):
        super().__init__(**kw)
        self.dimensions = list(dimensions)
        self.keymapping = keymapping

    def apply(self, df: DataFrame) -> DataFrame:
        for dim in self.dimensions:
            df = dim.ensure(df, self.keymapping)
        return df


class SCDimensionStep(DimensionStep):
    """DimensionStep over slowly changing dimensions (ref SCDimensionStep
    steps.py:281-318): ``scdensure`` per batch, then a lookup decorates
    the stream with the current version's key."""

    def apply(self, df: DataFrame) -> DataFrame:
        for dim in self.dimensions:
            dim.scdensure(df, self.keymapping)
            df = dim.lookup(df, self.keymapping)
        return df


def SumAggregator(column, alias=None):
    """Step-level aggregator helpers (ref steps.py:563-618 SumAggregator/
    AvgAggregator/...): Column factories for AggregatingStep. The
    reference's ``AggregatedRow`` mutable-row machinery has no batch
    analogue — ``groupBy().agg`` subsumes it."""
    c = F.sum(column)
    return c.alias(alias) if alias else c


def AvgAggregator(column, alias=None):
    c = F.avg(column)
    return c.alias(alias) if alias else c


def MaxAggregator(column, alias=None):
    c = F.max(column)
    return c.alias(alias) if alias else c


def MinAggregator(column, alias=None):
    c = F.min(column)
    return c.alias(alias) if alias else c
