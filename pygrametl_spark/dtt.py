"""Drawn Table Testing (reference ``pygrametl/drawntabletesting`` parity).

The reference's DTT declares test tables as ASCII drawings with typed
headers (``| id:int (pk) | title:text |``), instantiates them in an
RDBMS, and asserts set-equality/disjointness/subset between expected
drawing and actual table, with variable cells ``$name`` / ``$_`` /
``$_!`` (drawntabletesting/__init__.py:214-297, 527-626, 694-769).

Spark restatement: a drawing parses straight into a typed DataFrame
(no database); assertions compare collected row multisets with the same
variable semantics. Intended for tests — data is test-sized by
construction, so driver-side comparison is correct and simple.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["Table", "assertEqual", "assertDisjoint", "assertSubset"]

# DTT/SQL type names -> Spark types (ref drawntabletesting/__init__.py:114-128)
_TYPES = {
    "smallint": T.IntegerType(), "int": T.IntegerType(), "integer": T.IntegerType(),
    "bigint": T.LongType(), "decimal": T.DecimalType(18, 2), "numeric": T.DecimalType(18, 2),
    "real": T.DoubleType(), "double precision": T.DoubleType(), "double": T.DoubleType(),
    "float": T.DoubleType(), "char": T.StringType(), "varchar": T.StringType(),
    "text": T.StringType(), "date": T.DateType(), "timestamp": T.TimestampType(),
    "bool": T.BooleanType(), "boolean": T.BooleanType(),
}

_VARIABLE = re.compile(r"^\$(\w+|_!?)$")


def _cells(line: str) -> list[str]:
    """Split a drawing line on '|', dropping the outer empties."""
    parts = line.split("|")
    return [p for p in parts[1:-1]] if len(parts) > 2 else [p for p in parts if p.strip()]


@dataclass
class _Column:
    name: str
    typename: str
    pk: bool


class Table:
    """A drawn table.

    >>> t = Table("book", '''
    ... | id:int (pk) | title:text |
    ... | ----------- | ---------- |
    ... | 1           | Unknown    |
    ... | 2           | Nineteen   |
    ... ''')
    >>> df = t.df(spark)

    ``+`` concatenates additional drawn rows (postcondition drawings,
    ref __init__.py:418-448). Cells may be variables: ``$_`` matches
    anything, ``$_!`` anything non-NULL, ``$name`` must bind to the
    same value at every occurrence.
    """

    def __init__(self, name: str, drawing: str, *, nullsubst: str = "NULL"):
        self.name = name
        self.nullsubst = nullsubst
        lines = [ln.strip() for ln in drawing.strip().splitlines() if ln.strip()]
        if not lines:
            raise ValueError("empty drawing")
        self.columns = self._parse_header(lines[0])
        body = lines[1:]
        if body and set(body[0].replace("|", "").strip()) <= {"-", " "}:
            body = body[1:]  # separator row
        self.rows = [self._parse_row(ln) for ln in body]

    def _parse_header(self, line: str) -> list[_Column]:
        cols = []
        for cell in _cells(line):
            m = re.match(r"^(\w+)\s*:\s*([\w ]+?)\s*(\(pk\))?$", cell.strip())
            if not m:
                raise ValueError(f"bad header cell: {cell!r}")
            name, typename, pk = m.group(1), m.group(2).strip().lower(), bool(m.group(3))
            if typename not in _TYPES:
                raise ValueError(f"unknown type {typename!r} in {cell!r}")
            cols.append(_Column(name, typename, pk))
        return cols

    def _parse_row(self, line: str) -> tuple:
        cells = _cells(line)
        if len(cells) != len(self.columns):
            raise ValueError(f"row has {len(cells)} cells, expected {len(self.columns)}: {line!r}")
        return tuple(self._parse_cell(c.strip(), col) for c, col in zip(cells, self.columns))

    def _parse_cell(self, cell: str, col: _Column):
        if _VARIABLE.match(cell):
            return cell  # variables stay symbolic
        if cell == self.nullsubst:
            return None
        t = _TYPES[col.typename]
        if isinstance(t, (T.IntegerType, T.LongType)):
            return int(cell)
        if isinstance(t, T.DoubleType):
            return float(cell)
        if isinstance(t, T.DecimalType):
            from decimal import Decimal

            return Decimal(cell)
        if isinstance(t, T.BooleanType):
            return cell.lower() in ("true", "t", "1")
        if isinstance(t, T.DateType):
            import datetime

            return datetime.date.fromisoformat(cell)
        if isinstance(t, T.TimestampType):
            import datetime

            return datetime.datetime.fromisoformat(cell)
        return cell

    # -- construction -----------------------------------------------------
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, _TYPES[c.typename], True) for c in self.columns]
        )

    def df(self, spark: SparkSession) -> DataFrame:
        if any(self._has_variables(r) for r in self.rows):
            raise ValueError("drawing with variables cannot materialize as a DataFrame")
        return spark.createDataFrame(self.rows, self.schema())

    def view(self, spark: SparkSession) -> DataFrame:
        """Register as a temp view named after the table (the reference's
        ``create()``/``ensure()`` against the test DB)."""
        d = self.df(spark)
        d.createOrReplaceTempView(self.name)
        return d

    @staticmethod
    def _has_variables(row: tuple) -> bool:
        return any(isinstance(v, str) and _VARIABLE.match(v) for v in row)

    def __add__(self, extra_rows: str) -> "Table":
        clone = Table.__new__(Table)
        clone.name, clone.nullsubst, clone.columns = self.name, self.nullsubst, self.columns
        clone.rows = list(self.rows)
        for ln in [ln.strip() for ln in extra_rows.strip().splitlines() if ln.strip()]:
            clone.rows.append(clone._parse_row(ln))
        return clone

    # -- assertions (ref __init__.py:241-297) -----------------------------
    def assertEqual(self, actual: DataFrame) -> None:
        actual_rows = [tuple(r) for r in actual.select(*[c.name for c in self.columns]).collect()]
        if len(actual_rows) != len(self.rows):
            raise AssertionError(
                f"{self.name}: expected {len(self.rows)} rows, got {len(actual_rows)}"
            )
        if not _match(self.rows, actual_rows, {}):
            raise AssertionError(
                f"{self.name}: table mismatch\nexpected: {sorted(map(str, self.rows))}"
                f"\nactual:   {sorted(map(str, actual_rows))}"
            )

    def assertSubset(self, actual: DataFrame) -> None:
        actual_rows = [tuple(r) for r in actual.select(*[c.name for c in self.columns]).collect()]
        if not _match(self.rows, actual_rows, {}, subset=True):
            raise AssertionError(f"{self.name}: drawn rows are not a subset of the table")

    def assertDisjoint(self, actual: DataFrame) -> None:
        actual_rows = [tuple(r) for r in actual.select(*[c.name for c in self.columns]).collect()]
        for er in self.rows:
            for ar in actual_rows:
                if _row_matches(er, ar, {}) is not None:
                    raise AssertionError(f"{self.name}: row {er} present in table")


def _row_matches(expected: tuple, actual: tuple, bindings: dict) -> dict | None:
    """Return updated bindings if the expected row (with variables) matches
    the actual row under current variable bindings, else None."""
    new = dict(bindings)
    for e, a in zip(expected, actual):
        if isinstance(e, str) and _VARIABLE.match(e):
            var = e[1:]
            if var == "_":
                continue
            if var == "_!":
                if a is None:
                    return None
                continue
            if var in new:
                if new[var] != a:
                    return None
            else:
                new[var] = a
        elif e != a:
            return None
    return new


def _match(expected: list, actual: list, bindings: dict, *, subset: bool = False) -> bool:
    """Backtracking multiset match of expected (with variables) onto
    distinct actual rows, consistent bindings throughout."""
    if not expected:
        return True
    first, rest = expected[0], expected[1:]
    for i, a in enumerate(actual):
        nb = _row_matches(first, a, bindings)
        if nb is not None:
            if _match(rest, actual[:i] + actual[i + 1 :], nb, subset=subset):
                return True
    return False


def assertEqual(drawing: Table, actual: DataFrame) -> None:
    drawing.assertEqual(actual)


def assertSubset(drawing: Table, actual: DataFrame) -> None:
    drawing.assertSubset(actual)


def assertDisjoint(drawing: Table, actual: DataFrame) -> None:
    drawing.assertDisjoint(actual)
