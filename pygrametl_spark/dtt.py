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

Database-state management (ref __init__.py:299-407) is also supported
against a live PEP 249 connection: ``create``/``ensure``/``reset``/
``drop`` instantiate the drawing in a test database, ``update``/
``additions`` build postcondition drawings, and ``clear`` drops
everything in reverse-creation order. Pass ``testconnection`` at
construction or set a default via :func:`connectionwrapper`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "Table", "Variable", "assertEqual", "assertDisjoint", "assertSubset",
    "connectionwrapper",
]

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

#: default PEP 249 test connection (ref dtt.connectionwrapper)
_DEFAULT_CON = None


class Variable:
    """Programmatic handle for a drawing variable (ref drawntabletesting
    Variable): ``Variable("key")`` stringifies to ``$key``, so drawings
    can be built with f-strings instead of literal ``$`` tokens.
    ``Variable("_")`` is the wildcard, ``Variable("_!")`` the
    not-NULL wildcard."""

    def __init__(self, name: str):
        if not _VARIABLE.match(f"${name}"):
            raise ValueError(f"invalid variable name: {name!r}")
        self.name = name

    def __str__(self) -> str:
        return f"${self.name}"

    def __repr__(self) -> str:
        return f"Variable({self.name!r})"

    def __eq__(self, other) -> bool:
        return isinstance(other, Variable) and other.name == self.name

    def __hash__(self) -> int:
        return hash(("dtt.Variable", self.name))


def connectionwrapper(con=None):
    """Set (and return) the default PEP 249 test connection used by
    Table.create/ensure/reset/drop when none is passed — the engine's
    stand-in for the reference's default ConnectionWrapper
    (ref drawntabletesting/__init__.py:60-77)."""
    global _DEFAULT_CON
    if con is not None:
        _DEFAULT_CON = con
    return _DEFAULT_CON


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

    #: tables created through create()/ensure(), in creation order
    #: (ref __init__.py:305 __createdTables) — clear() drops them reversed
    _created: dict = {}

    def __init__(self, name: str, drawing: str, *, nullsubst: str = "NULL",
                 variableprefix: str = "$", testconnection=None,
                 loadFrom=None):
        self.name = name
        self.nullsubst = nullsubst
        self.variableprefix = variableprefix
        self.testconnection = testconnection
        self._additions: set[int] = set()
        lines = [ln.strip() for ln in drawing.strip().splitlines() if ln.strip()]
        if not lines:
            raise ValueError("empty drawing")
        self.columns = self._parse_header(lines[0])
        body = lines[1:]
        if body and set(body[0].replace("|", "").strip()) <= {"-", " "}:
            body = body[1:]  # separator row
        self.rows = [self._parse_row(ln) for ln in body]
        if loadFrom is not None:
            # External data source (ref __init__.py Table(loadFrom=...)):
            # a sequence of dicts keyed by column name; string values are
            # parsed through the same per-type cell rules as drawn cells
            # (CSV readers hand everything over as text).
            for rec in loadFrom:
                self.rows.append(tuple(
                    self._parse_cell(str(rec[c.name]).strip(), c)
                    if rec[c.name] is not None else None
                    for c in self.columns
                ))

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
        pfx = getattr(self, "variableprefix", "$")
        if cell.startswith(pfx) and _VARIABLE.match("$" + cell[len(pfx):]):
            return "$" + cell[len(pfx):]  # variables stay symbolic ($-canonical)
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

    # -- drawing round-trip (ref __init__.py:161-180) ----------------------
    def _cell_str(self, v) -> str:
        if v is None:
            return self.nullsubst
        if isinstance(v, str) and _VARIABLE.match(v):
            return self.variableprefix + v[1:]
        if isinstance(v, bool):
            return "true" if v else "false"
        return str(v)

    def __str__(self) -> str:
        """The drawing re-rendered in canonical aligned input format —
        header with types, dash separator, rows (ref __init__.py:161-163;
        what the ``formattable`` reformatter writes back)."""
        headers = [
            f"{c.name}:{c.typename}" + (" (pk)" if c.pk else "")
            for c in self.columns
        ]
        cols = [[h] + [self._cell_str(r[i]) for r in self.rows]
                for i, h in enumerate(headers)]
        widths = [max(len(s) for s in col) for col in cols]

        def line(cells):
            return "| " + " | ".join(
                s.ljust(w) for s, w in zip(cells, widths)
            ) + " |"

        out = [line(headers), line(["-" * w for w in widths])]
        out.extend(line([self._cell_str(v) for v in r]) for r in self.rows)
        return "\n".join(out)

    def __len__(self) -> int:
        return len(self.rows)

    def __iter__(self):
        return (
            {c.name: v for c, v in zip(self.columns, r)} for r in self.rows
        )

    def __getitem__(self, index: int) -> dict:
        return {c.name: v for c, v in zip(self.columns, self.rows[index])}

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

    def _copy(self) -> "Table":
        clone = Table.__new__(Table)
        clone.name, clone.nullsubst, clone.columns = self.name, self.nullsubst, self.columns
        clone.variableprefix = self.variableprefix
        clone.testconnection = self.testconnection
        clone.rows = list(self.rows)
        clone._additions = set(self._additions)
        return clone

    def __add__(self, extra_rows: str) -> "Table":
        """Postcondition drawing: extra drawn rows (ref __init__.py:418-448);
        the new rows are tracked for :meth:`additions`."""
        clone = self._copy()
        for ln in [ln.strip() for ln in extra_rows.strip().splitlines() if ln.strip()]:
            clone._additions.add(len(clone.rows))
            clone.rows.append(clone._parse_row(ln))
        return clone

    def update(self, index: int, line: str) -> "Table":
        """New instance with row ``index`` updated from the drawn ``line``
        (ref __init__.py:357-381); empty cells keep the old value, and the
        row is tracked for :meth:`additions`."""
        if index >= len(self.rows):
            raise ValueError(
                f"{self.name} index out of bounds {index} >= {len(self.rows)}"
            )
        cells = _cells(line.strip())
        if len(cells) != len(self.columns):
            raise ValueError(
                f"update line has {len(cells)} cells, expected {len(self.columns)}"
            )
        clone = self._copy()
        new = tuple(
            old if cell.strip() == "" else self._parse_cell(cell.strip(), col)
            for old, cell, col in zip(self.rows[index], cells, self.columns)
        )
        clone.rows[index] = new
        clone._additions.add(index)
        return clone

    def additions(self, withKey: bool = False) -> list[dict]:
        """Rows added (via ``+``) or updated since the original drawing
        (ref __init__.py:383-395). ``withKey=False`` drops pk columns —
        the shape ``ensure``-style loaders expect."""
        out = []
        for i in sorted(self._additions):
            if withKey:
                out.append({c.name: v for c, v in zip(self.columns, self.rows[i])})
            else:
                out.append(
                    {c.name: v for c, v in zip(self.columns, self.rows[i]) if not c.pk}
                )
        return out

    # -- database state (ref __init__.py:299-407) --------------------------
    def getSQLToCreate(self) -> str:
        cols = [f"{c.name} {c.typename.upper()}" for c in self.columns]
        pks = [c.name for c in self.columns if c.pk]
        pk = f", PRIMARY KEY ({', '.join(pks)})" if pks else ""
        return f"CREATE TABLE {self.name} ({', '.join(cols)}{pk})"

    def getSQLToInsert(self) -> str:
        names = ", ".join(c.name for c in self.columns)
        ph = ", ".join("?" for _ in self.columns)
        return f"INSERT INTO {self.name} ({names}) VALUES ({ph})"

    def _con(self, con=None):
        con = con or self.testconnection or _DEFAULT_CON
        if con is None:
            raise ValueError(
                f"{self.name}: no test connection (pass testconnection= or "
                "set a default with dtt.connectionwrapper(con))"
            )
        return con

    def create(self, con=None) -> None:
        """Create the table without adding rows (ref __init__.py:299-304)."""
        con = self._con(con)
        con.cursor().execute(self.getSQLToCreate())
        con.commit()
        Table._created[self.name] = (self, con)

    def ensure(self, con=None) -> None:
        """Create + fill if absent; verify contents if present — refuses
        to override existing data (ref __init__.py:330-355)."""
        if any(self._has_variables(r) for r in self.rows):
            raise ValueError(f"{self.name} contains variables")
        con = self._con(con)
        try:
            con.cursor().execute(f"SELECT 1 FROM {self.name}")
        except Exception:  # missing-table error is driver dependent
            try:
                con.rollback()
            except Exception:  # noqa: BLE001 — not all drivers support it
                pass
            self.create(con)
            if self.rows:
                con.cursor().executemany(
                    self.getSQLToInsert(), [tuple(r) for r in self.rows]
                )
                con.commit()
            return
        db = self._fetch_db(con)
        if len(db) != len(self.rows) or not _match(self.rows, db, {}):
            raise ValueError(f"{self.name} contains other rows")

    def reset(self, con=None) -> None:
        """Forcefully recreate with the drawn rows (ref __init__.py:322-328)."""
        con = self._con(con)
        try:
            con.cursor().execute(f"DROP TABLE {self.name}")
            con.commit()
        except Exception:  # noqa: BLE001 — missing table is fine
            try:
                con.rollback()
            except Exception:  # noqa: BLE001
                pass
        Table._created.pop(self.name, None)
        self.ensure(con)

    def drop(self, con=None) -> None:
        """Drop without checking contents (ref __init__.py:397-404); only
        tables created through a Table instance may be dropped."""
        if self.name not in Table._created:
            raise ValueError(f"{self.name} is not created by a Table instance")
        con = self._con(con)
        con.cursor().execute(f"DROP TABLE {self.name}")
        con.commit()
        del Table._created[self.name]

    @classmethod
    def clear(cls) -> None:
        """Drop all created tables, newest first (ref __init__.py:306-320)."""
        for name, (_, con) in reversed(list(cls._created.items())):
            try:
                con.cursor().execute(f"DROP TABLE {name}")
                con.commit()
            except Exception:  # noqa: BLE001 — driver-dependent missing-table error
                pass
        cls._created.clear()

    def _fetch_db(self, con=None) -> list[tuple]:
        con = self._con(con)
        cur = con.cursor()
        cur.execute(
            f"SELECT {', '.join(c.name for c in self.columns)} FROM {self.name}"
        )
        return [tuple(r) for r in cur.fetchall()]

    # -- assertions (ref __init__.py:241-297) -----------------------------
    def _actual_rows(self, actual: DataFrame | None) -> list[tuple]:
        """Rows to assert against: a DataFrame's, or — mirroring the
        reference, which always asserts against the test database — the
        live table's via the test connection when ``actual`` is None."""
        if actual is None:
            return self._fetch_db()
        return [tuple(r) for r in actual.select(*[c.name for c in self.columns]).collect()]

    def assertEqual(self, actual: DataFrame | None = None) -> None:
        actual_rows = self._actual_rows(actual)
        if len(actual_rows) != len(self.rows):
            raise AssertionError(
                f"{self.name}: expected {len(self.rows)} rows, got {len(actual_rows)}"
            )
        if not _match(self.rows, actual_rows, {}):
            raise AssertionError(
                f"{self.name}: table mismatch\nexpected: {sorted(map(str, self.rows))}"
                f"\nactual:   {sorted(map(str, actual_rows))}"
            )

    def assertSubset(self, actual: DataFrame | None = None) -> None:
        actual_rows = self._actual_rows(actual)
        if not _match(self.rows, actual_rows, {}, subset=True):
            raise AssertionError(f"{self.name}: drawn rows are not a subset of the table")

    def assertDisjoint(self, actual: DataFrame | None = None) -> None:
        actual_rows = self._actual_rows(actual)
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
