"""Standalone runner for tests written as ``.dtt`` drawn-table files
(reference ``pygrametl/drawntabletesting/dttr.py:41-94`` parity).

A ``.dtt`` file holds drawn tables separated by blank lines. Each DT's
first line is ``tablename[@connection][, assertname]``:

* no assert name  -> a PRECONDITION: the drawing is ``ensure``-d into
  the test database before the ETL flow runs;
* an assert name (``equal`` / ``disjoint`` / ``subset``) -> a
  POSTCONDITION checked against the live table after the ETL flow.

The drawing body is the usual typed header + rows. If the DT's LAST
line does not start with ``|`` it names an external row source instead
of drawn rows: ``csv <path> <delimiter>`` (stdlib DictReader), ``sql
[connection] SELECT ...`` (run on a config connection), or any callable
named in ``config.py`` (called as ``fn(columns, *args)`` and returning
dicts). ``config.py`` in the test directory supplies PEP 249
connections by attribute name (default name ``connection``; a private
in-memory SQLite connection is created when no config exists).

Failures in one condition are reported and do not stop the run — the
reference runner's behavior, which lets a whole corpus report every
broken condition at once. :func:`run` is the programmatic entry
(returns the failure list); ``python -m pygrametl_spark.dttr`` is the
CLI with the reference's flags (-e/-f/-n/-p/-P/-r/-v).
"""

from __future__ import annotations

import csv as _csv
import os
import shlex
import sqlite3
import sys
import types
from dataclasses import dataclass
from pathlib import Path

from . import dtt

__all__ = ["run", "main", "Condition", "Failure"]

DEFAULT_CONNECTION_NAME = "connection"
_ASSERTS = {"Equal", "Disjoint", "Subset"}


@dataclass
class Condition:
    path: str
    start: int  # first drawing line number (1-based)
    end: int    # last drawing line number
    table: "dtt.Table"
    assert_name: str | None  # None -> precondition


@dataclass
class Failure:
    phase: str  # "reader" | "pre" | "post"
    path: str
    start: int
    end: int
    message: str

    def __str__(self) -> str:
        tag = {"reader": "(Reader)", "pre": "(Pre)", "post": "(Post)"}[self.phase]
        return f"[{tag} {self.path}({self.start}-{self.end})] {self.message}"


def _read_csv(columns, path, delimiter):
    with open(path, newline="") as f:
        return list(_csv.DictReader(f, fieldnames=columns, delimiter=delimiter))


def _read_sql(columns, config, *arguments):
    """``sql [connection] SELECT ...``: run the query on a config
    connection and shape the rows as dicts keyed by the DT's columns."""
    if arguments and arguments[0].upper() == "SELECT":
        con = getattr(config, DEFAULT_CONNECTION_NAME)
        query = " ".join(arguments)
    else:
        con = getattr(config, arguments[0])
        query = " ".join(arguments[1:])
    cur = con.cursor()
    cur.execute(query)
    rows = [dict(zip(columns, r)) for r in cur.fetchall()]
    cur.close()
    return rows


def _split_dts(path: str):
    """Yield (first_lineno, last_lineno, lines) per blank-line-separated
    DT in the file."""
    with open(path) as f:
        block: list[str] = []
        start = None
        for lineno, raw in enumerate(f, start=1):
            line = raw.strip()
            if line:
                if start is None:
                    start = lineno
                block.append(line)
            elif block:
                yield start, lineno - 1, block
                block, start = [], None
        if block:
            yield start, lineno, block


def _parse_dt(path, start, end, lines, *, config, nullsubst, variableprefix,
              failures):
    """One DT block -> a Condition, or None (reader/parse error recorded)."""
    header = [s.strip() for s in lines[0].split(",")]
    name = header[0]
    connection_name = DEFAULT_CONNECTION_NAME
    if "@" in name:
        name, connection_name = name.split("@")
    assert_name = None
    if len(header) == 2:
        assert_name = header[1].capitalize()
        if assert_name not in _ASSERTS:
            failures.append(Failure(
                "reader", path, start, end,
                f"unsupported assert {header[1]!r}",
            ))
            return None

    body = lines[1:]
    load_from = None
    reader_name = None
    # A last line not starting with '|' is an external data source spec
    if body and not body[-1].startswith("|"):
        spec = shlex.split(body[-1])
        reader_name, args = spec[0], spec[1:]
        columns = [c.split(":")[0].strip() for c in body[0].split("|") if c.strip()]
        try:
            if reader_name == "csv":
                load_from = _read_csv(columns, *args)
            elif reader_name == "sql":
                load_from = _read_sql(columns, config, *args)
            else:
                load_from = getattr(config, reader_name)(columns, *args)
        except Exception as e:  # noqa: BLE001 — report, keep running
            failures.append(Failure(
                "reader", path, start, end, f"{reader_name} - {e}",
            ))
            return None
        body = body[:-1]

    try:
        con = getattr(config, connection_name)
        table = dtt.Table(
            name, "\n".join(body), nullsubst=nullsubst,
            variableprefix=variableprefix, testconnection=con,
            loadFrom=load_from,
        )
    except Exception as e:  # noqa: BLE001
        failures.append(Failure(
            "reader", path, start, end, f"{reader_name or 'drawing'} - {e}",
        ))
        return None
    return Condition(path, start, end, table, assert_name)


def run(
    paths,
    *,
    config=None,
    etl=None,
    pre_paths=None,
    post_paths=None,
    nullsubst: str = "NULL",
    variableprefix: str = "$",
) -> list[Failure]:
    """Execute a ``.dtt`` corpus: ensure every precondition, run the
    optional ``etl`` (a shell command string or a Python callable), then
    check every postcondition. Returns the list of failures (empty ==
    green). ``pre_paths``/``post_paths`` restrict which files contribute
    pre-/postconditions (both default to all of ``paths``)."""
    if config is None:
        config = types.ModuleType("config")
        config.connection = sqlite3.connect(":memory:")
    paths = [str(p) for p in paths]
    pre_set = set(map(str, pre_paths)) if pre_paths else set(paths)
    post_set = set(map(str, post_paths)) if post_paths else set(paths)

    failures: list[Failure] = []
    conditions: list[Condition] = []
    for path in paths:
        for start, end, lines in _split_dts(path):
            cond = _parse_dt(
                path, start, end, lines, config=config, nullsubst=nullsubst,
                variableprefix=variableprefix, failures=failures,
            )
            if cond is None:
                continue
            if cond.assert_name is None and path in pre_set:
                conditions.append(cond)
            elif cond.assert_name is not None and path in post_set:
                conditions.append(cond)

    for cond in conditions:
        if cond.assert_name is None:
            try:
                cond.table.ensure()
            except Exception as e:  # noqa: BLE001
                failures.append(Failure("pre", cond.path, cond.start, cond.end, str(e)))

    if etl is not None:
        if callable(etl):
            etl()
        else:
            os.system(etl)  # noqa: S605 — reference-parity shell ETL hook

    for cond in conditions:
        if cond.assert_name is not None:
            try:
                getattr(cond.table, "assert" + cond.assert_name)()
            except Exception as e:  # noqa: BLE001
                failures.append(Failure("post", cond.path, cond.start, cond.end, str(e)))
    return failures


def _load_config(directory: str):
    """Import ``config.py`` from the test directory, or fall back to a
    fresh in-memory SQLite connection module."""
    cfg_path = Path(directory) / "config.py"
    if cfg_path.exists():
        import importlib.util

        spec = importlib.util.spec_from_file_location("dttr_config", cfg_path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    module = types.ModuleType("config")
    module.connection = sqlite3.connect(":memory:")
    return module


def main(argv=None) -> int:
    import argparse

    parser = argparse.ArgumentParser(
        prog="dttr", description="Run tests specified in .dtt files.",
    )
    parser.add_argument("-e", "--etl", nargs="+", default=None,
                        help="run the command ETL with the arguments ARGS")
    parser.add_argument("-f", "--files", nargs="+", default=None,
                        help="use only the conditions specified in FILES")
    parser.add_argument("-n", "--null", default="NULL",
                        help="use STRING to represent NULL (default: NULL)")
    parser.add_argument("-p", "--pre", nargs="+", default=None,
                        help="use only the preconditions specified in FILES")
    parser.add_argument("-P", "--post", nargs="+", default=None,
                        help="use only the postconditions specified in FILES")
    parser.add_argument("-r", "--recursion-off", action="store_true",
                        help="execute only the tests in cwd and not sub-folders")
    parser.add_argument("-v", "--varprefix", default="$",
                        help="use STRING as prefix for variables (default: $)")
    args = parser.parse_args(argv)

    # -f changes into the corpus directory (reference behavior), so
    # relative CSV paths inside .dtt files resolve against it
    if args.files:
        os.chdir(args.files[0])
    cwd = Path(os.getcwd())
    dtts = sorted(
        str(p) for p in (cwd.glob("*.dtt") if args.recursion_off else cwd.rglob("*.dtt"))
    )
    if args.pre and args.post:
        keep = set(args.pre + args.post)
        dtts = [p for p in dtts if p in keep or str(Path(p).name) in keep]

    failures = run(
        dtts,
        config=_load_config(os.getcwd()),
        etl=" ".join(args.etl) if args.etl else None,
        pre_paths=args.pre,
        post_paths=args.post,
        nullsubst=args.null,
        variableprefix=args.varprefix,
    )
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
