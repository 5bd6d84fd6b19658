"""Standalone .dtt runner tests (reference dttr.py:41-94 parity).

The corpus mirrors the reference's own runner corpus shape
(reference tests/drawntabletesting/dttr/*.dtt): bare preconditions,
``, equal`` / ``, disjoint`` / ``, subset`` postconditions, external
``csv`` / ``sql`` / config-callable row sources, and ``@connection``
routing — run end-to-end against in-memory SQLite state.
"""

import sqlite3
import sys
import types

import pytest

from pygrametl_spark import dttr


BOOKS = """\
| bid:int (pk) | title:text       | genre:text |
| ------------ | ---------------- | ---------- |
| 1            | Dune             | Novel      |
| 2            | The Hobbit       | Novel      |
| 3            | Moomin One       | Comic      |
| 4            | Moomin Two       | Comic      |
| 5            | On Food          | Cookbook   |
"""


def write(path, text):
    path.write_text(text)
    return str(path)


@pytest.fixture()
def config():
    cfg = types.ModuleType("config")
    cfg.connection = sqlite3.connect(":memory:")
    cfg.oltp = sqlite3.connect(":memory:")

    def csv_upper(columns, path, delimiter):
        import csv

        with open(path) as f:
            rows = list(csv.DictReader(f, fieldnames=columns, delimiter=delimiter))
        for r in rows:
            r["genre"] = r["genre"].upper()
        return rows

    cfg.csv_upper = csv_upper
    return cfg


def test_dttr_pre_and_assert_equal(tmp_path, config):
    p = write(tmp_path / "equal.dtt", f"book\n{BOOKS}\nbook, equal\n{BOOKS}")
    assert dttr.run([p], config=config) == []


def test_dttr_assert_disjoint_and_subset(tmp_path, config):
    corpus = (
        f"book\n{BOOKS}\n"
        "book, disjoint\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 9            | Dune       | Novel      |\n"
        "\n"
        "book, subset\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 1            | Dune       | Novel      |\n"
    )
    p = write(tmp_path / "mixed.dtt", corpus)
    assert dttr.run([p], config=config) == []


def test_dttr_postcondition_failure_is_reported_not_raised(tmp_path, config):
    corpus = (
        f"book\n{BOOKS}\n"
        "book, equal\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 1            | Dune       | Novel      |\n"
    )
    p = write(tmp_path / "bad.dtt", corpus)
    failures = dttr.run([p], config=config)
    assert len(failures) == 1 and failures[0].phase == "post"
    assert "bad.dtt" in str(failures[0])


def test_dttr_etl_between_pre_and_post(tmp_path, config):
    """Preconditions seed the DB, the ETL callable mutates it, and the
    postcondition observes the mutation (the runner's whole purpose)."""
    corpus = (
        f"book\n{BOOKS}\n"
        "book, equal\n"
        f"{BOOKS}"
        "| 6            | New Book   | Novel      |\n"
    )
    p = write(tmp_path / "etl.dtt", corpus)

    def etl():
        cur = config.connection.cursor()
        cur.execute("INSERT INTO book VALUES (6, 'New Book', 'Novel')")
        config.connection.commit()

    assert dttr.run([p], config=config, etl=etl) == []


def test_dttr_csv_source(tmp_path, config):
    rows = tmp_path / "rows.csv"
    rows.write_text("1,Dune,Novel\n2,The Hobbit,Novel\n")
    corpus = (
        "book\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        f"csv {rows} ,\n"
        "\n"
        "book, equal\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 1            | Dune       | Novel      |\n"
        "| 2            | The Hobbit | Novel      |\n"
    )
    p = write(tmp_path / "csv.dtt", corpus)
    assert dttr.run([p], config=config) == []


def test_dttr_custom_reader_and_sql_source(tmp_path, config):
    rows = tmp_path / "rows.csv"
    rows.write_text("1,Dune,novel\n")
    cur = config.oltp.cursor()
    cur.execute("CREATE TABLE src (bid INT, title TEXT, genre TEXT)")
    cur.execute("INSERT INTO src VALUES (7, 'Queried', 'Novel')")
    config.oltp.commit()
    corpus = (
        "book\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        f"csv_upper {rows} ,\n"
        "\n"
        "queried\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "sql oltp SELECT bid, title, genre FROM src\n"
        "\n"
        "book, equal\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 1            | Dune       | NOVEL      |\n"
        "\n"
        "queried, equal\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 7            | Queried    | Novel      |\n"
    )
    p = write(tmp_path / "readers.dtt", corpus)
    assert dttr.run([p], config=config) == []


def test_dttr_connection_routing(tmp_path, config):
    """``table@oltp`` creates and asserts on the named connection, not
    the default one."""
    corpus = f"book@oltp\n{BOOKS}\nbook@oltp, equal\n{BOOKS}"
    p = write(tmp_path / "conn.dtt", corpus)
    assert dttr.run([p], config=config) == []
    # the table lives on oltp only
    assert config.oltp.cursor().execute("SELECT COUNT(*) FROM book").fetchone()[0] == 5
    with pytest.raises(sqlite3.OperationalError):
        config.connection.cursor().execute("SELECT COUNT(*) FROM book")


def test_dttr_reader_error_reported(tmp_path, config):
    corpus = (
        "book\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "csv /nonexistent/rows.csv ,\n"
    )
    p = write(tmp_path / "err.dtt", corpus)
    failures = dttr.run([p], config=config)
    assert len(failures) == 1 and failures[0].phase == "reader"
    assert "csv" in failures[0].message


def test_dttr_variable_prefix_and_nullsubst(tmp_path, config):
    corpus = (
        "book\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| 1            | Dune       | -          |\n"
        "\n"
        "book, equal\n"
        "| bid:int (pk) | title:text | genre:text |\n"
        "| %_!          | %t         | %_         |\n"
    )
    p = write(tmp_path / "vars.dtt", corpus)
    assert dttr.run([p], config=config, nullsubst="-", variableprefix="%") == []


def test_dttr_cli_main(tmp_path, monkeypatch):
    """The CLI discovers *.dtt under -f DIR, loads config.py from it,
    and exits 0 on a green corpus / 1 on a red one."""
    (tmp_path / "config.py").write_text(
        "import sqlite3\nconnection = sqlite3.connect(':memory:')\n"
    )
    write(tmp_path / "green.dtt", f"book\n{BOOKS}\nbook, equal\n{BOOKS}")
    import os

    cwd = os.getcwd()
    try:
        assert dttr.main(["-f", str(tmp_path)]) == 0
        write(
            tmp_path / "red.dtt",
            "book, subset\n"
            "| bid:int (pk) | title:text | genre:text |\n"
            "| 99           | Missing    | Novel      |\n",
        )
        assert dttr.main(["-f", str(tmp_path)]) == 1
    finally:
        os.chdir(cwd)
