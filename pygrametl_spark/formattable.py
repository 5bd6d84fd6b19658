"""Reformat a drawn table inside a text file (reference
``pygrametl/drawntabletesting/formattable.py`` parity).

Given a file and a 1-based line number anywhere inside a drawn table,
the contiguous block of ``|``-bearing lines around that point is parsed
with :class:`pygrametl_spark.dtt.Table` and rewritten in canonical
aligned form (pipes lined up, dash separator normalized), preserving the
block's indentation — the editor-integration utility for keeping ``.dtt``
corpora and docstring drawings tidy.

CLI: ``python -m pygrametl_spark.formattable FILE LINE``.
"""

from __future__ import annotations

import sys

from . import dtt

__all__ = ["reformat_block", "reformat_file", "main"]


def reformat_block(lines: list[str], point: int) -> tuple[int, int, list[str]]:
    """Reformat the drawn table containing line index ``point``
    (0-based) in ``lines`` (no trailing newlines). Returns
    ``(start, end, new_lines)`` where ``lines[start:end+1]`` is the
    block that was replaced."""
    if "|" not in lines[point]:
        raise ValueError(f"line {point + 1} is not inside a drawn table")
    start = point
    while start > 0 and "|" in lines[start - 1]:
        start -= 1
    end = point
    while end < len(lines) - 1 and "|" in lines[end + 1]:
        end += 1

    indent = lines[start][: len(lines[start]) - len(lines[start].lstrip())]
    drawing = "\n".join(ln.strip() for ln in lines[start : end + 1])
    table = dtt.Table("", drawing)
    new = [indent + ln for ln in str(table).split("\n")]
    return start, end, new


def reformat_file(path: str, lineno: int) -> None:
    """Rewrite ``path`` with the table at 1-based ``lineno`` reformatted."""
    with open(path) as f:
        lines = f.read().split("\n")
    start, end, new = reformat_block(lines, lineno - 1)
    lines[start : end + 1] = new
    with open(path, "w") as f:
        f.write("\n".join(lines))


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 2:
        print("usage: formattable file line")
        return 1
    reformat_file(argv[0], int(argv[1]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
