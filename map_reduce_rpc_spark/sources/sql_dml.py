"""SQL-text DML for txlog tables — ``DELETE FROM`` / ``UPDATE`` /
``MERGE INTO`` as strings, routed to the library verbs.

Why this module exists: a Spark 4 Python DataSource registers a READ
path and a WRITE path by format name, but NOT catalog tables — so
``spark.sql("UPDATE ...")`` can never reach a txlog table through
Spark's own parser (the planner resolves DML against catalog
relations only; this is the platform boundary every round's verdict
carried). The practical gap that leaves: a SQL-tooled pipeline has
DML *strings*, not Python call sites. :func:`sql` closes it with a
deliberately SMALL grammar — the three DML verbs, nothing else —
parsed here and dispatched to :func:`txlog.delete_where` /
:func:`txlog.update_where` / :func:`txlog.merge`, which own all
semantics (atomicity, retries, constraints, dv modes). Predicates
and SET expressions are NOT interpreted here: they pass through
verbatim to the verbs, where Spark's real SQL engine evaluates them
— this parser only finds the top-level keyword boundaries, so the
full Spark expression language works inside WHERE/SET/USING.

Grammar (keywords case-insensitive; `backticks` required around the
table path so it can never be confused with a keyword):

    DELETE FROM `<table root>` WHERE <predicate>
    UPDATE `<table root>` SET <col> = <expr> [, <col> = <expr>]...
        WHERE <predicate>
    MERGE INTO `<table root>` USING <view name | (SELECT ...)>
        ON <key> [, <key>]...                     -- or t.k = s.k AND ...

``mode="cow"|"dv"`` applies to DELETE/UPDATE/MERGE exactly as on the
library verbs. MERGE's ON clause accepts either a bare key-column
list or the conventional equality chain ``t.k = s.k AND t.j = s.j``
(both sides must name the same column — that is what key-matching
means here; expressions are rejected loudly). As in standard SQL, a
column whose name collides with a keyword must be backtick-quoted
(``SET `where` = 1``) — backticks are quoting to the scanner, so the
clause splitter never mistakes them for the keyword.

READ and INSERT need no front-end at all: ``CREATE TEMPORARY VIEW v
USING txlog OPTIONS (path '...')`` is native Spark DSv2 syntax that
reaches :mod:`txlog_source` directly, and ``INSERT INTO`` / ``INSERT
OVERWRITE`` on that view route through Spark's own insert planning
into the txlog writer (both pinned in tests/test_txlog_source.py) —
so SQL-text pipelines read and insert through views and mutate
through :func:`sql`: the whole surface as strings.

Reference: N/A — the Go engine has no SQL or mutation surface
(SURVEY §2.4); Delta's equivalent is its catalog-integrated DML,
which needs a JVM DataSourceV2 catalog this Python surface cannot
provide.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from . import txlog

_WS = re.compile(r"\s+")


def _scan_toplevel(s: str):
    """Yield (index, char) for characters at quote/paren depth 0 —
    the scanner every clause split uses, so quoted strings ('a WHERE
    b', "x,y"), backticked identifiers, and parenthesized subqueries
    can never confuse keyword detection."""
    depth = 0
    quote: str | None = None
    i = 0
    while i < len(s):
        c = s[i]
        if quote is not None:
            if c == quote:
                # SQL doubles quotes to escape them ('it''s')
                if quote == "'" and i + 1 < len(s) and s[i + 1] == "'":
                    i += 1
                else:
                    quote = None
        elif c in ("'", '"', "`"):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            yield i, c
        i += 1
    if quote is not None:
        raise ValueError(f"unterminated {quote} quote in DML statement")
    if depth != 0:
        raise ValueError("unbalanced parentheses in DML statement")


def _find_keyword(s: str, word: str, start: int = 0) -> int:
    """Index of the first TOP-LEVEL occurrence of the keyword (whole
    word, case-insensitive), or -1."""
    w = word.upper()
    n = len(w)
    for i, _c in _scan_toplevel(s):
        if i < start:
            continue
        if s[i : i + n].upper() == w:
            before = s[i - 1] if i > 0 else " "
            after = s[i + n] if i + n < len(s) else " "
            if not (before.isalnum() or before in "_`") and not (
                after.isalnum() or after in "_`"
            ):
                return i
    return -1


def _split_toplevel(s: str, sep: str) -> list[str]:
    parts, last = [], 0
    for i, c in _scan_toplevel(s):
        if c == sep:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return [p.strip() for p in parts]


def _table_path(s: str) -> tuple[str, str]:
    """Parse the REQUIRED backticked table root at the head of ``s``;
    returns (path, rest). Backticks make the boundary unambiguous —
    a filesystem path is not a SQL identifier."""
    s = s.lstrip()
    if not s.startswith("`"):
        raise ValueError(
            "the table root must be backtick-quoted: DELETE FROM "
            "`/path/to/table` WHERE ..."
        )
    end = s.find("`", 1)
    if end < 0:
        raise ValueError("unterminated backtick around the table root")
    path = s[1:end]
    if not path:
        raise ValueError("empty table root")
    return path, s[end + 1 :]


def _parse_delete(body: str) -> dict:
    path, rest = _table_path(body)
    w = _find_keyword(rest, "WHERE")
    if w < 0:
        # a blanket delete must be SPELLED, not defaulted into
        raise ValueError(
            "DELETE requires a WHERE clause (use WHERE true for a "
            "full-table delete)"
        )
    pred = rest[w + len("WHERE") :].strip()
    if not pred:
        raise ValueError("empty WHERE predicate")
    if rest[:w].strip():
        raise ValueError(
            f"unexpected tokens between table and WHERE: {rest[:w].strip()!r}"
        )
    return {"op": "delete", "path": path, "predicate": pred}


def _parse_update(body: str) -> dict:
    path, rest = _table_path(body)
    sk = _find_keyword(rest, "SET")
    if sk < 0:
        raise ValueError("UPDATE requires a SET clause")
    if rest[:sk].strip():
        raise ValueError(
            f"unexpected tokens between table and SET: {rest[:sk].strip()!r}"
        )
    rest = rest[sk + len("SET") :]
    w = _find_keyword(rest, "WHERE")
    if w < 0:
        raise ValueError(
            "UPDATE requires a WHERE clause (use WHERE true for a "
            "full-table update)"
        )
    set_sql, pred = rest[:w], rest[w + len("WHERE") :].strip()
    if not pred:
        raise ValueError("empty WHERE predicate")
    assignments: dict[str, str] = {}
    for item in _split_toplevel(set_sql, ","):
        if not item:
            raise ValueError("empty assignment in SET clause")
        eq = next((i for i, c in _scan_toplevel(item) if c == "="), -1)
        if eq <= 0:
            raise ValueError(f"SET assignment is not `col = expr`: {item!r}")
        col = item[:eq].strip().strip("`")
        expr = item[eq + 1 :].strip()
        if not col or not expr:
            raise ValueError(f"SET assignment is not `col = expr`: {item!r}")
        if col in assignments:
            raise ValueError(f"column {col!r} assigned twice in SET")
        assignments[col] = expr
    return {
        "op": "update",
        "path": path,
        "set": assignments,
        "predicate": pred,
    }


def _parse_merge(body: str) -> dict:
    path, rest = _table_path(body)
    u = _find_keyword(rest, "USING")
    if u < 0:
        raise ValueError("MERGE requires USING <view | (SELECT ...)>")
    if rest[:u].strip():
        raise ValueError(
            f"unexpected tokens between table and USING: {rest[:u].strip()!r}"
        )
    rest = rest[u + len("USING") :]
    on = _find_keyword(rest, "ON")
    if on < 0:
        raise ValueError("MERGE requires ON <key columns>")
    source, keys_sql = rest[:on].strip(), rest[on + len("ON") :].strip()
    if not source:
        raise ValueError("empty USING source")
    keys: list[str] = []
    for part in (
        p
        for chunk in _split_toplevel(keys_sql, ",")
        for p in re.split(r"(?i)\bAND\b", chunk)
    ):
        part = part.strip()
        if not part:
            raise ValueError("empty key in ON clause")
        m = re.fullmatch(
            r"`?(?:\w+`?\.`?)?(\w+)`?\s*=\s*`?(?:\w+`?\.`?)?(\w+)`?", part
        )
        if m:
            a, b = m.group(1), m.group(2)
            if a != b:
                raise ValueError(
                    f"ON equality must match the SAME column on both "
                    f"sides (key-matching), got {part!r}"
                )
            keys.append(a)
        elif re.fullmatch(r"`?\w+`?", part):
            keys.append(part.strip("`"))
        else:
            raise ValueError(
                f"ON clause accepts key columns or t.k = s.k "
                f"equalities, got {part!r}"
            )
    seen = set()
    keys = [k for k in keys if not (k in seen or seen.add(k))]
    return {"op": "merge", "path": path, "source": source, "keys": keys}


def parse(statement: str) -> dict:
    """Parse one DML statement into a dispatch dict (pure — no Spark,
    no filesystem — so the grammar is unit-testable in isolation)."""
    s = statement.strip().rstrip(";").strip()
    # one full scan up front so unterminated quotes / unbalanced
    # parens fail HERE, loudly — keyword searches below stop at their
    # first hit and would otherwise never reach the defect
    for _ in _scan_toplevel(s):
        pass
    up = s.upper()
    if up.startswith("DELETE"):
        f = _find_keyword(s, "FROM")
        if f < 0 or s[len("DELETE") : f].strip():
            raise ValueError("expected DELETE FROM `<table root>` ...")
        return _parse_delete(s[f + len("FROM") :])
    if up.startswith("UPDATE"):
        return _parse_update(s[len("UPDATE") :])
    if up.startswith("MERGE"):
        i = _find_keyword(s, "INTO")
        if i < 0 or s[len("MERGE") : i].strip():
            raise ValueError("expected MERGE INTO `<table root>` ...")
        return _parse_merge(s[i + len("INTO") :])
    raise ValueError(
        f"unsupported DML statement (DELETE/UPDATE/MERGE only): "
        f"{s[:40]!r}..."
    )


def sql(
    spark: SparkSession,
    statement: str,
    mode: str = "cow",
    app_id: str | None = None,
    txn_version: int | None = None,
) -> int:
    """Execute one DML statement against a txlog table; returns the
    committed version. ``mode``/``app_id``/``txn_version`` carry the
    library verbs' exact semantics (dv merge-on-read, exactly-once
    idempotence for MERGE). MERGE's USING source may be a registered
    view/table name or a parenthesized SELECT — either way it is
    resolved by ``spark.sql``, i.e. the full SQL language."""
    d = parse(statement)
    if d["op"] == "delete":
        return txlog.delete_where(
            spark, d["path"], d["predicate"], mode=mode
        )
    if d["op"] == "update":
        return txlog.update_where(
            spark, d["path"], d["set"], d["predicate"], mode=mode
        )
    src = d["source"]
    updates = spark.sql(
        src if src.startswith("(") else f"SELECT * FROM {src}"
    )
    return txlog.merge(
        spark,
        d["path"],
        updates,
        tuple(d["keys"]),
        mode=mode,
        app_id=app_id,
        txn_version=txn_version,
    )
