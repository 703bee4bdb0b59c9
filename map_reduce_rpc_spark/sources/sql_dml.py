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
    VACUUM `<table root>` [RETAIN <n> HOURS] [DRY RUN]
    OPTIMIZE `<table root>` [WHERE <partcol> = <literal> [AND ...]]
        [ZORDER BY (<col> [, <col>]...)]
    RESTORE [TABLE] `<table root>` TO VERSION AS OF <n>
                                 | TO TIMESTAMP AS OF <unix | 'ISO'>
    DESCRIBE HISTORY `<table root>`
    CLONE `<src root>` TO `<dst root>` [VERSION AS OF <n>]

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


_NUM = re.compile(r"[+-]?\d+(\.\d+)?$")


def _literal(tok: str):
    """One SQL literal: integer, float, 'string' (with '' escapes),
    TRUE/FALSE/NULL. Loud error otherwise — partition values in
    maintenance verbs are literals by contract, never expressions."""
    t = tok.strip()
    if t.startswith("'") and t.endswith("'") and len(t) >= 2:
        return t[1:-1].replace("''", "'")
    u = t.upper()
    if u == "TRUE":
        return True
    if u == "FALSE":
        return False
    if u == "NULL":
        return None
    if _NUM.fullmatch(t):
        return float(t) if "." in t else int(t)
    raise ValueError(f"expected a literal value, got {tok!r}")


def _parse_vacuum(body: str) -> dict:
    path, rest = _table_path(body)
    out: dict = {"op": "vacuum", "path": path}
    m = re.fullmatch(
        r"(?is)\s*(RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?\s*(DRY\s+RUN)?\s*",
        rest,
    )
    if not m:
        raise ValueError(
            f"VACUUM accepts only [RETAIN <n> HOURS] [DRY RUN], got "
            f"{rest.strip()!r}"
        )
    if m.group(2):
        out["retain_hours"] = float(m.group(2))
    if m.group(3):
        out["dry_run"] = True
    return out


def _parse_optimize(body: str) -> dict:
    path, rest = _table_path(body)
    out: dict = {"op": "optimize", "path": path}
    w = _find_keyword(rest, "WHERE")
    z = _find_keyword(rest, "ZORDER")
    if w >= 0:
        pred_end = z if z > w else len(rest)
        # WHERE here is the PARTITION-scoped optimize: a literal
        # equality chain naming partition columns, mapped to
        # optimize(partitions=...) — planning-time dir selection, not
        # row filtering, so expressions are rejected loudly
        parts: dict = {}
        for chunk in re.split(
            r"(?i)\bAND\b", rest[w + len("WHERE") : pred_end]
        ):
            eq = next(
                (i for i, c in _scan_toplevel(chunk) if c == "="), -1
            )
            if eq <= 0:
                raise ValueError(
                    "OPTIMIZE ... WHERE accepts only `col = literal "
                    f"[AND ...]` partition equalities, got {chunk.strip()!r}"
                )
            parts[chunk[:eq].strip().strip("`")] = _literal(chunk[eq + 1 :])
        out["partitions"] = parts
        rest = rest[:w] + (rest[pred_end:] if z > w else "")
        z = _find_keyword(rest, "ZORDER")
    if z >= 0:
        head, zrest = rest[:z], rest[z + len("ZORDER") :]
        if head.strip():
            raise ValueError(
                f"unexpected tokens before ZORDER: {head.strip()!r}"
            )
        b = _find_keyword(zrest, "BY")
        if b < 0 or zrest[:b].strip():
            raise ValueError("expected ZORDER BY (col, ...)")
        cols_sql = zrest[b + len("BY") :].strip()
        if cols_sql.startswith("(") and cols_sql.endswith(")"):
            cols_sql = cols_sql[1:-1]
        cols = tuple(
            c.strip().strip("`")
            for c in _split_toplevel(cols_sql, ",")
            if c.strip()
        )
        if not cols or not all(
            re.fullmatch(r"\w+", c) for c in cols
        ):
            raise ValueError(
                f"ZORDER BY needs plain column names, got {cols_sql!r}"
            )
        out["zorder_by"] = cols
    elif rest.strip():
        raise ValueError(
            f"unexpected tokens after OPTIMIZE target: {rest.strip()!r}"
        )
    return out


def _parse_restore(body: str) -> dict:
    t = _find_keyword(body, "TABLE")
    if t >= 0 and not body[:t].strip():
        body = body[t + len("TABLE") :]
    path, rest = _table_path(body)
    m = re.fullmatch(
        r"(?is)\s*TO\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+(.+?)\s*", rest
    )
    if not m:
        raise ValueError(
            "expected RESTORE [TABLE] `<root>` TO VERSION AS OF <n> "
            "| TO TIMESTAMP AS OF <ts>"
        )
    kind, val = m.group(1).upper(), m.group(2).strip()
    if kind == "VERSION":
        if not re.fullmatch(r"\d+", val):
            raise ValueError(f"VERSION AS OF needs an integer, got {val!r}")
        return {"op": "restore", "path": path, "version": int(val)}
    return {"op": "restore", "path": path, "timestamp": _literal(val)}


def _parse_clone(body: str) -> dict:
    src, rest = _table_path(body)
    t = _find_keyword(rest, "TO")
    if t < 0 or rest[:t].strip():
        raise ValueError(
            "expected CLONE `<src root>` TO `<dst root>` "
            "[VERSION AS OF <n>]"
        )
    dst, rest = _table_path(rest[t + len("TO") :])
    out: dict = {"op": "clone", "path": src, "dst": dst}
    if rest.strip():
        m = re.fullmatch(r"(?is)\s*VERSION\s+AS\s+OF\s+(\d+)\s*", rest)
        if not m:
            raise ValueError(
                f"unexpected tokens after CLONE target: {rest.strip()!r}"
            )
        out["version"] = int(m.group(1))
    return out


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
    if up.startswith("VACUUM"):
        return _parse_vacuum(s[len("VACUUM") :])
    if up.startswith("CLONE"):
        return _parse_clone(s[len("CLONE") :])
    if up.startswith("OPTIMIZE"):
        return _parse_optimize(s[len("OPTIMIZE") :])
    if up.startswith("RESTORE"):
        return _parse_restore(s[len("RESTORE") :])
    if re.match(r"(?is)DESCRIBE\s+HISTORY\b", s):
        path, rest = _table_path(
            s[len("DESCRIBE") :].lstrip()[len("HISTORY") :]
        )
        if rest.strip():
            raise ValueError(
                f"unexpected tokens after DESCRIBE HISTORY: {rest.strip()!r}"
            )
        return {"op": "history", "path": path}
    raise ValueError(
        f"unsupported statement (DELETE/UPDATE/MERGE/VACUUM/OPTIMIZE/"
        f"RESTORE/DESCRIBE HISTORY/CLONE only): {s[:40]!r}..."
    )


def sql(
    spark: SparkSession,
    statement: str,
    mode: str = "cow",
    app_id: str | None = None,
    txn_version: int | None = None,
):
    """Execute one statement against a txlog table. Returns what the
    dispatched library verb returns: the committed version (int) for
    DELETE/UPDATE/MERGE/OPTIMIZE/RESTORE, the removed-path list for
    VACUUM, a DataFrame for DESCRIBE HISTORY.
    ``mode``/``app_id``/``txn_version`` carry the library verbs'
    exact semantics (dv merge-on-read, exactly-once idempotence for
    MERGE); they apply to the three DML verbs only. MERGE's USING
    source may be a registered view/table name or a parenthesized
    SELECT — either way it is resolved by ``spark.sql``, i.e. the
    full SQL language. Maintenance grammar (Delta's SQL forms):

        VACUUM `<root>` [RETAIN <n> HOURS] [DRY RUN]
        OPTIMIZE `<root>` [WHERE <partcol> = <literal> [AND ...]]
            [ZORDER BY (col, ...)]
        RESTORE [TABLE] `<root>` TO VERSION AS OF <n>
                                | TO TIMESTAMP AS OF <unix | 'ISO'>
        DESCRIBE HISTORY `<root>`
    """
    d = parse(statement)
    if d["op"] == "vacuum":
        return txlog.vacuum(
            d["path"],
            retain_hours=d.get("retain_hours"),
            dry_run=d.get("dry_run", False),
        )
    if d["op"] == "optimize":
        return txlog.optimize(
            spark,
            d["path"],
            zorder_by=d.get("zorder_by", ()),
            partitions=d.get("partitions"),
        )
    if d["op"] == "restore":
        if "version" in d:
            v = d["version"]
        else:
            ts = d["timestamp"]
            if isinstance(ts, str):
                import datetime

                ts = datetime.datetime.fromisoformat(ts).timestamp()
            v = txlog.version_at_timestamp(d["path"], float(ts))
        return txlog.restore(spark, d["path"], v)
    if d["op"] == "history":
        return txlog.history(spark, d["path"])
    if d["op"] == "clone":
        return txlog.clone_table(
            spark, d["path"], d["dst"], version=d.get("version")
        )
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
