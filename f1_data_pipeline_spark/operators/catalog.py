"""A minimal table catalog for manifest tables: name → path, so query
code says `spark.sql("SELECT ... FROM curated")` instead of carrying
filesystem paths around.

The catalog is itself one numbered-JSON state directory using the same
atomic create-if-absent commit primitive as every manifest log
(`commit_numbered_json`): each change (create/drop/rename) writes the
next full catalog snapshot, so concurrent DDL races one conditional PUT
exactly like table commits, and `catalog_history` is free. Entries
store the path and an optional pinned ref (version number or tag name)
— a pinned entry always resolves to that snapshot, the
reproducible-dataset shape on top of `manifest_tag`.

`register_catalog_views` materializes every entry as a Spark temp view
over `read_manifest_table` (snapshot-isolated at registration time:
each view pins the version that was latest when registered, so one
analysis session sees one consistent snapshot per table; re-register to
advance). This is deliberately NOT a custom DataSource: views reuse the
native vectorized parquet scan and all manifest-level pruning happens
at registration/query-build time, so nothing moves into Python on the
data path.

Reference parity: the reference's table registry (config.py:21-141)
maps names to endpoints/loaders; this is the same idea for the engine's
own tables, with atomic evolution.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .sinks import (
    commit_numbered_json,
    numbered_json_versions,
    read_manifest,
    read_manifest_table,
    resolve_manifest_ref,
)

_CAT_DIR = "_catalog"


def _read_state(catalog_path: str) -> tuple[int, dict]:
    """(version, {name: {"path", "ref"}}) — version 0 = empty catalog."""
    import json

    d = os.path.join(catalog_path, _CAT_DIR)
    versions = numbered_json_versions(d)
    if not versions:
        return 0, {}
    with open(os.path.join(d, f"v{versions[-1]:08d}.json")) as fh:
        return versions[-1], json.load(fh)["tables"]


def _commit_state(catalog_path: str, version: int, tables: dict) -> None:
    commit_numbered_json(
        os.path.join(catalog_path, _CAT_DIR),
        version,
        {"tables": tables},
        what=f"catalog version ({catalog_path})",
    )


def catalog_create_table(
    catalog_path: str, name: str, table_path: str,
    ref: int | str | None = None,
) -> None:
    """Register `name` → `table_path` (optionally pinned to a version
    number or tag). The table must already have a committed manifest —
    a catalog that can point at nothing turns every typo into a
    confusing downstream failure."""
    if not name or not name.replace("_", "").isalnum():
        raise ValueError(f"invalid table name {name!r}")
    if read_manifest(table_path, ref) is None:
        raise FileNotFoundError(
            f"no manifest at {table_path} (ref {ref!r})"
        )
    v, tables = _read_state(catalog_path)
    if name in tables:
        raise ValueError(f"table {name!r} already exists in the catalog")
    tables = {**tables, name: {"path": table_path, "ref": ref}}
    _commit_state(catalog_path, v + 1, tables)


def catalog_drop_table(catalog_path: str, name: str) -> None:
    """Remove the NAME — the data is untouched (tables own their own
    lifecycle; vacuum/drop data through the table verbs)."""
    v, tables = _read_state(catalog_path)
    if name not in tables:
        raise FileNotFoundError(f"no table {name!r} in the catalog")
    tables = {k: e for k, e in tables.items() if k != name}
    _commit_state(catalog_path, v + 1, tables)


def catalog_tables(catalog_path: str) -> dict:
    """{name: {"path", "ref"}} at the current catalog version."""
    return _read_state(catalog_path)[1]


def catalog_read(
    spark: SparkSession, catalog_path: str, name: str, **kw
) -> DataFrame:
    """Read a cataloged table by name; keyword args pass through to
    `read_manifest_table` (predicates, partition_values, version —
    an explicit version overrides the catalog pin)."""
    tables = catalog_tables(catalog_path)
    if name not in tables:
        raise FileNotFoundError(f"no table {name!r} in the catalog")
    e = tables[name]
    if "version" not in kw and e.get("ref") is not None:
        kw["version"] = e["ref"]
    return read_manifest_table(spark, e["path"], **kw)


def register_catalog_views(
    spark: SparkSession,
    catalog_path: str,
    predicates_by_table: dict | None = None,
    names: list[str] | None = None,
) -> dict[str, int]:
    """Create one temp view per catalog entry, each pinned to the
    version that is latest (or the entry's pinned ref) RIGHT NOW —
    spark.sql queries then see one consistent snapshot per table until
    views are re-registered. Returns {name: pinned version}.

    `predicates_by_table` maps a table name to pruning predicates (the
    (col, op, value) tuples of `read_manifest_table`, or a SQL-ish
    string for `parse_predicates`): that table's view is then built
    over only the files surviving partition-transform pruning, file
    stats, and bloom sidecars — the path that makes a spark.sql WHERE
    engage the manifest read layer instead of listing every live file.
    The predicates are ALSO applied as a row filter inside the view, so
    a pruned view is exactly `SELECT * FROM t WHERE <predicates>` — a
    correct (not superset) relation under its name. `names` restricts
    registration to the listed tables.

    Consistency note: each view's version is resolved per table, not
    atomically with the catalog snapshot read — a commit landing
    between the two pins a version newer than that catalog snapshot
    implies. Views are still internally consistent per table."""
    pinned: dict[str, int] = {}
    for name, e in catalog_tables(catalog_path).items():
        if names is not None and name not in names:
            continue
        v = resolve_manifest_ref(e["path"], e.get("ref"))
        if v is None:
            from .sinks import manifest_versions

            v = manifest_versions(e["path"])[-1]
        preds = (predicates_by_table or {}).get(name)
        if isinstance(preds, str):
            from .sinks import parse_predicates

            preds = parse_predicates(preds)
        read_manifest_table(
            spark, e["path"], version=v, predicates=preds
        ).createOrReplaceTempView(name)
        pinned[name] = v
    return pinned


def catalog_sql(
    spark: SparkSession, catalog_path: str, sql: str
) -> DataFrame:
    """Run a spark.sql query against the catalog WITH manifest-level
    predicate pushdown: simple top-level WHERE conjuncts
    (`col op literal`, optionally qualified by the table name or its
    alias) are extracted from the SQL text and pushed into each
    referenced table's manifest read, so partition-transform pruning,
    per-file stats, and bloom sidecars all engage before Spark ever
    lists a file — the path `register_catalog_views` alone can't give a
    plain spark.sql (a temp view's file list is frozen at registration).

    Time travel in SQL (Delta/Iceberg syntax, both accepted):
    `FROM t [FOR] VERSION AS OF 3`, `FROM t [FOR] VERSION AS OF 'tag'`,
    `FROM t [FOR] TIMESTAMP AS OF '2024-03-05 12:00:00'` (latest commit
    at or before the instant; naive text is UTC). The clause pins that
    table's view for this query; two different pins on one table raise.

    Soundness rules (anything outside them just skips pushdown for the
    conjunct or table — results never change, only pruning weakens):
    conjuncts are used only from a SINGLE top-level WHERE in a query
    with no top-level set operators; OR-bearing or unparseable
    conjuncts are ignored; an unqualified column pushes only when
    exactly one referenced table carries it; a table referenced more
    than once (self-join) is never pruned. The pushed conjuncts stay in
    the SQL as row filters, so pruning is semantically invisible.

    Views for the referenced tables are (re)registered pruned for the
    duration of the call and restored to full unpruned views (same
    pinned versions) before returning — the returned DataFrame's plan
    is already bound, so the restore does not affect it."""
    tables = catalog_tables(catalog_path)
    sql, travel = _strip_time_travel(sql, tables)
    referenced = _referenced_tables(sql, tables)
    preds = _extract_pushdown_predicates(spark, sql, referenced, tables)
    pinned: dict[str, int] = {}
    for name in referenced:
        e = tables[name]
        v = travel.get(name)
        if v is None:
            v = resolve_manifest_ref(e["path"], e.get("ref"))
        if v is None:
            from .sinks import manifest_versions

            v = manifest_versions(e["path"])[-1]
        read_manifest_table(
            spark, e["path"], version=v, predicates=preds.get(name)
        ).createOrReplaceTempView(name)
        pinned[name] = v
    try:
        return spark.sql(sql)
    finally:
        # restore full (unpruned, un-time-traveled at the catalog's own
        # pin) views — the returned DataFrame's plan is already bound
        for name in referenced:
            e = tables[name]
            read_manifest_table(
                spark, e["path"],
                version=resolve_manifest_ref(e["path"], e.get("ref")),
            ).createOrReplaceTempView(name)


def _strip_time_travel(sql: str, tables: dict) -> tuple[str, dict]:
    """Remove `[FOR] VERSION|TIMESTAMP AS OF <literal>` clauses that
    follow a cataloged table name; return (clean sql, {table: version}).
    Version literals are ints or 'tag' strings; timestamps resolve to
    the newest commit at or before the instant (naive text = UTC)."""
    import datetime as _dt
    import re

    from .sinks import manifest_history

    out: dict[str, int] = {}

    def _resolve(name: str, kind: str, lit: str) -> int:
        e = tables[name]
        if kind.lower() == "version":
            if lit.startswith("'") and lit.endswith("'"):
                v = resolve_manifest_ref(e["path"], lit[1:-1])
            else:
                try:
                    v = int(lit)
                except ValueError:
                    raise ValueError(
                        f"VERSION AS OF needs an integer or 'tag', got {lit!r}"
                    ) from None
            if read_manifest(e["path"], v) is None:
                raise FileNotFoundError(
                    f"no version {v} of table {name!r} (vacuumed or never "
                    "committed)"
                )
            return v
        if not (lit.startswith("'") and lit.endswith("'")):
            raise ValueError(f"TIMESTAMP AS OF needs a quoted literal, got {lit!r}")
        ts = _dt.datetime.fromisoformat(lit[1:-1])
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        cut = ts.timestamp()
        cand = [
            h["version"] for h in manifest_history(e["path"])
            if h["committed_at"] <= cut
        ]
        if not cand:
            raise FileNotFoundError(
                f"table {name!r} has no commit at or before {lit}"
            )
        return max(cand)

    # longest names first so `events_v2` never half-matches `events`
    for name in sorted(tables, key=len, reverse=True):
        pat = re.compile(
            rf"\b{re.escape(name)}\s+(?:FOR\s+)?(VERSION|TIMESTAMP)\s+AS\s+OF"
            rf"\s+('[^']*'|\S+)",
            re.IGNORECASE,
        )
        while True:
            m = pat.search(_strip_sql_strings(sql))
            if not m:
                break
            kind = m.group(1)
            lit = sql[m.start(2):m.end(2)]  # original text (quotes intact)
            v = _resolve(name, kind, lit)
            if name in out and out[name] != v:
                raise ValueError(
                    f"table {name!r} is time-traveled to two different "
                    f"versions ({out[name]} and {v}) in one query"
                )
            out[name] = v
            sql = sql[: m.start()] + name + sql[m.end():]
    return sql, out


_SQL_KEYWORDS = {
    "where", "join", "on", "group", "order", "limit", "having", "union",
    "except", "intersect", "left", "right", "full", "inner", "outer",
    "cross", "as", "and", "or", "select", "from", "by", "using", "natural",
    "semi", "anti", "lateral", "window", "sort", "distribute", "cluster",
}


def _strip_sql_strings(sql: str) -> str:
    """The SQL with quoted literals blanked (lengths preserved) so word
    scans never match inside strings."""
    out, in_q = [], False
    for ch in sql:
        if ch == "'":
            in_q = not in_q
            out.append(ch)
        else:
            out.append(" " if in_q else ch)
    return "".join(out)


def _referenced_tables(sql: str, tables: dict) -> dict[str, list[str]]:
    """{catalog table name: [aliases]} for tables the SQL references
    (whole-word match outside string literals). A table mentioned N
    times appears with N alias slots (None-padded) so callers can
    detect self-joins."""
    import re

    s = _strip_sql_strings(sql)
    out: dict[str, list[str]] = {}
    for name in tables:
        for m in re.finditer(rf"\b{re.escape(name)}\b", s, re.IGNORECASE):
            # an alias follows: `FROM t x` / `JOIN t AS x` — next word
            # that is not a keyword
            tail = s[m.end():]
            am = re.match(r"\s+(?:[Aa][Ss]\s+)?([A-Za-z_][A-Za-z0-9_]*)", tail)
            alias = None
            if am and am.group(1).lower() not in _SQL_KEYWORDS:
                alias = am.group(1)
            # only count FROM/JOIN positions: the word before must be
            # FROM, JOIN, or a comma-separated relation list
            head = s[: m.start()].rstrip()
            prev = re.search(r"([A-Za-z_][A-Za-z0-9_]*|,)\s*$", head)
            pw = prev.group(1).lower() if prev else ""
            if pw in ("from", "join", ","):
                out.setdefault(name, []).append(alias)
    return out


def _extract_pushdown_predicates(
    spark: SparkSession, sql: str, referenced: dict, tables: dict
) -> dict[str, list[tuple]]:
    """Per-table (col, op, value) pruning predicates extracted from the
    query's single top-level WHERE (see `catalog_sql` soundness rules).
    Empty dict when the query shape rules pushdown out."""
    import re

    from .sinks import _split_top_and, parse_predicates

    s = _strip_sql_strings(sql)
    # reject top-level set operators (multiple SELECT blocks share depth 0)
    depth, wheres = 0, []
    for m in re.finditer(r"[()]|\b(where|union|except|intersect)\b", s, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            if tok.lower() == "where":
                wheres.append(m.end())
            else:
                return {}
    if len(wheres) != 1:
        return {}
    clause = sql[wheres[0]:]
    end = re.search(
        r"\b(group\s+by|order\s+by|limit|having|window)\b",
        _strip_sql_strings(clause),
        re.IGNORECASE,
    )
    if end:
        clause = clause[: end.start()]
    # schemas for unqualified-column resolution
    from .sinks import read_manifest

    schemas = {
        name: set(
            f["name"]
            for f in (read_manifest(tables[name]["path"]).get("schema") or {})
            .get("fields", [])
        )
        for name in referenced
    }
    alias_of = {}
    for name, aliases in referenced.items():
        for a in aliases:
            if a:
                alias_of[a.lower()] = name
        alias_of[name.lower()] = name
    out: dict[str, list[tuple]] = {}
    for conj in _split_top_and(clause):
        qual = None
        body = conj
        qm = re.match(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\.(.+)$", conj.strip())
        if qm and qm.group(1).lower() in alias_of:
            qual, body = alias_of[qm.group(1).lower()], qm.group(2)
        try:
            (col, op, v), = parse_predicates(body)
        except ValueError:
            continue
        if qual is None:
            owners = [n for n, cols in schemas.items() if col in cols]
            if len(owners) != 1:
                continue
            qual = owners[0]
        if col not in schemas.get(qual, ()):  # alias-qualified: verify
            continue
        if len(referenced.get(qual, ())) != 1:
            continue  # self-join: one shared view can't be pruned per-side
        out.setdefault(qual, []).append((col, op, v))
    return out
