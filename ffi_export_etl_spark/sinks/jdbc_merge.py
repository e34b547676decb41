"""Upsert (MERGE) sink over JDBC with FK-ordered loading and count-delta
auditing — the Spark re-expression of the reference's load path
(/root/reference/parser/xml.py:559-707; SURVEY.md section 3.3).

The reference builds one giant literal-VALUES ``MERGE INTO`` string per
table (row-at-a-time, the slowest possible sink) and recurses through FK
references with a broken memo (quirk Q4: cycles would never terminate).
Here:

- rows travel via ``df.write.jdbc(mode="append")`` into a staging table —
  parallel, batched, parameterized (no literal SQL, no escaping games,
  numPartitions controls target-DB fan-in);
- ONE server-side set-based ``MERGE staging -> target ... WHEN NOT MATCHED
  THEN INSERT`` keyed on the target's primary key replaces row literals
  (insert-if-absent semantics, exactly the reference's WHEN NOT MATCHED
  clause, xml.py:652-663);
- load order is a REAL topological sort of the FK graph (driver-side
  Kahn's algorithm over information_schema; cycles reported, not hung);
- before/after COUNT(*) per table feeds an UpdateLog append (xml.py:
  665-697), and failures roll back per table, collected for the caller
  (xml.py:699-707) so one bad table never blocks the rest.

No live DB ships in this environment, so executions go through a thin
``Executor`` protocol; tests drive the SQL generation + ordering logic
with a fake, and the same statements run against SQL Server / Postgres
via any DBAPI connection in production.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from dataclasses import dataclass, field


@dataclass
class TableMeta:
    """Catalog facts for one target table (reference parser/server.py:
    12-38 reflects these via SQLAlchemy; we read information_schema)."""

    name: str
    primary_key: list[str]
    # column -> list of (referenced_table, referenced_column)
    foreign_keys: dict[str, list[tuple[str, str]]] = field(default_factory=dict)


# SQL used to build TableMeta from a live warehouse over JDBC; kept here so
# the catalog scan (SURVEY S6) is part of the sink's public surface.
PK_QUERY = """
SELECT kcu.table_name, kcu.column_name, kcu.ordinal_position
FROM information_schema.table_constraints tc
JOIN information_schema.key_column_usage kcu
  ON tc.constraint_name = kcu.constraint_name
 AND tc.table_schema = kcu.table_schema
WHERE tc.constraint_type = 'PRIMARY KEY'
"""

FK_QUERY = """
SELECT kcu.table_name, kcu.column_name,
       ccu.table_name AS ref_table, ccu.column_name AS ref_column
FROM information_schema.table_constraints tc
JOIN information_schema.key_column_usage kcu
  ON tc.constraint_name = kcu.constraint_name
 AND tc.table_schema = kcu.table_schema
JOIN information_schema.constraint_column_usage ccu
  ON tc.constraint_name = ccu.constraint_name
WHERE tc.constraint_type = 'FOREIGN KEY'
"""


def topological_load_order(
    tables: Sequence[str], metas: Mapping[str, TableMeta]
) -> list[str]:
    """FK-respecting load order (referenced tables first) via Kahn's
    algorithm. Fixes quirk Q4: the reference's recursion memo never fires,
    so FK cycles recurse forever; here cycles raise with the cycle set."""
    wanted = set(tables)
    deps: dict[str, set[str]] = {t: set() for t in wanted}
    for t in wanted:
        meta = metas.get(t)
        if not meta:
            continue
        for refs in meta.foreign_keys.values():
            for ref_table, _ in refs:
                if ref_table in wanted and ref_table != t:
                    deps[t].add(ref_table)
    order: list[str] = []
    ready = sorted(t for t, d in deps.items() if not d)
    pending = {t: set(d) for t, d in deps.items() if d}
    while ready:
        t = ready.pop(0)
        order.append(t)
        newly = []
        for u in list(pending):
            pending[u].discard(t)
            if not pending[u]:
                newly.append(u)
                del pending[u]
        ready.extend(sorted(newly))
        ready.sort()
    if pending:
        raise ValueError(f"FK cycle among tables: {sorted(pending)}")
    return order


def merge_sql(
    target: str,
    staging: str,
    columns: Sequence[str],
    primary_key: Sequence[str],
    dialect: str = "tsql",
) -> str:
    """Set-based insert-if-absent statement, staging -> target.

    tsql: MERGE ... WHEN NOT MATCHED THEN INSERT (the reference's clause,
    xml.py:652-663, minus the literal VALUES). postgres: INSERT ... ON
    CONFLICT DO NOTHING (same semantics, native syntax).
    """
    if not primary_key:
        raise ValueError(f"{target}: MERGE requires a primary key")
    collist = ", ".join(columns)
    if dialect == "tsql":
        on = " AND ".join(f"t.{c} = s.{c}" for c in primary_key)
        values = ", ".join(f"s.{c}" for c in columns)
        return (
            f"MERGE INTO {target} AS t USING {staging} AS s ON ({on}) "
            f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({values});"
        )
    if dialect == "postgres":
        pklist = ", ".join(primary_key)
        # WHERE true disambiguates the upsert clause after a SELECT (a
        # sqlite parser requirement, harmless on postgres)
        return (
            f"INSERT INTO {target} ({collist}) "
            f"SELECT {collist} FROM {staging} WHERE true "
            f"ON CONFLICT ({pklist}) DO NOTHING;"
        )
    raise ValueError(f"unknown dialect: {dialect}")


@dataclass
class MergeResult:
    table: str
    before: int
    after: int
    failed: bool = False
    error: str | None = None

    @property
    def delta(self) -> int:
        return self.after - self.before


class MergeLoader:
    """Orchestrates FK-ordered staged MERGE loads with auditing.

    ``execute(sql) -> None`` and ``scalar(sql) -> int`` abstract the DB
    connection; ``write_staging(table_name, df)`` abstracts the parallel
    JDBC append (in production: ``df.write.jdbc(url, staging,
    mode='append', properties=...)``).
    """

    def __init__(
        self,
        metas: Mapping[str, TableMeta],
        execute: Callable[[str], None],
        scalar: Callable[[str], int],
        write_staging: Callable[[str, object], None],
        dialect: str = "tsql",
    ):
        self.metas = metas
        self.execute = execute
        self.scalar = scalar
        self.write_staging = write_staging
        self.dialect = dialect
        self.results: list[MergeResult] = []
        self.insert_failed: list[str] = []

    def load(self, frames: Mapping[str, object], columns: Mapping[str, Sequence[str]]) -> list[MergeResult]:
        order = topological_load_order(list(frames), self.metas)
        for table in order:
            meta = self.metas[table]
            staging = f"staging_{table}"
            cols = list(columns[table])
            try:
                before = self.scalar(f"SELECT COUNT(*) FROM {table}")
                self.write_staging(staging, frames[table])
                self.execute("BEGIN TRANSACTION;")
                self.execute(
                    merge_sql(table, staging, cols, meta.primary_key, self.dialect)
                )
                self.execute("COMMIT;")
                after = self.scalar(f"SELECT COUNT(*) FROM {table}")
                self.results.append(MergeResult(table, before, after))
            except Exception as exc:  # per-table isolation (xml.py:699-707)
                try:
                    self.execute("ROLLBACK;")
                except Exception:
                    pass  # failure before BEGIN -> nothing to roll back
                self.insert_failed.append(table)
                self.results.append(
                    MergeResult(table, 0, 0, failed=True, error=str(exc))
                )
        return self.results

    def audit_rows(self, user: str, now: str) -> list[dict]:
        """UpdateLog rows for non-zero deltas (xml.py:681-695)."""
        return [
            {
                "User": user,
                "Time": now,
                "Table": r.table,
                "ChangeType": "INSERT" if r.delta >= 0 else "DELETE",
                "Changes": abs(r.delta),
            }
            for r in self.results
            if not r.failed and r.delta != 0
        ]
