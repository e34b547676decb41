"""TableMap/FieldMap-driven load-time projection (SURVEY.md section 1.3
phase 3).

The reference reads two small CSVs at load time — a table-rename map and a
per-table column whitelist+rename map (/root/reference/parser/xml.py:
571-584; extra/TableMap.csv, extra/FieldMap.csv) — then projects each wide
table down to the mapped columns, tolerating columns missing from the XML
(select_fields intersection, parser/xml.py:582-584, 606-608).

Here the maps are plain driver-side dicts (they are tiny config, not
data) applied as one ``select`` with aliases; mapped columns missing from
the frame become typed NULLs (the reference's NA backfill).

CSV formats (ours, not copied from the reference):
  table map:  source_table,target_table
  field map:  target_table,source_field,target_field
"""

from __future__ import annotations

import csv
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class LoadMaps:
    """table_map: source table -> warehouse table;
    field_maps: warehouse table -> [(source col, target col), ...]."""

    table_map: dict[str, str] = field(default_factory=dict)
    field_maps: dict[str, list[tuple[str, str]]] = field(default_factory=dict)

    @classmethod
    def from_csv(cls, table_map_path: str, field_map_path: str) -> "LoadMaps":
        maps = cls()
        with open(table_map_path, newline="") as f:
            for row in csv.DictReader(f):
                maps.table_map[row["source_table"].strip()] = row[
                    "target_table"
                ].strip()
        with open(field_map_path, newline="") as f:
            for row in csv.DictReader(f):
                maps.field_maps.setdefault(row["target_table"].strip(), []).append(
                    (row["source_field"].strip(), row["target_field"].strip())
                )
        return maps

    def target_for(self, source_table: str) -> str | None:
        return self.table_map.get(source_table)

    def project(
        self, df: DataFrame, target_table: str, keep_cols: tuple[str, ...] = ()
    ) -> DataFrame:
        """Whitelist+rename projection for one warehouse table; mapped
        columns absent from ``df`` come back as NULL strings.
        ``keep_cols`` pass through unmapped (bookkeeping columns like the
        batch loader's file sequence)."""
        pairs = self.field_maps.get(target_table)
        if not pairs:
            return df
        cols = []
        present = set(df.columns)
        for src, dst in pairs:
            if src in present:
                cols.append(F.col(src).alias(dst))
            else:
                cols.append(F.lit(None).cast("string").alias(dst))
        for c in keep_cols:
            if c in present:
                cols.append(F.col(c))
        return df.select(*cols)
