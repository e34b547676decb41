"""Named-DataFrame registry: the engine's dataset abstraction.

The reference keeps ``FFIFile._data_map: dict[str, pandas.DataFrame]`` with
``ffi['MacroPlot']`` access and type-checked assignment
(/root/reference/parser/xml.py:43,63-80,101-124). Here the same contract is
a thin registry over lazy Spark DataFrames; every table is additionally
published as a temp view so it is addressable from ``spark.sql`` too.
"""

from __future__ import annotations

from collections.abc import Iterator, Mapping

from pyspark.sql import DataFrame, SparkSession


class TableRegistry(Mapping[str, DataFrame]):
    """dict-like collection of named DataFrames + temp-view publication."""

    def __init__(self, spark: SparkSession, tables: Mapping[str, DataFrame] | None = None):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}
        for name, df in (tables or {}).items():
            self[name] = df

    def __getitem__(self, name: str) -> DataFrame:
        return self._tables[name]

    def __setitem__(self, name: str, df: DataFrame) -> None:
        if not isinstance(df, DataFrame):
            raise TypeError(f"registry values must be DataFrames, got {type(df)!r}")
        self._tables[name] = df
        df.createOrReplaceTempView(name)

    def __delitem__(self, name: str) -> None:
        del self._tables[name]
        self.spark.catalog.dropTempView(name)

    def __contains__(self, name: object) -> bool:
        return name in self._tables

    def __iter__(self) -> Iterator[str]:
        return iter(self._tables)

    def __len__(self) -> int:
        return len(self._tables)

    def drop(self, *names: str) -> None:
        """Drop tables that exist; silently skip the rest (reference drops
        EAV base tables after pivot, parser/xml.py:741-744)."""
        for n in names:
            if n in self._tables:
                del self[n]
