"""ffi_export_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo NMFWRI/FFI-Export-ETL (a single-process
pandas XML->SQL Server ETL; see SURVEY.md), extended with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication, similarity
search, text analysis, multimodal column plumbing, and structured streaming.

Design stance (SURVEY.md section 4.2):
- declare logical plans with the DataFrame/SQL API; Catalyst + Tungsten pick
  the physical strategy (pushdown, pruning, broadcast, AQE skew handling);
- native Column expressions first, Arrow-batched pandas UDFs only where the
  built-ins genuinely cannot express the semantics;
- no driver-side collect() loops in the data path.
"""

__version__ = "0.1.0"
