"""FieldMap/TableMap-driven load projection (SURVEY section 1.3 phase 3,
S4): CSV-configured whitelist+rename applied at load time, missing
columns backfilled as NULLs, wired through the batch driver."""

from __future__ import annotations

import os

from ffi_export_etl_spark.plans.batch_driver import process_exports
from ffi_export_etl_spark.plans.fieldmap import LoadMaps
from tests.ffi_fixture import write_export_xml


def _write_maps(dirpath) -> LoadMaps:
    tm = dirpath / "table_map.csv"
    fm = dirpath / "field_map.csv"
    tm.write_text(
        "source_table,target_table\n"
        "MacroPlot,Plot\n"
        "SampleEvent,Event\n"
    )
    fm.write_text(
        "target_table,source_field,target_field\n"
        "Plot,PlotID,PlotID\n"
        "Plot,MacroPlot_Elevation,Elevation\n"
        "Plot,MacroPlot_Azimuth,Azimuth\n"
        "Event,EventID,EventID\n"
        "Event,SampleEvent_Who,Who\n"
        "Event,VisitID,VisitID\n"
    )
    return LoadMaps.from_csv(str(tm), str(fm))


def test_loadmaps_projection(spark, tmp_path):
    maps = _write_maps(tmp_path)
    df = spark.createDataFrame(
        [("P1", "2100", "extra")],
        ["PlotID", "MacroPlot_Elevation", "Unmapped"],
    )
    out = maps.project(df, "Plot")
    # mapped+renamed; whitelist drops Unmapped; absent Azimuth -> NULL
    assert out.columns == ["PlotID", "Elevation", "Azimuth"]
    row = out.collect()[0]
    assert (row["PlotID"], row["Elevation"], row["Azimuth"]) == ("P1", "2100", None)


def test_batch_driver_with_maps(spark, tmp_path):
    exports = tmp_path / "exports"
    exports.mkdir()
    write_export_xml(str(exports / "export1.xml"))
    maps = _write_maps(tmp_path)
    warehouse = str(tmp_path / "warehouse")

    results = process_exports(spark, str(exports / "*.xml"), warehouse, maps)
    assert results
    plot = spark.read.parquet(os.path.join(warehouse, "Plot"))
    assert sorted(plot.columns) == ["Azimuth", "Elevation", "PlotID"]
    event = spark.read.parquet(os.path.join(warehouse, "Event"))
    assert set(event.columns) == {"EventID", "Who", "VisitID"}
    assert event.count() == 2
