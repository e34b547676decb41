"""Golden tests for the FFI export pipeline (XML -> EAV -> wide tables),
mirroring the reference's implicit assertions (SURVEY.md section 5.2):
pivot-key uniqueness, keep-first dedup, ident synthesis, unit fan-out,
team combination, VisitID branches.
"""

from __future__ import annotations

import pytest

from ffi_export_etl_spark.plans.ffi_pipeline import FFIPipeline
from ffi_export_etl_spark.sources.xml import discover_tags, read_ffi_export
from tests.ffi_fixture import build_export_xml, write_export_xml


@pytest.fixture(scope="module")
def export_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("ffi") / "export1.xml"
    return write_export_xml(str(p))


@pytest.fixture(scope="module")
def pipeline(spark, export_path):
    tables = read_ffi_export(spark, export_path)
    pipe = FFIPipeline(spark, tables)
    pipe.run()
    return pipe


def test_discover_tags(export_path):
    ns, tags = discover_tags(export_path)
    assert ns == "http://tempuri.org/FFIExport.xsd"
    assert "MacroPlot" in tags and "AttributeData" in tags
    assert len(tags) == len(set(tags))


def test_ingest_strings_and_guid_upper(spark, export_path):
    tables = read_ffi_export(spark, export_path)
    mp = tables["MacroPlot"]
    assert dict(mp.dtypes)["MacroPlot_GUID"] == "string"
    guids = {r[0] for r in mp.select("MacroPlot_GUID").collect()}
    assert guids == {"MP-0001", "MP-0002", "MP-0003"}


def test_single_pass_read(spark, export_path, monkeypatch):
    # N discovered tags must cost exactly ONE spark XML load (the root-tag
    # parse is cached; per-tag frames are explodes of it)
    import pyspark.sql.readwriter as rw

    calls = []
    orig = rw.DataFrameReader.load

    def counting_load(self, *a, **kw):
        calls.append(a)
        return orig(self, *a, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "load", counting_load)
    tables = read_ffi_export(spark, export_path)
    assert len(tables) > 5
    assert len(calls) == 1


def test_explicit_tags_skip_full_discovery(spark, export_path, monkeypatch):
    # passing tags= must not stream every file through discover_structure;
    # only the first file's root element is read (discover_root)
    import ffi_export_etl_spark.sources.xml as xmlmod

    def boom(path):
        raise AssertionError("full discovery must be skipped with tags=")

    monkeypatch.setattr(xmlmod, "discover_structure", boom)
    tables = read_ffi_export(spark, export_path, tags=["MacroPlot"])
    assert set(tables) == {"MacroPlot"}
    assert tables["MacroPlot"].count() == 3


def test_tagcol_variant_equals_production_reader(spark, export_path, tmp_path):
    """read_ffi_export_tagcol (the r9 A/B layout: one explode into a
    (tag, row_json) long cache) must produce IDENTICAL tables to the
    production reader — single file and multi-file (file-scoped *_ID
    suffixes included)."""
    from ffi_export_etl_spark.sources.xml import read_ffi_export_tagcol

    def snap(tables):
        def nkey(row):
            return tuple((v is None, v) for v in row)

        return {
            t: (sorted(df.columns),
                sorted(map(tuple,
                           df.select(*sorted(df.columns)).collect()),
                       key=nkey))
            for t, df in tables.items()
        }

    a = snap(read_ffi_export(spark, export_path))
    b = snap(read_ffi_export_tagcol(spark, export_path))
    assert a == b

    from tests.ffi_fixture import write_export_xml as _w

    multi_dir = tmp_path / "multi"
    multi_dir.mkdir()
    for i in range(3):
        _w(str(multi_dir / f"e{i}.xml"), uniq=f"m{i}")
    glob_pat = str(multi_dir / "*.xml")
    a2 = snap(read_ffi_export(spark, glob_pat))
    b2 = snap(read_ffi_export_tagcol(spark, glob_pat))
    assert a2 == b2


def test_plot_dedup_and_plot_id(pipeline):
    rows = pipeline.tables["MacroPlot"].collect()
    # MP2 deduped (same PlotID, later DateIn), MP3 dropped (null DateIn)
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["PlotID"] == "NORTHPLOT1"
    assert r["MacroPlot_GUID"] == "MP-0001"
    assert r["AdminUnit"] == "North Rim Unit"


def test_event_ids(pipeline):
    se = pipeline.tables["SampleEvent"]
    ids = {r["EventID"] for r in se.select("EventID").collect()}
    # orphan event dropped; -06:00 offset rendered in UTC stays same day
    assert ids == {"NORTHPLOT120230515", "NORTHPLOT120240601"}


def test_trees_species_and_stemnum(pipeline):
    trees = pipeline.tables["Trees_Individuals_Attribute"]
    rows = {r["AttributeData_DataRow_GUID"]: r.asDict() for r in trees.collect()}
    assert len(rows) == 3
    assert rows["DR-0001"]["Species"] == "PIPO"
    assert rows["DR-0003"]["Species"] == "ABCO"
    # same (event, species, tag) -> StemNum sequence by DataRow_GUID
    assert rows["DR-0001"]["StemNum"] == 1
    assert rows["DR-0002"]["StemNum"] == 2
    assert rows["DR-0003"]["StemNum"] == 1
    assert "Method_UnitSystem" not in trees.columns  # single-unit drop


def test_witness_tree_dedup(pipeline):
    wit = pipeline.tables["PlotInfoWitTreesComments3_Attribute"]
    rows = wit.collect()
    assert len(rows) == 1  # one per event, min WitDBH kept
    r = rows[0].asDict()
    assert r["WitDBH"] == "12"
    # tag numbers are assigned BEFORE the min-DBH dedup (reference order:
    # cumcount then sort+keep-first), so the kept row carries tag 2
    assert r["WitTreeTagNo"] == 2


def test_unit_system_fanout(pipeline):
    english = pipeline.tables["SurfaceFuels_Fine_Attribute"]
    metric = pipeline.tables["SurfaceFuels_Fine_Metric_Attribute"]
    assert [r["Hits"] for r in english.select("Hits").collect()] == ["7"]
    assert [r["Hits"] for r in metric.select("Hits").collect()] == ["18"]
    # multi-unit attribute tables retain the unit column (reference quirk)
    assert "Method_UnitSystem" in english.columns


def test_transect_derivation(pipeline):
    t = pipeline.tables["Transect"].collect()
    assert len(t) == 1
    r = t[0].asDict()
    assert (r["Transect"], r["Azimuth"], r["Slope"], r["Length"]) == (
        "T1", "120", "10", 75,
    )


def test_team_combination(pipeline):
    se = pipeline.tables["SampleEvent"]
    by_event = {r["EventID"]: r.asDict() for r in se.collect()}
    e1 = by_event["NORTHPLOT120230515"]
    # Duff field "Gil Perez, Ana Diaz" (comma) + Fine field space-split
    assert e1["FuelsObserver"] == "Ana, Ana Diaz, Chen, Diaz, Gil Perez, Mo"
    assert e1["FuelsRecorder"] == "Ana, Chen, Diaz, Mo"
    assert e1["TreeObserver"] == "Gil Perez, Rosa Lee"
    assert e1["TreeRecorder"] == "Lee, Rosa"  # space-split of "Rosa Lee"
    # event with no sample rows -> empty strings
    e4 = by_event["NORTHPLOT120240601"]
    assert e4["FuelsObserver"] == ""


def test_visit_id(pipeline):
    pv = pipeline.tables["ProjectVisit"].collect()
    assert len(pv) == 1
    assert pv[0]["VisitID"] == "FireProject1202301FireImm"
    se = pipeline.tables["SampleEvent"]
    visits = {r["EventID"]: r["VisitID"] for r in se.collect()}
    assert visits["NORTHPLOT120230515"] == "FireProject1202301FireImm"
    assert visits["NORTHPLOT120240601"] is None


def test_sample_guid_generated(pipeline):
    s = pipeline.tables["Trees_Individuals_Sample"].collect()
    assert len(s) == 1
    guid = s[0]["SampleData_Original_GUID"]
    # Q3 fixed: real uppercase UUID, not NaN
    assert guid is not None and guid == guid.upper() and len(guid) == 36


def test_eav_bases_dropped(pipeline):
    for t in ("SampleData", "SampleRow", "AttributeRow", "AttributeData"):
        assert t not in pipeline.tables


def test_pivot_uniqueness_assertion(spark):
    from ffi_export_etl_spark.operators.pivot import (
        DuplicatePivotKeyError,
        assert_unique_pivot_keys,
        eav_pivot,
    )

    df = spark.createDataFrame(
        [("e1", "f1", "v1"), ("e1", "f1", "v2"), ("e1", "f2", "v3")],
        ["k", "f", "v"],
    )
    with pytest.raises(DuplicatePivotKeyError):
        assert_unique_pivot_keys(df, ["k"], "f")
    wide = eav_pivot(
        df.filter("v <> 'v2'"), ["k"], "f", "v", field_names=["f1", "f2"],
        strict=True,
    )
    row = wide.collect()[0]
    assert (row["f1"], row["f2"]) == ("v1", "v3")


def test_glob_read_unions_files(spark, tmp_path):
    # a glob of exports reads as ONE parse; per-tag rows union across
    # files and tags absent from one file contribute no rows for it
    from tests.ffi_fixture import build_export_xml

    d = tmp_path / "many"
    d.mkdir()
    (d / "e1.xml").write_text(build_export_xml())
    (d / "e2.xml").write_text(
        build_export_xml().replace(
            "<MacroPlot_GUID>mp-0001</MacroPlot_GUID>",
            "<MacroPlot_GUID>mp-9001</MacroPlot_GUID>",
        )
    )
    tables = read_ffi_export(spark, str(d / "*.xml"))
    guids = {r[0] for r in tables["MacroPlot"].select("MacroPlot_GUID").collect()}
    assert "MP-9001" in guids and "MP-0002" in guids
    # both files contribute full row sets
    assert tables["MacroPlot"].count() == 6


def test_sliced_reader_matches_per_file_reads(spark, tmp_path):
    """r12 (judge item 3): read_ffi_export_sliced parses a WAVE of
    files once and slices per-file table dicts back out; each file's
    tables/columns/rows must equal what a single-file read_ffi_export
    produces (only *_ID values differ — they carry the multi-read
    file-scope suffix, constant within a file)."""
    from ffi_export_etl_spark.sources.xml import (
        discover_columns,
        read_ffi_export_sliced,
        sliceable_paths,
    )

    paths = []
    for i in range(2):
        p = str(tmp_path / f"e{i}.xml")
        write_export_xml(p, uniq=f"f{i}")
        paths.append(p)
    assert sliceable_paths(paths)
    colsets = {}
    root = None
    for p in paths:
        _ns, root, cols = discover_columns(p)
        colsets[p] = cols
    sliced, _slices = read_ffi_export_sliced(spark, paths, root, colsets)

    def _strip(rows, cols):
        out = []
        for r in rows:
            vals = [
                (r[c].split("#")[0] if c.endswith("_ID")
                 and isinstance(r[c], str) else r[c])
                for c in cols
            ]
            out.append(str(tuple(vals)))
        return sorted(out)

    for p in paths:
        single = read_ffi_export(spark, p)
        assert set(single) == set(sliced[p])
        for t in single:
            a, b = single[t], sliced[p][t]
            assert a.columns == b.columns, (p, t)
            assert _strip(a.collect(), a.columns) == _strip(
                b.collect(), b.columns
            ), (p, t)


def test_sliced_reader_isolates_heterogeneous_columns(spark, tmp_path):
    """A tag's struct fields UNION across files in the shared parse;
    the slice must restrict each file to its OWN discovered columns
    (and own tags) — a file must never see a sibling's column."""
    from ffi_export_etl_spark.sources.xml import (
        discover_columns,
        read_ffi_export_sliced,
    )

    a = tmp_path / "a.xml"
    a.write_text(
        "<FFIData>"
        "<T><K>1</K><OnlyA>x</OnlyA></T>"
        "<U><J>9</J></U>"
        "</FFIData>"
    )
    b = tmp_path / "b.xml"
    b.write_text(
        "<FFIData>"
        "<T><K>2</K><OnlyB>y</OnlyB></T>"
        "</FFIData>"
    )
    paths = [str(a), str(b)]
    colsets = {}
    for p in paths:
        _ns, root, cols = discover_columns(p)
        colsets[p] = cols
    sliced, _slices = read_ffi_export_sliced(spark, paths, "FFIData", colsets)
    assert set(sliced[str(a)]) == {"T", "U"}
    assert set(sliced[str(b)]) == {"T"}  # no U leaked from a.xml
    assert sliced[str(a)]["T"].columns == ["K", "OnlyA"]
    assert sliced[str(b)]["T"].columns == ["K", "OnlyB"]
    rows_a = sliced[str(a)]["T"].collect()
    rows_b = sliced[str(b)]["T"].collect()
    assert [(r["K"], r["OnlyA"]) for r in rows_a] == [("1", "x")]
    assert [(r["K"], r["OnlyB"]) for r in rows_b] == [("2", "y")]


def test_batched_mode_dup_basenames_fall_back_per_file(spark, tmp_path):
    """Two pending files with the SAME basename (different subdirs)
    cannot be sliced apart by input_file_name basename — batched mode
    must fall back to per-file reads and still land the right rows."""
    import os

    from ffi_export_etl_spark.plans.batch_driver import (
        process_exports_batched,
    )
    from ffi_export_etl_spark.sources.xml import sliceable_paths

    d1 = tmp_path / "w1"
    d2 = tmp_path / "w2"
    d1.mkdir()
    d2.mkdir()
    write_export_xml(str(d1 / "export.xml"))
    _p2 = str(d2 / "export.xml")
    from tests.ffi_fixture import build_export_xml as _bx

    with open(_p2, "w") as f:
        f.write(
            _bx()
            .replace(
                "<SampleEvent_GUID>se-0004</SampleEvent_GUID>",
                "<SampleEvent_GUID>se-0006</SampleEvent_GUID>",
            )
            .replace(
                "<SampleEvent_Date>2024-06-01T09:30:00</SampleEvent_Date>",
                "<SampleEvent_Date>2026-01-01T09:30:00</SampleEvent_Date>",
            )
        )
    paths = sorted(str(p) for p in tmp_path.glob("w*/export.xml"))
    assert not sliceable_paths(paths)
    wh = str(tmp_path / "wh")
    loaded = process_exports_batched(
        spark, str(tmp_path / "w*" / "export.xml"), wh
    )
    assert loaded.get("SampleEvent", 0) == 3  # 2 shared + 1 new event
    ev = spark.read.parquet(os.path.join(wh, "SampleEvent"))
    assert ev.count() == 3
