"""Synthetic FFI export XML for golden tests (FIXTURES.md section B).

Shapes mirror what /root/reference/parser/xml.py consumes; content is ours.
Coverage: PlotID dedup (two MacroPlots normalizing to one PlotID), dropped
null-DateIn plot, orphan SampleEvent (empty EventID), species GUID lookup,
StemNum sequence, witness-tree min-DBH dedup, English/Metric unit split,
multi-delimiter team strings, every VisitID branch piece, mixed-case GUIDs,
offset timestamps.
"""

from __future__ import annotations

NS = "http://tempuri.org/FFIExport.xsd"

# mixed-case GUIDs exercise the ingest uppercase cast
RU1 = "ru-0001"
MP1, MP2, MP3 = "mp-0001", "mp-0002", "mp-0003"
SE1, SE4 = "se-0001", "se-0004"
M1, M2A, M2B, M3, M4 = "m-tree", "m-fine-e", "m-fine-m", "m-wit", "m-duff"
LS1, LS2 = "LS-0001", "LS-0002"
PU1, MS1 = "pu-0001", "ms-0001"


def _row(tag: str, fields: dict[str, str | None]) -> str:
    cells = "".join(
        f"<{k}>{v}</{k}>" for k, v in fields.items() if v is not None
    )
    return f"<{tag}>{cells}</{tag}>"


def build_export_xml() -> str:
    rows: list[str] = []
    rows.append(_row("Schema_Version", {"Schema_Version": "1.05"}))
    rows.append(
        _row(
            "RegistrationUnit",
            {
                "RegistrationUnit_GUID": RU1,
                "RegistrationUnit_Name": "North Rim Unit",
                "RegistrationUnit_Comment": "fixture",
            },
        )
    )
    # MacroPlot: MP1+MP2 normalize to the same PlotID (keep-first by
    # DateIn); MP3 has no DateIn -> dropped
    rows += [
        _row(
            "MacroPlot",
            {
                "MacroPlot_GUID": MP1,
                "MacroPlot_Name": "Plot-1",
                "MacroPlot_RegistrationUnit_GUID": RU1,
                "MacroPlot_DateIn": "2020-01-01T00:00:00",
                "MacroPlot_Elevation": "2100",
            },
        ),
        _row(
            "MacroPlot",
            {
                "MacroPlot_GUID": MP2,
                "MacroPlot_Name": "Plot 1",
                "MacroPlot_RegistrationUnit_GUID": RU1,
                "MacroPlot_DateIn": "2021-06-01T00:00:00",
                "MacroPlot_Elevation": "2200",
            },
        ),
        _row(
            "MacroPlot",
            {
                "MacroPlot_GUID": MP3,
                "MacroPlot_Name": "Plot_2",
                "MacroPlot_RegistrationUnit_GUID": RU1,
                "MacroPlot_Elevation": "1900",
            },
        ),
    ]
    # SampleEvent: SE1/SE4 valid on MP1; one orphan (absent plot) dropped
    rows += [
        _row(
            "SampleEvent",
            {
                "SampleEvent_GUID": SE1,
                "SampleEvent_Plot_GUID": MP1,
                "SampleEvent_Date": "2023-05-15T10:00:00-06:00",
                "SampleEvent_Who": "Crew A",
            },
        ),
        _row(
            "SampleEvent",
            {
                "SampleEvent_GUID": SE4,
                "SampleEvent_Plot_GUID": MP1,
                "SampleEvent_Date": "2024-06-01T09:30:00",
                "SampleEvent_Who": "Crew B",
            },
        ),
        _row(
            "SampleEvent",
            {
                "SampleEvent_GUID": "se-orphan",
                "SampleEvent_Plot_GUID": "mp-absent",
                "SampleEvent_Date": "2023-07-01T00:00:00",
            },
        ),
    ]
    # Methods: trees (English), fine fuels (English + Metric), witness
    # trees, duff/litter
    rows += [
        _row("Method", {"Method_GUID": M1, "Method_Name": "Trees - Individuals",
                        "Method_UnitSystem": "English"}),
        _row("Method", {"Method_GUID": M2A, "Method_Name": "Surface Fuels - Fine",
                        "Method_UnitSystem": "English"}),
        _row("Method", {"Method_GUID": M2B, "Method_Name": "Surface Fuels - Fine",
                        "Method_UnitSystem": "Metric"}),
        _row("Method", {"Method_GUID": M3,
                        "Method_Name": "Plot Info Wit Trees Comments3",
                        "Method_UnitSystem": "English"}),
        # name chosen to normalize to SurfaceFuels_Duff_Litter (the key
        # _process_events expects; see method_table_name)
        _row("Method", {"Method_GUID": M4,
                        "Method_Name": "Surface Fuels - Duff - Litter",
                        "Method_UnitSystem": "English"}),
    ]
    ma = [
        ("11", M1, "TagNo"), ("12", M1, "TreeSpp"), ("13", M1, "DBH"),
        ("21", M2A, "Transect"), ("22", M2A, "Azimuth"), ("23", M2A, "Slope"),
        ("24", M2A, "Hits"),
        ("25", M2B, "Transect"), ("26", M2B, "Azimuth"), ("27", M2B, "Slope"),
        ("28", M2B, "Hits"),
        ("31", M3, "WitDBH"), ("32", M3, "WitComment"),
    ]
    rows += [
        _row("MethodAttribute", {"MethodAtt_ID": i, "MethodAtt_Method_GUID": g,
                                 "MethodAtt_FieldName": f})
        for i, g, f in ma
    ]
    sa = [
        ("101", M1, "FieldTeam"), ("102", M1, "EntryTeam"),
        ("201", M2A, "FieldTeam"), ("202", M2A, "EntryTeam"),
        ("203", M2B, "FieldTeam"), ("204", M2B, "EntryTeam"),
        ("301", M3, "FieldTeam"), ("302", M3, "EntryTeam"),
        ("401", M4, "FieldTeam"), ("402", M4, "EntryTeam"),
    ]
    rows += [
        _row("SampleAttribute", {"SampleAtt_ID": i, "SampleAtt_Method_GUID": g,
                                 "SampleAtt_FieldName": f})
        for i, g, f in sa
    ]
    rows += [
        _row("LocalSpecies", {"LocalSpecies_GUID": LS1,
                              "LocalSpecies_Symbol": "PIPO"}),
        _row("LocalSpecies", {"LocalSpecies_GUID": LS2,
                              "LocalSpecies_Symbol": "ABCO"}),
    ]
    # Sample rows: one per (method, event)
    sample_rows = [
        ("SR1", "sr-guid-1", M1), ("SR2", "sr-guid-2", M2A),
        ("SR3", "sr-guid-3", M2B), ("SR4", "sr-guid-4", M3),
        ("SR5", "sr-guid-5", M4),
    ]
    rows += [
        _row("SampleRow", {"SampleRow_ID": i, "SampleRow_Original_GUID": g,
                           "SampleRow_CreatedBy": "tester"})
        for i, g, _ in sample_rows
    ]
    # SampleData: team strings with mixed delimiters + duplicates
    sd = [
        ("SR1", "101", SE1, "Gil Perez, Rosa Lee"),
        ("SR1", "102", SE1, "Rosa Lee"),
        ("SR2", "201", SE1, "Ana Diaz Mo Chen"),   # space-delimited
        ("SR2", "202", SE1, "Ana Diaz"),
        ("SR3", "203", SE1, "Jo Kim/Lee Roy"),     # slash-delimited
        ("SR3", "204", SE1, "Jo Kim"),
        ("SR4", "301", SE1, "Sam Hill"),
        ("SR4", "302", SE1, "Sam Hill"),
        ("SR5", "401", SE1, "Gil Perez, Ana Diaz"),
        ("SR5", "402", SE1, "Mo Chen"),
    ]
    rows += [
        _row("SampleData", {"SampleData_SampleRow_ID": r,
                            "SampleData_SampleAtt_ID": a,
                            "SampleData_SampleEvent_GUID": e,
                            "SampleData_Value": v})
        for r, a, e, v in sd
    ]
    # Attribute rows: 3 trees (two sharing TagNo+species -> StemNum 1,2),
    # 2 witness trees (min WitDBH kept), 2 fine-fuels transects E+M
    ar = [
        ("AR1", "dr-0001"), ("AR2", "dr-0002"), ("AR3", "dr-0003"),
        ("AR4", "dr-0004"), ("AR5", "dr-0005"),
        ("AR6", "dr-0006"), ("AR7", "dr-0007"),
    ]
    rows += [
        _row("AttributeRow", {"AttributeRow_ID": i,
                              "AttributeRow_DataRow_GUID": g,
                              "AttributeRow_Original_GUID": g.upper()})
        for i, g in ar
    ]
    ad = [
        # tree 1 + tree 2: same TagNo/species
        ("AR1", "11", "SR1", "001"), ("AR1", "12", "SR1", "ls-0001"),
        ("AR1", "13", "SR1", "12.5"),
        ("AR2", "11", "SR1", "001"), ("AR2", "12", "SR1", "LS-0001"),
        ("AR2", "13", "SR1", "13.0"),
        # tree 3: different species
        ("AR3", "11", "SR1", "002"), ("AR3", "12", "SR1", "ls-0002"),
        ("AR3", "13", "SR1", "40.1"),
        # witness trees (WitDBH "12" < "30" lexicographically AND numerically)
        ("AR4", "31", "SR4", "30"), ("AR4", "32", "SR4", "north edge"),
        ("AR5", "31", "SR4", "12"), ("AR5", "32", "SR4", "south edge"),
        # fine fuels English transect
        ("AR6", "21", "SR2", "T1"), ("AR6", "22", "SR2", "120"),
        ("AR6", "23", "SR2", "10"), ("AR6", "24", "SR2", "7"),
        # fine fuels Metric transect
        ("AR7", "25", "SR3", "T1"), ("AR7", "26", "SR3", "120"),
        ("AR7", "27", "SR3", "10"), ("AR7", "28", "SR3", "18"),
    ]
    rows += [
        _row("AttributeData", {"AttributeData_DataRow_ID": r,
                               "AttributeData_MethodAtt_ID": a,
                               "AttributeData_SampleRow_ID": s,
                               "AttributeData_Value": v})
        for r, a, s, v in ad
    ]
    # Projects: every VisitID branch (year + prefix + Base=Fire + Imm)
    rows += [
        _row("ProjectUnit", {"ProjectUnit_GUID": PU1,
                             "ProjectUnit_Name": "Fire_Project 1",
                             "ProjectUnit_Agency": "NPS"}),
        _row("MonitoringStatus", {"MonitoringStatus_GUID": MS1,
                                  "MonitoringStatus_ProjectUnit_GUID": PU1,
                                  "MonitoringStatus_Name": "01Fire",
                                  "MonitoringStatus_Prefix": "01",
                                  "MonitoringStatus_Base": "Fire",
                                  "MonitoringStatus_Suffix": "Immediate"}),
        _row("MM_MonitoringStatus_SampleEvent",
             {"MM_MonitoringStatus_GUID": MS1, "MM_SampleEvent_GUID": SE1}),
    ]
    body = "\n".join(rows)
    return f'<?xml version="1.0"?>\n<FFIData xmlns="{NS}">\n{body}\n</FFIData>\n'


# every GUID-ish constant that must be distinct across synthetic files
_UNIQ_GUIDS = (
    RU1, MP1, MP2, MP3, SE1, SE4, "se-orphan", "mp-absent",
    M1, M2A, M2B, M3, M4, LS1, LS2, PU1, MS1,
    "sr-guid-1", "sr-guid-2", "sr-guid-3", "sr-guid-4", "sr-guid-5",
    "dr-0001", "dr-0002", "dr-0003", "dr-0004", "dr-0005", "dr-0006",
    "dr-0007",
)
# plot/project names feed PlotID/ProjectID normalization; uniquifying
# them keeps the intra-file dedup behavior while making the derived keys
# distinct across files
_UNIQ_NAMES = ("Plot-1", "Plot 1", "Plot_2", "Fire_Project 1")


def uniquify_export_xml(xml: str, uniq: str) -> str:
    """Suffix every cross-file-identifying value with ``uniq`` so N
    synthetic exports carry disjoint keys (multi-file batch tests and the
    FFI loader bench). GUIDs are replaced case-sensitively in both their
    original and uppercased ingest forms."""
    for g in _UNIQ_GUIDS:
        # replace each DISTINCT case form once (the fixture uses original,
        # uppercased, and lowercased spellings of the same GUID; a naive
        # double replace would re-suffix already-replaced text)
        forms = {g: f"{g}-{uniq}"}
        forms.setdefault(g.upper(), f"{g}-{uniq}".upper())
        forms.setdefault(g.lower(), f"{g}-{uniq}".lower())
        for src, repl in forms.items():
            xml = xml.replace(src, repl)
    for name in _UNIQ_NAMES:
        xml = xml.replace(f">{name}<", f">{name}{uniq}<")
    return xml


def write_export_xml(path: str, uniq: str = "") -> str:
    xml = build_export_xml()
    if uniq:
        xml = uniquify_export_xml(xml, uniq)
    with open(path, "w") as f:
        f.write(xml)
    return path
