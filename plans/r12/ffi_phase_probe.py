#!/usr/bin/env python
"""Phase profile of process_exports_batched (r12, judge item 3):
generate N fixture exports, run batched mode once per sample, and
attribute wall time to phases by wrapping the real internals:

  prescan   driver-side discover_columns over pending files
  parse     read_ffi_export_sliced construction (load + slicing plans)
  pipeline  per-file FFIPipeline.run() (discovery collects + analysis)
  staging   per-file concurrent staging writes
  load      final per-table scan + upsert phase (everything after the
            staging loop)

Usage: python plans/r12/ffi_phase_probe.py [n_files] [samples]
Prints one JSON line per sample plus a median summary.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import ffi_export_etl_spark.plans.batch_driver as bd  # noqa: E402
from ffi_export_etl_spark.session import get_spark, tune  # noqa: E402
from tests.ffi_fixture import write_export_xml  # noqa: E402


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ffi-phase-probe")
    spark.sparkContext.setLogLevel("ERROR")
    tune(spark)
    work = tempfile.mkdtemp(prefix="ffi_phase_")
    phases: dict[str, float] = {}

    def timed(module, name, phase):
        orig = getattr(module, name)

        def wrap(*a, **k):
            t0 = time.monotonic()
            try:
                return orig(*a, **k)
            finally:
                phases[phase] = phases.get(phase, 0.0) + (
                    time.monotonic() - t0
                )
        return orig, wrap

    try:
        d = os.path.join(work, "exports")
        os.makedirs(d)
        for i in range(n_files):
            write_export_xml(
                os.path.join(d, f"export_{i:04d}.xml"), uniq=f"f{i:04d}"
            )
        glob_pat = os.path.join(d, "*.xml")
        from ffi_export_etl_spark.sources import xml as xmlmod

        results = []
        for s in range(samples):
            phases.clear()
            saved = {}
            for mod, fn, ph in (
                (xmlmod, "discover_columns", "prescan"),
                (bd, "read_ffi_export", "parse"),
            ):
                saved[(mod, fn)] = getattr(mod, fn)
                setattr(mod, fn, timed(mod, fn, ph)[1])
            # sliced parse + pipeline + staging measured via bd hooks
            orig_sliced = None
            if hasattr(bd, "read_ffi_export_sliced"):
                pass
            import ffi_export_etl_spark.sources.xml as x2
            saved[(x2, "read_ffi_export_sliced")] = x2.read_ffi_export_sliced
            # note: batch_driver imports these inside the function body,
            # so patch the SOURCE module it imports from
            def sliced_wrap(*a, _o=x2.read_ffi_export_sliced, **k):
                t0 = time.monotonic()
                try:
                    return _o(*a, **k)
                finally:
                    phases["parse"] = phases.get("parse", 0.0) + (
                        time.monotonic() - t0
                    )
            x2.read_ffi_export_sliced = sliced_wrap
            orig_pipe = bd.FFIPipeline

            class TimedPipe(orig_pipe):
                def run(self):
                    t0 = time.monotonic()
                    try:
                        return super().run()
                    finally:
                        phases["pipeline"] = phases.get(
                            "pipeline", 0.0
                        ) + (time.monotonic() - t0)

            bd.FFIPipeline = TimedPipe
            wh = os.path.join(work, f"wh_{s}")
            t0 = time.monotonic()
            loaded = bd.process_exports_batched(spark, glob_pat, wh)
            total = round(time.monotonic() - t0, 3)
            for (mod, fn), orig in saved.items():
                setattr(mod, fn, orig)
            bd.FFIPipeline = orig_pipe
            shutil.rmtree(wh, ignore_errors=True)
            rec = {
                "sample": s,
                "total": total,
                "rows": sum(loaded.values()),
                "phases": {k: round(v, 3) for k, v in phases.items()},
            }
            results.append(rec)
            print(f"# {json.dumps(rec)}", file=sys.stderr)
        med = sorted(results, key=lambda r: r["total"])[len(results) // 2]
        print(json.dumps({"n_files": n_files, "median": med,
                          "all": results}))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
