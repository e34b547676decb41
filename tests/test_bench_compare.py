"""bench.compare_snapshots: the mechanical round-over-round comparator
(r7 judge item 7 follow-through) — noise-profile gating, per-query
median ratios, driver-wrapper unwrap. Pure dict-in/dict-out, no Spark.
"""

from __future__ import annotations

from bench import compare_snapshots


def _snap(med3, noisy=None, wrap=False):
    s = {"queries_warm_med3": med3}
    if noisy is not None:
        s["noisy"] = noisy
    return {"parsed": s, "rc": 0} if wrap else s


def test_clean_vs_clean_is_comparable_and_scores():
    old = _snap({"a": 1.0, "b": 2.0, "c": 4.0}, noisy=False)
    new = _snap({"a": 1.5, "b": 1.0, "c": 4.1}, noisy=False)
    out = compare_snapshots(old, new)
    assert out["comparable"] is True
    assert out["regressions"] == ["a"]          # 1.5x > 1.25
    assert out["improvements"] == ["b"]         # 0.5x < 0.8
    assert out["median_ratio"] == 1.025         # c's ratio is the median
    assert out["per_query"]["a"]["ratio"] == 1.5


def test_noisy_snapshot_blocks_the_verdict_but_not_the_numbers():
    out = compare_snapshots(
        _snap({"a": 1.0}, noisy=False), _snap({"a": 3.0}, noisy=True)
    )
    assert out["comparable"] is False
    assert "NOT comparable" in out["verdict"]
    # ratios still reported — the caller sees WHY the flag matters
    assert out["per_query"]["a"]["ratio"] == 3.0


def test_pre_flag_snapshot_is_unknown_not_clean():
    out = compare_snapshots(_snap({"a": 1.0}), _snap({"a": 1.0}, noisy=False))
    assert out["comparable"] is False
    assert out["noise"] == {"old": "unknown", "new": "clean"}
    assert "weakly comparable" in out["verdict"]


def test_even_count_median_is_the_midpoint():
    out = compare_snapshots(
        _snap({"a": 1.0, "b": 1.0}, noisy=False),
        _snap({"a": 0.8, "b": 1.3}, noisy=False),
    )
    assert out["median_ratio"] == 1.05   # not the biased upper-middle 1.3


def test_compare_cli_arity_errors_out():
    """A malformed --compare must exit 2, never fall through to the
    multi-minute benchmark run."""
    import subprocess
    import sys as _sys

    p = subprocess.run(
        [_sys.executable, "bench.py", "--compare", "only_one.json"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert p.returncode == 2
    assert "usage" in p.stderr


def test_driver_wrapper_and_query_set_drift():
    old = _snap({"a": 1.0, "gone": 2.0}, noisy=False, wrap=True)
    new = _snap({"a": 1.0, "fresh": 0.5}, noisy=False, wrap=True)
    out = compare_snapshots(old, new)
    assert out["comparable"] is True
    assert out["added"] == ["fresh"] and out["removed"] == ["gone"]
    assert list(out["per_query"]) == ["a"]      # drift listed, not scored


def test_property_invariants():
    """Hypothesis sweep over random grids: regressions/improvements are
    disjoint subsets of the shared queries, added/removed partition the
    symmetric difference, and median_ratio is one of the ratios."""
    from hypothesis import given, settings, strategies as st

    names = st.text(
        alphabet="abcdefgh_", min_size=1, max_size=8
    )
    grids = st.dictionaries(
        names, st.floats(0.001, 100.0, allow_nan=False), max_size=8
    )

    @settings(max_examples=100, deadline=None)
    @given(grids, grids, st.booleans(), st.booleans())
    def check(go, gn, no, nn):
        out = compare_snapshots(_snap(go, noisy=no), _snap(gn, noisy=nn))
        shared = set(go) & set(gn)
        assert set(out["per_query"]) == shared
        assert set(out["regressions"]) <= shared
        assert set(out["improvements"]) <= shared
        assert not (set(out["regressions"]) & set(out["improvements"]))
        assert set(out["added"]) == set(gn) - set(go)
        assert set(out["removed"]) == set(go) - set(gn)
        ratios = [
            v["ratio"] for v in out["per_query"].values()
            if v["ratio"] is not None
        ]
        if ratios:
            if len(ratios) % 2:
                assert out["median_ratio"] in ratios
            assert min(ratios) <= out["median_ratio"] <= max(ratios)
        else:
            assert out["median_ratio"] is None
        assert out["comparable"] == (not no and not nn)

    check()


def test_load_snapshot_recovers_truncated_wrap_via_sidecar(tmp_path):
    """r8 judge item 1: a driver-truncated BENCH_r{N}.json (parsed:
    null, tail begins mid-object) must recover its full result through
    the sidecar reference that survives tail truncation — relative
    paths resolve against the wrapped file's directory."""
    import json

    from bench import load_snapshot, write_sidecar

    full = {"queries_warm_med3": {"a": 1.0, "b": 2.0}, "noisy": False}
    rel = write_sidecar(full, str(tmp_path))
    assert (tmp_path / rel).exists()
    assert (tmp_path / "BENCH_LAST.json").exists()
    line = json.dumps({**full, "sidecar": rel})
    wrapped = {"parsed": None, "rc": 0, "tail": line[len(line) // 2:]}
    wp = tmp_path / "BENCH_r99.json"
    wp.write_text(json.dumps(wrapped))
    snap = load_snapshot(str(wp))
    assert snap["queries_warm_med3"] == full["queries_warm_med3"]
    out = compare_snapshots(snap, full)
    assert out["comparable"] is True and out["median_ratio"] == 1.0


def test_load_snapshot_passthrough_shapes(tmp_path):
    """Plain bench lines and cleanly-parsed wraps load unchanged; a
    truncated wrap whose tail lost even the sidecar key falls back to
    the wrap itself (compare then reports weakly/empty, not a crash)."""
    import json

    from bench import load_snapshot

    plain = tmp_path / "plain.json"
    plain.write_text(json.dumps({"queries_warm_med3": {"a": 1.0}}))
    assert load_snapshot(str(plain))["queries_warm_med3"] == {"a": 1.0}
    wrap = tmp_path / "wrap.json"
    wrap.write_text(
        json.dumps({"parsed": {"queries_warm_med3": {"a": 2.0}}})
    )
    assert load_snapshot(str(wrap))["parsed"]["queries_warm_med3"] == {
        "a": 2.0
    }
    lost = tmp_path / "lost.json"
    lost.write_text(json.dumps({"parsed": None, "tail": '"noisy": false}'}))
    snap = load_snapshot(str(lost))
    out = compare_snapshots(snap, {"queries_warm_med3": {"a": 1.0}})
    assert out["per_query"] == {}


def test_cpu_attribution_tree_vs_foreign():
    """r9 noisy-flag redesign: CPU burned inside the bench's own
    process tree must NOT count as foreign; CPU burned by an orphaned
    (out-of-tree) process must. Loadavg could not make this
    distinction — the bench's own heavy packs tripped the r8
    threshold on a quiet host."""
    import os
    import subprocess
    import sys
    import time

    import pytest

    from bench import foreign_cpu_sec, proc_cpu_snapshot

    t0 = proc_cpu_snapshot()
    assert os.getpid() in t0[1]

    # burn ~0.5s of CPU in a CHILD (in-tree at both snapshots);
    # sys.executable, not a bare "python" (absent on python3-only
    # hosts, ADVICE r9)
    subprocess.run(
        [sys.executable, "-c",
         "import time;t=time.time()\nwhile time.time()-t<0.5: pass"],
        check=True,
    )
    t1 = proc_cpu_snapshot()
    own_burn_foreign = foreign_cpu_sec(t0, t1)
    # the 0.5s child burn must not appear as foreign; the margin only
    # needs to distinguish daemon ticks from the full 0.5s burn
    assert own_burn_foreign < 0.45

    # The orphan half asserts a positive foreign reading against real
    # host daemons and scheduler share — only meaningful on a quiet
    # host (a loaded box can starve the orphan's busy-loop below the
    # threshold, or daemons can blur the baseline).
    if own_burn_foreign > 0.1:
        pytest.skip(
            f"host not quiet (foreign burn {own_burn_foreign:.2f}s "
            "during the child window) — orphan attribution needs a "
            "quiet baseline"
        )

    # burn ~1s of CPU in an ORPHAN (setsid + parent exits -> reparented
    # out of our tree): must be charged as foreign
    subprocess.run(
        ["bash", "-c",
         f"setsid {sys.executable} -c 'import time\n"
         "t=time.time()\n"
         "while time.time()-t<1.0: pass' </dev/null >/dev/null 2>&1 &"],
        check=True,
    )
    time.sleep(1.5)
    t2 = proc_cpu_snapshot()
    assert foreign_cpu_sec(t1, t2) > 0.5


def test_zero_old_timing_yields_null_ratio():
    out = compare_snapshots(
        _snap({"a": 0.0}, noisy=False), _snap({"a": 1.0}, noisy=False)
    )
    assert out["per_query"]["a"]["ratio"] is None
    assert out["median_ratio"] is None
    assert out["regressions"] == []


def test_aux_med3_rows_merge_into_per_query():
    """r10: the heavy non-headline rows (and the ffi plan points) carry
    their own warm-med3 grid, compared alongside the headline grid —
    r9's only real movements were in exactly these rows and the
    comparator never saw them."""
    old = {
        "queries_warm_med3": {"a": 1.0},
        "aux_warm_med3": {"cur_e2e": 8.0, "ffi_glob_x16": 13.0},
        "noisy": False,
    }
    new = {
        "queries_warm_med3": {"a": 1.0},
        "aux_warm_med3": {"cur_e2e": 12.0, "ffi_glob_x16": 12.8},
        "noisy": False,
    }
    out = compare_snapshots(old, new)
    assert out["per_query"]["cur_e2e"]["ratio"] == 1.5
    assert "cur_e2e" in out["regressions"]
    assert "ffi_glob_x16" in out["per_query"]
    assert out["median_ratio"] == 1.0


def test_pre_aux_snapshot_lists_aux_rows_as_added():
    old = {"queries_warm_med3": {"a": 1.0}, "noisy": False}
    new = {
        "queries_warm_med3": {"a": 1.0},
        "aux_warm_med3": {"cur_e2e": 9.0},
        "noisy": False,
    }
    out = compare_snapshots(old, new)
    assert out["added"] == ["cur_e2e"]
    assert set(out["per_query"]) == {"a"}


def test_flagged_ffi_row_carries_adjudication_note():
    old = {
        "queries_warm_med3": {"a": 1.0},
        "aux_warm_med3": {"ffi_glob_x64": 13.0},
        "noisy": False,
    }
    new = {
        "queries_warm_med3": {"a": 1.0},
        "aux_warm_med3": {"ffi_glob_x64": 20.0},
        "noisy": False,
    }
    out = compare_snapshots(old, new)
    assert "ffi_glob_x64" in out["regressions"]
    assert any("bench_ffi" in n for n in out["notes"])
    # no note when nothing ffi regressed
    clean = compare_snapshots(old, old)
    assert "notes" not in clean


def test_cross_layout_compare_is_weak_even_when_clean():
    """ADVICE r10: the r10 reorder (ffi section before the headline
    passes) made headline rows run JIT-warm (~0.85x on identical code).
    A cross-layout compare must say so instead of scoring the regime
    shift as per-query improvements."""
    old = _snap({"a": 1.0}, noisy=False)
    new = _snap({"a": 0.85}, noisy=False)
    new["bench_layout"] = 2
    out = compare_snapshots(old, new)
    assert out["comparable"] is False
    assert out["bench_layout"] == {"old": 1, "new": 2}
    assert "bench_layout" in out["verdict"]
    # ratios still reported for the caller's judgment
    assert out["per_query"]["a"]["ratio"] == 0.85


def test_stampless_post_reorder_sidecar_is_inferred_layout_2():
    """BENCH_SIDECAR_r10.json predates the stamp but was cut by the
    reordered loop; its ffi_* aux plan points identify it so the
    r10->r11 compare is NOT spuriously downgraded."""
    old = _snap({"a": 1.0}, noisy=False)
    old["aux_warm_med3"] = {"ffi_glob_x16": 9.8, "cur_e2e": 5.0}
    new = _snap({"a": 1.0}, noisy=False)
    new["bench_layout"] = 2
    out = compare_snapshots(old, new)
    assert out["bench_layout"] == {"old": 2, "new": 2}
    assert out["comparable"] is True


def test_printed_line_is_minimal_and_driver_complete():
    """r12 (r11 judge item 2): the printed one-line JSON must stay
    inside the driver's stdout tail window, so it carries exactly the
    driver contract (metric/value/unit/queries/sf) plus layout, noise
    flag and the sidecar reference — never the warm grids or
    diagnostics, which are sidecar-only."""
    from bench import PRINTED_KEYS, printed_line

    out = {
        "metric": "headline_queries_total_runtime",
        "value": 17.0,
        "unit": "sec",
        "queries": {"a": 1.0},
        "queries_warm": {"a": 0.9},
        "queries_warm_med3": {"a": 0.8},
        "aux_warm_med3": {"x": 2.0},
        "loadavg_per_query": {"a": 1.1},
        "ffi_batch": [{"mode": "glob"}],
        "sf": 0.1,
        "bench_layout": 2,
        "noisy": False,
        "sidecar": "bench_runs/bench_1.json",
    }
    line = printed_line(out)
    assert set(line) == set(PRINTED_KEYS)
    assert line["queries"] == {"a": 1.0}
    # sidecar LAST so a tail-truncated capture still ends with it
    assert list(line)[-1] == "sidecar"
    # a partial dict (e.g. unit tests) must not KeyError
    assert printed_line({"metric": "m"}) == {"metric": "m"}


def test_load_snapshot_prefers_sidecar_for_minimal_lines(tmp_path):
    """Since r12 the printed line has no warm grids; load_snapshot must
    resolve the full result through the sidecar for BOTH shapes (plain
    line and cleanly-parsed driver wrap), and still load a
    sidecar-less snapshot as-is."""
    import json

    from bench import load_snapshot, write_sidecar

    full = {"queries_warm_med3": {"a": 1.0}, "noisy": False}
    rel = write_sidecar(full, str(tmp_path))
    line = {"metric": "m", "queries": {"a": 2.0}, "sidecar": rel}
    plain = tmp_path / "plain.json"
    plain.write_text(json.dumps(line))
    assert load_snapshot(str(plain))["queries_warm_med3"] == {"a": 1.0}
    wrap = tmp_path / "wrap.json"
    wrap.write_text(json.dumps({"parsed": line, "rc": 0}))
    assert load_snapshot(str(wrap))["queries_warm_med3"] == {"a": 1.0}
    # missing sidecar file -> falls back to the line itself
    gone = {"metric": "m", "queries": {"a": 2.0},
            "sidecar": "bench_runs/nope.json"}
    gp = tmp_path / "gone.json"
    gp.write_text(json.dumps(gone))
    assert load_snapshot(str(gp))["queries"] == {"a": 2.0}
