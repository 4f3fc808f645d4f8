"""Insights: expected-today windows, streaks, phantom/migration/dawn
queries, and the /insights API group.

Reference: internal/api/v2/analytics/insights.go (buildYearRanges,
calculateStreak, handler semantics) and
datastore/v2/repository/insights_impl.go (query shapes incl. the
false-positive exclusion)."""

import datetime
import json
import time
import urllib.request

from birdnet_go_tpu.analysis import insights as ins
from birdnet_go_tpu.datastore.sqlite import Datastore
from tests.test_app_integration import tiny_app  # fixture
from tests.test_realtime_core import _detection


# -- build_year_ranges (insights.go:188-249) -----------------------------------


def test_year_ranges_mid_year():
    today = datetime.date(2026, 6, 15)
    ranges = ins.build_year_ranges(today, window_days=3, max_years=10)
    assert len(ranges) == 10
    assert ("2025-06-12", "2025-06-18") in ranges
    # windows are day-of-year based (insights.go), so leap years shift
    # one calendar day after Feb 29
    assert ("2016-06-11", "2016-06-17") in ranges
    # no range touches the current year
    assert all(not r[0].startswith("2026") for r in ranges)


def test_year_ranges_wrap_backwards_at_jan():
    # Jan 2 (DOY 2), window 3 → start DOY -1 wraps into December
    ranges = ins.build_year_ranges(datetime.date(2026, 1, 2),
                                   window_days=3, max_years=1)
    assert ("2025-12-30", "2025-12-31") in ranges
    assert ("2025-01-01", "2025-01-05") in ranges
    assert len(ranges) == 2


def test_year_ranges_wrap_forwards_at_dec():
    # Dec 30 2026 (DOY 364), window 3 → end DOY 367 spills into next year
    ranges = ins.build_year_ranges(datetime.date(2026, 12, 30),
                                   window_days=3, max_years=2)
    # 2024 is a leap year (366 days): DOY window 361..367 = Dec 26-31
    # plus a one-day spill into 2025
    assert ("2024-12-26", "2024-12-31") in ranges
    assert ("2025-01-01", "2025-01-01") in ranges
    # 2025's spill-forward would land in 2026 (the current year) → only
    # the tail segment is kept
    assert ("2025-12-27", "2025-12-31") in ranges
    assert len(ranges) == 3


def test_year_ranges_window_covering_whole_year():
    ranges = ins.build_year_ranges(datetime.date(2026, 6, 15),
                                   window_days=400, max_years=1)
    assert ranges == [("2025-01-01", "2025-12-31")]


# -- calculate_streak (insights.go:253-277) ------------------------------------


def test_streak_today_missing_is_zero():
    assert ins.calculate_streak(["2026-08-17"], "2026-08-18") == (0, "")
    assert ins.calculate_streak([], "2026-08-18") == (0, "")


def test_streak_counts_consecutive_days():
    dates = ["2026-08-18", "2026-08-17", "2026-08-16", "2026-08-13"]
    days, start = ins.calculate_streak(dates, "2026-08-18")
    assert (days, start) == (3, "2026-08-16")
    # single active day
    assert ins.calculate_streak(["2026-08-18"], "2026-08-18") == \
        (1, "2026-08-18")


def test_streak_spans_month_boundary():
    dates = ["2026-03-01", "2026-02-28", "2026-02-27"]
    assert ins.calculate_streak(dates, "2026-03-01") == (3, "2026-02-27")


# -- dawn chorus aggregation (insights.go:469-538) ------------------------------


def test_dawn_chorus_aggregation_min_days_and_sort():
    raw = []
    # species A: 3 days, earliest 05:00/05:30/06:00 → avg 05:30
    for d, t in (("2026-08-01", "05:00:00"), ("2026-08-02", "05:30:00"),
                 ("2026-08-03", "06:00:00")):
        raw.append({"scientific_name": "A a", "common_name": "A",
                    "date": d, "earliest_time": t})
    # species B: only 2 days → filtered by min_days=3
    for d in ("2026-08-01", "2026-08-02"):
        raw.append({"scientific_name": "B b", "common_name": "B",
                    "date": d, "earliest_time": "04:00:00"})
    # species C: 3 days, all 04:15 → sorts before A
    for d in ("2026-08-01", "2026-08-02", "2026-08-03"):
        raw.append({"scientific_name": "C c", "common_name": "C",
                    "date": d, "earliest_time": "04:15:00"})
    items = ins.aggregate_dawn_chorus(raw, min_days=3)
    assert [it["scientific_name"] for it in items] == ["C c", "A a"]
    assert items[1]["avg_first_detection"] == "05:30"
    assert items[1]["earliest_detection"] == "05:00"
    assert items[0]["days_observed"] == 3


# -- datastore queries (insights_impl.go) ---------------------------------------


def _seed_at(ds, sci, date, hhmmss="08:00:00", conf=0.9):
    ts = datetime.datetime.fromisoformat(f"{date}T{hhmmss}").timestamp()
    return ds.insert_detection(
        _detection(sci=sci, common=sci, conf=conf, ts=ts))


def test_expected_species_years_and_fp_exclusion():
    ds = Datastore(":memory:")
    _seed_at(ds, "Turdus merula", "2024-06-14")
    _seed_at(ds, "Turdus merula", "2025-06-16")
    _seed_at(ds, "Parus major", "2025-06-15")
    fp_id = _seed_at(ds, "Corvus corax", "2025-06-15")
    ds.review_detection(fp_id, "false_positive")
    ranges = ins.build_year_ranges(datetime.date(2026, 6, 15))
    rows = ds.insights_expected_species(ranges)
    by = {r["scientific_name"]: r for r in rows}
    assert by["Turdus merula"]["years_seen"] == 2
    assert by["Turdus merula"]["last_seen_date"] == "2025-06-16"
    assert by["Parus major"]["years_seen"] == 1
    assert "Corvus corax" not in by          # false positive excluded
    # ordered by years_seen DESC
    assert rows[0]["scientific_name"] == "Turdus merula"


def test_phantom_species_query():
    ds = Datastore(":memory:")
    today = datetime.date.today().isoformat()
    for c in (0.3, 0.4, 0.5):
        _seed_at(ds, "Ghostus dubius", today, conf=c)
    # high-confidence species is not a phantom
    for c in (0.9, 0.95, 0.85):
        _seed_at(ds, "Certus verus", today, conf=c)
    # too few detections
    _seed_at(ds, "Rarus unus", today, conf=0.2)
    rows = ds.insights_phantom_species(time.time() - 30 * 86400,
                                       min_detections=3,
                                       max_avg_confidence=0.6)
    assert [r["scientific_name"] for r in rows] == ["Ghostus dubius"]
    r = rows[0]
    assert r["detection_count"] == 3
    assert abs(r["avg_confidence"] - 0.4) < 1e-9
    assert abs(r["max_confidence"] - 0.5) < 1e-9


def test_migration_arrivals_and_gone_quiet():
    ds = Datastore(":memory:")
    today = datetime.date.today()
    recent = (today - datetime.timedelta(days=14)).isoformat()
    # new arrival: first detection inside the window
    _seed_at(ds, "Novus avis", (today - datetime.timedelta(days=3))
             .isoformat())
    # old regular gone quiet: 5 detections, none in the window
    for off in range(20, 25):
        _seed_at(ds, "Quietus totus",
                 (today - datetime.timedelta(days=off)).isoformat())
    # old regular still active: not in either list
    for off in (30, 20, 2):
        _seed_at(ds, "Praesens semper",
                 (today - datetime.timedelta(days=off)).isoformat())
    arrivals = ds.insights_new_arrivals(recent)
    assert [a["scientific_name"] for a in arrivals] == ["Novus avis"]
    assert arrivals[0]["detection_count"] == 1
    quiet = ds.insights_gone_quiet(recent, min_total_detections=5)
    assert [q["scientific_name"] for q in quiet] == ["Quietus totus"]
    assert quiet[0]["total_detections"] == 5


def test_dashboard_kpis_and_streak():
    ds = Datastore(":memory:")
    today = datetime.date.today()
    for off in (0, 0, 1, 2, 5):               # 2 today, streak of 3 days
        _seed_at(ds, "Turdus merula",
                 (today - datetime.timedelta(days=off)).isoformat())
    _seed_at(ds, "Parus major", today.isoformat())
    k = ds.insights_dashboard_kpis(today.isoformat())
    assert k["lifetime_species"] == 2
    assert k["today_detections"] == 3
    assert k["best_day_date"] == today.isoformat()
    assert k["best_day_count"] == 3
    days, start = ins.calculate_streak(k["recent_dates"],
                                       today.isoformat())
    assert days == 3
    assert start == (today - datetime.timedelta(days=2)).isoformat()


# -- API group smoke (tiny_app boots the real server) ----------------------------


def test_insights_api_routes(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    base = f"http://127.0.0.1:{app.settings.webserver.port}/api/v2"
    today = datetime.date.today()
    ds = app.datastore
    _seed_at(ds, "Turdus merula",
             (today - datetime.timedelta(days=2)).isoformat(),
             hhmmss="05:10:00")
    for route, key in (
            ("/insights/expected-today", "species"),
            ("/insights/phantom-species", "species"),
            ("/insights/dawn-chorus", "species"),
            ("/insights/migration", "new_arrivals"),
            ("/dashboard/kpis", "detection_streak")):
        with urllib.request.urlopen(base + route, timeout=10) as resp:
            assert resp.status == 200
            body = json.loads(resp.read())
            assert key in body, route
    # regional endpoint degrades honestly without eBird config
    with urllib.request.urlopen(
            base + "/insights/expected-today/regional",
            timeout=10) as resp:
        body = json.loads(resp.read())
        assert body == {"species": [], "available": False}
    # migration sees the seeded arrival
    with urllib.request.urlopen(base + "/insights/migration",
                                timeout=10) as resp:
        body = json.loads(resp.read())
        assert [a["scientific_name"] for a in body["new_arrivals"]] == \
            ["Turdus merula"]
        assert body["new_arrivals"][0]["thumbnail_url"].startswith(
            "/api/v2/species/thumbnail?name=Turdus")
