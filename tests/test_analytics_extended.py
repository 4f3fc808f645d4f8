"""Extended analytics: phenology, year-over-year, accumulation, diversity,
genus fallback."""

import math

import pytest

from birdnet_go_tpu.datastore.sqlite import Datastore
from birdnet_go_tpu.taxonomy.labels import genus_of
from tests.test_realtime_core import _detection


def _seed(ds):
    import datetime

    rows = [
        ("Turdus merula", "2026-03-05"), ("Turdus merula", "2026-03-06"),
        ("Turdus merula", "2026-06-20"), ("Parus major", "2026-03-05"),
        ("Parus major", "2025-03-10"),
    ]
    for sci, date in rows:
        ts = datetime.datetime.fromisoformat(date + "T08:00:00").timestamp()
        ds.insert_detection(_detection(sci=sci, common=sci, ts=ts))


def test_phenology_weeks():
    ds = Datastore(":memory:")
    _seed(ds)
    ph = ds.phenology("Turdus merula", year=2026)
    assert len(ph) == 48
    # 2026-03-05/06 → week (3-1)*4 + 1 = 9; 2026-06-20 → (6-1)*4+3 = 23
    by_week = {p["week"]: p["count"] for p in ph}
    assert by_week[9] == 2
    assert by_week[23] == 1
    assert sum(by_week.values()) == 3


def test_year_over_year():
    ds = Datastore(":memory:")
    _seed(ds)
    yoy = ds.year_over_year("Parus major")
    assert yoy["2025"][2] == 1           # March 2025
    assert yoy["2026"][2] == 1
    all_years = ds.year_over_year()
    assert all_years["2026"][2] == 3


def test_accumulation_and_diversity():
    ds = Datastore(":memory:")
    _seed(ds)
    acc = ds.species_accumulation("2026-01-01", "2026-12-31")
    assert acc[0]["cumulative_species"] == 2      # both species on 03-05
    assert acc[-1]["cumulative_species"] == 2
    div = ds.diversity("2026-01-01", "2026-12-31")
    assert div["richness"] == 2 and div["detections"] == 4
    p = [3 / 4, 1 / 4]
    expected = -sum(x * math.log(x) for x in p)
    assert abs(div["shannon"] - expected) < 1e-3
    empty = ds.diversity("2030-01-01", "2030-12-31")
    assert empty == {"richness": 0, "shannon": 0.0, "detections": 0}


def test_time_of_day_species_profiles():
    """Per-species 24-bucket diel profiles, ranked by total (reference
    TimeOfDaySpeciesChart/SpeciesRidgeline analytics components)."""
    import datetime

    ds = Datastore(":memory:")
    for sci, hh in (("Turdus merula", 6), ("Turdus merula", 6),
                    ("Turdus merula", 18), ("Parus major", 7)):
        ts = datetime.datetime.fromisoformat(
            f"2026-03-05T{hh:02d}:00:00").timestamp()
        ds.insert_detection(_detection(sci=sci, common=sci, ts=ts))
    rows = ds.time_of_day_species("2026-01-01", "2026-12-31", top_n=8)
    assert [r["scientific_name"] for r in rows] \
        == ["Turdus merula", "Parus major"]
    tm = rows[0]
    assert tm["total"] == 3 and tm["hourly"][6] == 2 \
        and tm["hourly"][18] == 1 and sum(tm["hourly"]) == 3
    # top_n truncates
    assert len(ds.time_of_day_species("2026-01-01", "2026-12-31", 1)) == 1


def test_species_daily_trend():
    """Top-N per-species daily counts (reference DailySpeciesTrendChart/
    SeasonalHeatmap)."""
    ds = Datastore(":memory:")
    _seed(ds)
    rows = ds.species_daily_trend("2026-01-01", "2026-12-31", top_n=5)
    assert rows[0]["scientific_name"] == "Turdus merula"
    assert rows[0]["total"] == 3
    assert rows[0]["daily"] == {"2026-03-05": 1, "2026-03-06": 1,
                                "2026-06-20": 1}
    assert rows[1]["daily"] == {"2026-03-05": 1}      # 2025 row excluded
    assert len(ds.species_daily_trend("2026-01-01", "2026-12-31", 1)) == 1


def test_genus_fallback():
    assert genus_of("Turdus merula") == "Turdus"
    assert genus_of("") == ""


def test_detection_trends_period_over_period():
    """GetDetectionTrends parity: current window vs the previous window
    of equal length, with a per-day series for sparklines."""
    import datetime as dt

    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    ds = Datastore(":memory:")
    noon = dt.datetime.now().replace(hour=12, minute=0,
                                     second=0).timestamp()
    # 3 detections in the current 7-day window, 1 in the previous one
    for off in (0, 1, 2):
        ds.insert_detection(_detection(ts=noon - off * 86400))
    ds.insert_detection(_detection(ts=noon - 9 * 86400))
    tr = ds.detection_trends(days=7)
    assert tr["detections"] == 3 and tr["detections_prev"] == 1
    assert tr["detections_change_pct"] == 200.0
    assert len(tr["daily"]) == 7
    assert tr["daily"][-1]["count"] == 1          # today
    # zero previous window → change is None, not a division crash
    ds2 = Datastore(":memory:")
    ds2.insert_detection(_detection(ts=noon))
    assert ds2.detection_trends(days=7)["detections_change_pct"] is None


def test_daily_species_summary(tmp_path):
    """Species×hour grid endpoint data (reference analytics.go:193-265):
    per-species 24-bucket hourly counts, first/latest heard, and
    new-species flags from the all-time first detection."""
    import datetime as dt

    from birdnet_go_tpu.datastore.sqlite import Datastore
    from tests.test_realtime_core import _detection

    ds = Datastore(str(tmp_path / "d.db"))
    today = dt.date.today().isoformat()
    old = (dt.date.today() - dt.timedelta(days=30)).isoformat()
    # a long-known species heard at 06 and 07, a brand-new one at 17
    for hh, sci, common in (("06", "Turdus merula", "Blackbird"),
                            ("06", "Turdus merula", "Blackbird"),
                            ("07", "Turdus merula", "Blackbird"),
                            ("17", "Regulus regulus", "Goldcrest")):
        d = _detection(sci=sci, common=common, conf=0.9)
        ds._conn.execute(
            "INSERT INTO detections (timestamp, date, time, source_id,"
            " model_id, scientific_name, common_name, species_code,"
            " confidence, begin_time, end_time, clip_name) VALUES"
            " (?,?,?,?,?,?,?,?,?,?,?,'')",
            (f"{today}T{hh}:00:00", today, f"{hh}:00:00", "s", "m",
             sci, common, "", 0.9, 0, 3))
    ds._conn.execute(
        "INSERT INTO detections (timestamp, date, time, source_id,"
        " model_id, scientific_name, common_name, species_code,"
        " confidence, begin_time, end_time, clip_name) VALUES"
        " (?,?,?,?,?,?,?,?,?,?,?,'')",
        (f"{old}T09:00:00", old, "09:00:00", "s", "m",
         "Turdus merula", "Blackbird", "", 0.9, 0, 3))
    ds._conn.commit()

    rows = ds.daily_species_summary(today)
    by = {r["scientific_name"]: r for r in rows}
    tm = by["Turdus merula"]
    assert tm["count"] == 3 and tm["hourly_counts"][6] == 2 \
        and tm["hourly_counts"][7] == 1 and sum(tm["hourly_counts"]) == 3
    assert tm["first_heard"].startswith("06:") \
        and tm["latest_heard"].startswith("07:")
    assert tm["days_since_first_seen"] == 30 \
        and not tm["is_new_species"]
    rr = by["Regulus regulus"]
    assert rr["is_new_species"] and rr["days_since_first_seen"] == 0
    assert rr["high_confidence"]
    # min_confidence filters
    assert ds.daily_species_summary(today, min_confidence=0.95) == []
    ds.close()
