"""Advanced search extensions: time-of-day bands, multi-key sort,
exact scientific-name expansion, total counts, and the POST /search
alias.

Reference: internal/datastore/search_advanced.go (fixed dawn/day/dusk/
night band approximation, SortBy vocabulary) and
internal/api/v2/detections/search.go (HandleSearch request surface,
total/pages response)."""

import datetime
import json
import urllib.request

from birdnet_go_tpu.datastore.sqlite import Datastore
from tests.test_app_integration import tiny_app  # fixture
from tests.test_realtime_core import _detection


def _seed(ds, sci, hhmmss, conf=0.9, date="2026-08-10"):
    ts = datetime.datetime.fromisoformat(f"{date}T{hhmmss}").timestamp()
    return ds.insert_detection(
        _detection(sci=sci, common=sci, conf=conf, ts=ts))


def _make():
    ds = Datastore(":memory:")
    _seed(ds, "Dawnus birdus", "05:30:00", conf=0.5)
    _seed(ds, "Dayus birdus", "12:00:00", conf=0.7)
    _seed(ds, "Duskus birdus", "19:00:00", conf=0.9)
    _seed(ds, "Nightus owlus", "23:30:00", conf=0.8)
    _seed(ds, "Nightus owlus", "03:00:00", conf=0.6, date="2026-08-11")
    return ds


def test_time_of_day_bands():
    ds = _make()
    assert [r["scientific_name"] for r in
            ds.search_detections(time_of_day=["dawn"])] == \
        ["Dawnus birdus"]
    assert [r["scientific_name"] for r in
            ds.search_detections(time_of_day=["day"])] == \
        ["Dayus birdus"]
    assert [r["scientific_name"] for r in
            ds.search_detections(time_of_day=["dusk"])] == \
        ["Duskus birdus"]
    # night wraps midnight: 20:00 → 05:00
    night = ds.search_detections(time_of_day=["night"])
    assert {r["time"] for r in night} == {"23:30:00", "03:00:00"}
    # multiple bands OR together
    both = ds.search_detections(time_of_day=["dawn", "dusk"])
    assert {r["scientific_name"] for r in both} == \
        {"Dawnus birdus", "Duskus birdus"}
    # unknown band names are ignored rather than matching nothing
    assert len(ds.search_detections(time_of_day=["weird"])) == 5


def test_sort_by_vocabulary():
    ds = _make()
    by_conf = ds.search_detections(sort_by="confidence_desc")
    assert [r["confidence"] for r in by_conf] == [0.9, 0.8, 0.7, 0.6, 0.5]
    by_conf_asc = ds.search_detections(sort_by="confidence_asc")
    assert by_conf_asc[0]["confidence"] == 0.5
    by_sp = ds.search_detections(sort_by="species_asc")
    names = [r["common_name"] for r in by_sp]
    assert names == sorted(names)
    # date sorts match the legacy order param
    assert ds.search_detections(sort_by="date_asc")[0]["time"] == \
        "05:30:00"


def test_species_scientific_expansion_and_total():
    ds = _make()
    rows = ds.search_detections(
        species_scientific=["Dawnus birdus", "Dayus birdus"])
    assert {r["scientific_name"] for r in rows} == \
        {"Dawnus birdus", "Dayus birdus"}
    # free text ORs with the exact list (search.go mergeSpeciesScientific)
    rows = ds.search_detections(species="Duskus",
                                species_scientific=["Dawnus birdus"])
    assert {r["scientific_name"] for r in rows} == \
        {"Dawnus birdus", "Duskus birdus"}
    # with_total returns pagination totals independent of limit
    rows, total = ds.search_detections(limit=2, with_total=True)
    assert len(rows) == 2 and total == 5


def test_search_api_total_pages_and_alias(tiny_app):
    app = tiny_app
    app.start(warmup=False)
    base = f"http://127.0.0.1:{app.settings.webserver.port}/api/v2"
    _seed(app.datastore, "Nightus owlus", "23:00:00")
    _seed(app.datastore, "Dayus birdus", "12:30:00")

    def post(path, body):
        r = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    # reference route shape POST /api/v2/search works like
    # /detections/search and carries total/pages
    st, body = post("/search", {"time_of_day": ["night"], "limit": 1})
    assert st == 200
    assert body["total"] == 1 and body["pages"] == 1
    assert body["detections"][0]["scientific_name"] == "Nightus owlus"
    # camelCase field names from the reference SPA are accepted too
    st, body = post("/search", {"timeOfDay": "day",
                                "sortBy": "confidence_desc"})
    assert st == 200
    assert body["detections"][0]["scientific_name"] == "Dayus birdus"
    # invalid vocab is a 400, not a silent full-table answer
    st, body = post("/search", {"time_of_day": ["noon"]})
    assert st == 400
    st, body = post("/search", {"sort_by": "by_magic"})
    assert st == 400


def test_batch_operations(tiny_app):
    """detections_batch.go semantics: locked rows are skipped (never an
    error), dedupe, resolve caps over-broad queries."""
    app = tiny_app
    app.start(warmup=False)
    base = f"http://127.0.0.1:{app.settings.webserver.port}/api/v2"
    ds = app.datastore
    ids = [_seed(ds, "Batchus birdus", f"10:0{i}:00") for i in range(4)]
    ds.lock_detection(ids[0], True)

    def post(path, body):
        r = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(r, timeout=10) as resp:
                return resp.status, json.loads(resp.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    # resolve by species → ids (cap honored elsewhere)
    st, body = post("/detections/batch/resolve",
                    {"species": "Batchus birdus"})
    assert st == 200 and body["count"] == 4
    assert set(map(int, body["ids"])) == set(ids)
    # review: locked row skipped, duplicates deduped
    st, body = post("/detections/batch/review",
                    {"ids": [str(i) for i in ids] + [str(ids[1])],
                     "verified": "correct"})
    assert st == 200
    assert body == {"processed": 3, "skipped": 1}
    # lock: already-locked is skipped
    st, body = post("/detections/batch/lock",
                    {"ids": [str(i) for i in ids], "locked": True})
    assert body == {"processed": 3, "skipped": 1}
    # unlock processes everything
    st, body = post("/detections/batch/lock",
                    {"ids": [str(i) for i in ids], "locked": False})
    assert body == {"processed": 4, "skipped": 0}
    # delete: re-lock one, it survives as skipped; missing ids skip too
    ds.lock_detection(ids[2], True)
    st, body = post("/detections/batch/delete",
                    {"ids": [str(i) for i in ids] + ["999999"]})
    assert body == {"processed": 3, "skipped": 2}
    assert ds.get_detection(ids[2]) is not None
    # guards: empty and oversized id lists
    st, _ = post("/detections/batch/delete", {"ids": []})
    assert st == 400
    st, _ = post("/detections/batch/delete",
                 {"ids": [str(n) for n in range(501)]})
    assert st == 400
    # bad verdict vocabulary
    st, _ = post("/detections/batch/review",
                 {"ids": ["1"], "verified": "maybe"})
    assert st == 400
