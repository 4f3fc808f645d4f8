"""SPA runtime gate: execute every view in the jsrt interpreter against
the REAL in-process API server.

This is the in-CI replacement for the reference's Playwright e2e suite
(/root/reference/frontend/tests/e2e) in an image with no browser/node:
the full ES-module SPA (shell boot, router, i18n, views, charts) runs
in birdnet_go_tpu.jsrt with a DOM shim, and fetch() performs real HTTP
against the live server — so a runtime TypeError in any view's render
path, an unhandled promise rejection, a console.error, or a fetch of an
unregistered route fails CI here, not in production.

Unlike tests/test_browser_e2e.py (which self-skips without a browser),
this test ALWAYS runs.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from tests.test_app_integration import tiny_app  # noqa: F401  (fixture)
from tests.test_realtime_core import _detection

# substrings that indicate a swallowed runtime error rendered into an
# error boundary (views catch per-card errors and print e.message)
ERROR_SIGNATURES = (
    "cannot read properties", "is not a function", "is not defined",
    "[object Object]", "undefined is not", "unexpected token",
)

VIEWS = ["dashboard", "detections", "search", "analytics", "species",
         "system", "settings", "models", "notifications", "alerts",
         "range", "imports", "help", "about", "reportbug"]


@pytest.fixture()
def spa(tiny_app):  # noqa: F811
    """Live server + booted jsrt browser session, with one detection."""
    from birdnet_go_tpu.jsrt.runner import BrowserSession

    # isolate the wizard-dismissed marker (data_dir falls back to the
    # CWD-relative data/ when unset — must not leak across runs)
    import pathlib
    tiny_app.settings.data_dir = str(
        pathlib.Path(tiny_app.settings.database.path).parent)
    # seed a RECENT detection: the detections view defaults to "last 7
    # days" (first <option> — jsrt select.value mirrors browser
    # selectedIndex=0 semantics), so a stale fixed date would be
    # filtered out of every default view
    import time as _time
    tiny_app.datastore.insert_detection(_detection(ts=_time.time() - 3600))
    tiny_app.start(warmup=False)
    base = (f"http://{tiny_app.settings.webserver.host}:"
            f"{tiny_app.settings.webserver.port}")
    session = BrowserSession(base)
    session.boot()
    yield tiny_app, session
    tiny_app.stop()


def _assert_clean(session, context):
    assert not session.errors, f"{context}: " + "\n".join(session.errors)
    txt = session.text().lower()
    hits = [sig for sig in ERROR_SIGNATURES if sig in txt]
    assert not hits, (f"{context}: error signature {hits} rendered "
                      f"into the view:\n{session.text()[:800]}")


def test_boot_renders_shell_and_dashboard(spa):
    _, session = spa
    _assert_clean(session, "boot")
    # sidebar is localized by the inline module
    assert "Dashboard" in session.doc.root.text_content()
    # dashboard view rendered into the outlet with real content
    assert len(session.text()) > 50
    # boot hit the real API
    routes = [u for (_, u, _s) in session.fetch_log]
    assert "/api/v2/auth/status" in routes


def test_every_view_renders_against_live_api(spa):
    _, session = spa
    for view in VIEWS:
        session.navigate(view)
        _assert_clean(session, f"view {view}")
        assert len(session.text()) > 20, f"view {view} rendered nothing"
    # every fetch the views issued must have been answered by a
    # registered route — 404s on API paths mean a broken URL in the SPA
    misses = [(m, u, st) for (m, u, st) in session.fetch_log
              if st in (404, -1) and u.startswith("/api/")]
    assert not misses, f"views fetched unregistered routes: {misses}"


def test_detail_and_species_routes_render_seeded_data(spa):
    _, session = spa
    session.navigate("detection/1")
    _assert_clean(session, "detection detail")
    assert "Turdus merula" in session.text()

    session.navigate("species/Turdus%20merula")
    _assert_clean(session, "species detail")
    assert "Turdus" in session.text()


def test_detections_range_select_interaction(spa):
    _, session = spa
    session.navigate("detections")
    selects = [s for s in session.query("select")
               if any(o.text_content() == "Today"
                      for o in s.descendants() if o.tag == "option")]
    assert selects, "date-range select not rendered"
    today = next(o.attrs.get("value") for o in selects[0].descendants()
                 if o.tag == "option" and o.text_content() == "Today")
    session.input(selects[0], today)
    apply_btns = [b for b in session.query("button")
                  if b.text_content() == "Apply"]
    assert apply_btns, "Apply button not rendered"
    n_fetches = len(session.fetch_log)
    session.click(apply_btns[0])
    _assert_clean(session, "after Apply with range=Today")
    assert len(session.fetch_log) > n_fetches, "apply issued no fetch"
    # the reload must carry the narrowed range to the server
    assert any("/detections" in u for (_, u, _s)
               in session.fetch_log[n_fetches:])


def _btn(session, label, exact=False):
    hits = [b for b in session.query("button")
            if (b.text_content() == label if exact
                else label in b.text_content())]
    assert hits, f"button {label!r} not rendered"
    return hits[0]


def test_search_view_query_save_and_review_flow(spa):
    """Search view (reference Search.svelte): run a complex query against
    the live POST /detections/search, validate ranges client-side, save a
    named search, reload it from the chip, and review a result in place."""
    _, session = spa
    session.navigate("search")
    _assert_clean(session, "search view")
    query = next(i for i in session.query("input")
                 if i.attrs.get("placeholder", "").startswith("Species"))
    session.input(query, "Turdus")
    n0 = len(session.fetch_log)
    session.click(_btn(session, "Search"))
    _assert_clean(session, "after search")
    assert any(u == "/api/v2/detections/search" and m == "POST"
               for (m, u, _s) in session.fetch_log[n0:])
    assert "Turdus merula" in session.text()

    # client-side range validation: min% above max% never hits the API
    inputs = session.query("input")
    conf = [i for i in inputs if i.attrs.get("type") == "number"]
    session.input(conf[0], "90")
    session.input(conf[1], "10")
    n1 = len(session.fetch_log)
    session.click(_btn(session, "Search"))
    assert not any(u == "/api/v2/detections/search"
                   for (_m, u, _s) in session.fetch_log[n1:]), \
        "invalid range was sent to the server"
    assert "confidence" in session.text().lower()      # toast shown
    session.input(conf[0], "")
    session.input(conf[1], "")

    # save the query under a name (modal), chip appears and persists
    session.click(_btn(session, "Save search"))
    name_input = next(i for i in session.query("input")
                      if i.attrs.get("placeholder", "").startswith("Name"))
    session.input(name_input, "blackbirds")
    session.click(_btn(session, "Save", exact=True))
    _assert_clean(session, "after save search")
    assert "blackbirds" in session.text()
    session.navigate("dashboard")
    session.navigate("search")
    assert "blackbirds" in session.text(), "saved search did not persist"

    # clicking the chip re-runs the saved query
    n2 = len(session.fetch_log)
    session.click(_btn(session, "blackbirds"))
    _assert_clean(session, "after loading saved search")
    assert any(u == "/api/v2/detections/search"
               for (_m, u, _s) in session.fetch_log[n2:])
    assert "Turdus merula" in session.text()

    # in-place review: ✓ posts to /review and re-renders with the badge
    session.click(_btn(session, "✓"))
    _assert_clean(session, "after review")
    assert any("/review" in u and m == "POST"
               for (m, u, _s) in session.fetch_log[n2:])

    # client-side CSV export pages the FULL result set through an
    # `async function*` + `for await` (jsrt r5) into a Blob object-URL
    n3 = len(session.fetch_log)
    session.click(_btn(session, "Export CSV"))
    _assert_clean(session, "after CSV export")
    assert any(u == "/api/v2/detections/search" and m == "POST"
               for (m, u, _s) in session.fetch_log[n3:])
    from birdnet_go_tpu.jsrt import builtins as jsb
    blob = jsb.LAST_OBJECT_URL_BLOB
    assert blob is not None and blob.type == "text/csv"
    header, *rows = blob.data.strip().split("\n")
    assert header.startswith("timestamp,common_name,")
    assert rows and any("Turdus merula" in r for r in rows)


def test_settings_server_error_anchors_to_field(spa):
    """A server-side rejection (validate(): latitude out of range —
    invisible to the client-side schema, which carries no min/max for
    location) renders as an inline .field-error NEXT TO the latitude
    input, not just a toast (reference Settings.svelte per-field
    feedback)."""
    _, session = spa
    session.navigate("settings")
    lat = next(i for i in session.query("input")
               if i.attrs.get("data-key") == "latitude")
    session.input(lat, "400")          # client-valid number, server-invalid
    section = lat
    while section is not None and section.tag != "details":
        section = section.parent
    assert section is not None, "latitude input not inside a section card"
    save = next(b for b in section.descendants()
                if b.tag == "button" and b.text_content() == "Save")
    session.click(save)
    errs = [n for n in section.descendants()
            if "field-error" in n.attrs.get("class", "")]
    assert errs, "no inline field error rendered"
    assert "latitude" in errs[0].text_content()
    # the input itself is flagged
    assert "invalid" in lat.attrs.get("class", "")


def test_modal_closes_on_escape(spa):
    _, session = spa
    session.navigate("detections")
    # the seeded detection row exposes a detail action; opening any modal
    # is view-specific, so exercise the primitive directly through app.js
    from birdnet_go_tpu.jsrt.runner import Module
    module = Module("<modal-test>")
    module.loader = session.loader
    session.loader.exec_module(
        """
        import { modal } from "/static/app.js";
        modal("jsrt-test-modal");
        """, module)
    session.interp.drain_jobs()
    assert session.query(".modal-overlay"), "modal did not open"
    session.keydown("Escape")
    assert not session.query(".modal-overlay"), "Escape did not close modal"
    _assert_clean(session, "modal escape")


def test_language_switch_localizes_sidebar(spa):
    tiny, session = spa
    from birdnet_go_tpu.jsrt.runner import BrowserSession

    base = (f"http://{tiny.settings.webserver.host}:"
            f"{tiny.settings.webserver.port}")
    de = BrowserSession(base)
    de.interp.globals.get("localStorage").data["lang"] = "de"
    de.boot()
    assert not de.errors, "\n".join(de.errors)
    text = de.doc.root.text_content()
    assert "Einstellungen" in text, "sidebar not localized to de"


def test_onboarding_wizard_full_flow(spa):
    """Drive the first-run wizard end to end through the real UI fetch
    layer: location PATCH → skip source → finish (dismiss POST).
    Reference: frontend onboarding flow; the Playwright recipe's
    'settings PATCH round trip' pass condition."""
    import json
    import urllib.request

    tiny, session = spa
    base = (f"http://{tiny.settings.webserver.host}:"
            f"{tiny.settings.webserver.port}")

    # location is unconfigured in the fixture → wizard must be up
    assert session.query(".wizard-overlay"), "wizard did not appear"

    def wizard_button(label):
        # i18n decorates labels ("Next →"); match on the word
        btns = [b for b in session.query(".wizard-overlay button")
                if label in b.text_content()]
        assert btns, f"wizard button {label!r} not found"
        return btns[0]

    inputs = session.query(".wizard-overlay input")
    assert len(inputs) >= 2
    session.input(inputs[0], "51.4778")
    session.input(inputs[1], "-0.0014")
    session.click(wizard_button("Next"))
    _assert_clean(session, "wizard step1 → step2")
    assert ("PATCH", "/api/v2/settings/location", 200) in session.fetch_log

    session.click(wizard_button("Skip"))          # step2 → step3
    session.click(wizard_button("Finish"))        # dismiss + reload
    _assert_clean(session, "wizard finish")
    assert not session.query(".wizard-overlay"), "wizard did not close"
    assert ("POST", "/api/v2/app/wizard/dismiss", 200) in session.fetch_log
    assert session.interp.globals.get("location").reloads >= 1

    # the PATCH really landed server-side
    with urllib.request.urlopen(base + "/api/v2/settings", timeout=5) as r:
        cfg = json.loads(r.read())
    assert abs(cfg["location"]["latitude"] - 51.4778) < 1e-6


def test_detection_row_opens_spectrogram_drawer(spa):
    _, session = spa
    session.navigate("detections")
    toggles = [b for b in session.query("button")
               if b.text_content() == "∿"]
    assert toggles, "spectrogram toggle not rendered for the seeded row"
    session.click(toggles[0])
    _assert_clean(session, "open spectro drawer")
    assert session.query(".spectro-row .spec-player"), \
        "player drawer did not render"
    session.click(toggles[0])
    assert not session.query(".spectro-row"), "drawer did not close"


def test_settings_view_patch_round_trip(spa):
    """Edit location.longitude through the real settings UI and verify
    the PATCH persisted server-side (Playwright recipe pass condition)."""
    import json
    import urllib.request

    tiny, session = spa
    base = (f"http://{tiny.settings.webserver.host}:"
            f"{tiny.settings.webserver.port}")
    session.navigate("settings")
    _assert_clean(session, "settings render")

    fields = {}
    for row in session.query(".field-row"):
        labels = [c for c in row.descendants() if c.tag == "label"]
        if labels and labels[0].text_content().strip() in ("latitude",
                                                           "longitude"):
            inputs = [c for c in row.descendants() if c.tag == "input"]
            if inputs:
                fields[labels[0].text_content().strip()] = inputs[0]
    assert set(fields) == {"latitude", "longitude"}, \
        "location fields not rendered in settings"
    # null-valued numeric fields must render as number inputs (schema
    # typing — regression found by this gate)
    assert fields["longitude"].attrs.get("type") == "number"
    # validate() clears half-set locations, so set both
    session.input(fields["latitude"], "52.52")
    session.input(fields["longitude"], "13.405")

    from birdnet_go_tpu.jsrt.dom import select
    section = fields["longitude"]
    while section is not None and section.tag != "details":
        section = section.parent
    assert section is not None
    saves = [b for b in select(section, "button")
             if "Save" in b.text_content()]
    assert saves, "section Save button not found"
    session.click(saves[0])
    _assert_clean(session, "settings save")
    assert any(m == "PATCH" and u.startswith("/api/v2/settings")
               and st == 200 for (m, u, st) in session.fetch_log)

    with urllib.request.urlopen(base + "/api/v2/settings", timeout=5) as r:
        cfg = json.loads(r.read())
    assert abs(cfg["location"]["longitude"] - 13.405) < 1e-6


def test_alerts_rule_create_and_delete_flow(spa):
    """Create an alert rule through the real editor, see it listed,
    then delete it (confirm dialog answered via arm_modal)."""
    _, session = spa
    session.navigate("alerts")

    def field(label):
        for row in session.query(".field-row"):
            labels = [c for c in row.descendants() if c.tag == "label"]
            if labels and labels[0].text_content().strip() == label:
                for c in row.descendants():
                    if c.tag in ("input", "select"):
                        return c
        raise AssertionError(f"form field {label!r} not found")

    session.input(field("name"), "jsrt smoke rule")
    create = [b for b in session.query("button")
              if "Create" in b.text_content()]
    assert create, "Create rule button not rendered"
    session.click(create[0])
    _assert_clean(session, "rule create")
    assert ("POST", "/api/v2/alerts/rules", 200) in session.fetch_log
    assert "jsrt smoke rule" in session.text()

    # delete it (the 🗑 button issues the DELETE directly)
    dels = session.query("button.danger")
    assert dels, "rule delete button not rendered"
    session.click(dels[-1])
    _assert_clean(session, "rule delete")
    assert ("DELETE", "/api/v2/alerts/rules/jsrt-smoke-rule", 200) \
        in session.fetch_log


def test_detections_bulk_review_flow(spa):
    """Select the seeded row, bulk-mark it correct, verify the review
    landed in the datastore."""
    tiny, session = spa
    session.navigate("detections")
    boxes = session.query("input.sel")
    assert boxes, "row selection checkbox not rendered"
    box = boxes[0]
    box.props["checked"] = True
    from birdnet_go_tpu.jsrt.dom import Event, dispatch
    dispatch(session.interp, box, Event("change", box))
    session.interp.drain_jobs()

    marks = [b for b in session.query("button")
             if b.text_content().startswith("✓")]
    assert marks, "bulk correct button not rendered"
    session.arm_modal("Confirm")
    session.click(marks[0])
    _assert_clean(session, "bulk review")
    assert any(m == "POST" and "/review" in u and st == 200
               for (m, u, st) in session.fetch_log), session.fetch_log[-8:]
    reviews = tiny.datastore.get_reviews(1)
    assert [r["verdict"] for r in reviews] == ["correct"]


def test_notifications_send_test_and_mark_read(spa):
    _, session = spa
    session.navigate("notifications")
    send = [b for b in session.query("button")
            if "test" in b.text_content().lower()]
    assert send, "Send test button not rendered"
    session.click(send[0])
    _assert_clean(session, "send test notification")
    assert any(m == "POST" and "/notifications" in u and st == 200
               for (m, u, st) in session.fetch_log)
    mark = [b for b in session.query("button")
            if "read" in b.text_content().lower()]
    assert mark, "Mark all read button not rendered"
    session.click(mark[0])
    _assert_clean(session, "mark all read")


def test_analytics_drilldown_deep_links_into_detections(spa):
    """Clicking a drillable mark must deep-link into the detections view
    with the filter carried in the hash query."""
    _, session = spa
    session.navigate("analytics")
    _assert_clean(session, "analytics render")
    marks = session.query("[role=button]")
    if not marks:
        pytest.skip("no drillable marks with a single seeded detection")
    before = session.location.hash
    session.click(marks[0])
    _assert_clean(session, "drill-down click")
    # either a deep link navigated us, or the mark opened a modal —
    # both are valid drill targets; a no-op is not
    assert session.location.hash != before \
        or session.query(".modal-overlay"), "mark click did nothing"
    if session.location.hash != before:
        assert session.location.hash.startswith("#/"), session.location.hash


def test_analytics_depth_charts_render_and_drill(spa):
    """Round-5 depth charts: the diel streamgraph (reference
    AcousticSuccessionChart.svelte), first-heard timeline
    (NewSpeciesTimelineChart.svelte), and diversity-over-time line
    (SpeciesDiversityChart.svelte) render from live data, and a timeline
    marker deep-links into the detections view with the species filter."""
    import time as _time

    tiny, session = spa
    # two species spread over recent hours so the diel charts have ≥2
    # bands inside the default 30-day analytics window (the fixture's
    # seeded detection is dated 2023 and falls outside it)
    now = _time.time()
    for i, (sci, common) in enumerate([
            ("Parus major", "Great Tit"),
            ("Erithacus rubecula", "European Robin")]):
        for k in range(3):
            tiny.datastore.insert_detection(_detection(
                sci=sci, common=common, ts=now - (i * 3 + k) * 3600))
    session.navigate("analytics")
    _assert_clean(session, "analytics render")
    titles = [h.text_content().lower() for h in session.query("h2")]
    assert any("streamgraph" in t for t in titles), titles
    assert any("diversity over time" in t for t in titles), titles
    marks = session.query(".timeline-card [role=button]")
    assert marks, "first-heard timeline has no drillable markers"
    session.click(marks[0])
    _assert_clean(session, "timeline drill")
    assert session.location.hash.startswith("#/detections?species="), \
        session.location.hash


def test_settings_patch_type_mismatch_is_400(spa):
    """Regression (found by this gate): PATCH /settings/location with a
    string where a float is declared used to corrupt the live settings
    tree and 500 inside validate(). Contract now: 400, tree untouched."""
    import json
    import urllib.error
    import urllib.request

    tiny, _ = spa
    base = (f"http://{tiny.settings.webserver.host}:"
            f"{tiny.settings.webserver.port}")
    req = urllib.request.Request(
        base + "/api/v2/settings/location",
        data=b'{"latitude":null,"longitude":"not-a-number"}',
        headers={"Content-Type": "application/json"}, method="PATCH")
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=5)
    assert exc.value.code == 400
    assert "longitude" in json.loads(exc.value.read())["error"]
    # live tree untouched and still typed
    assert tiny.settings.location.longitude is None
    # numeric strings ARE coerced (lenient clients)
    req2 = urllib.request.Request(
        base + "/api/v2/settings/location",
        data=b'{"latitude":"51.5","longitude":"13.405"}',
        headers={"Content-Type": "application/json"}, method="PATCH")
    with urllib.request.urlopen(req2, timeout=5) as r:
        assert r.status == 200
    assert tiny.settings.location.longitude == pytest.approx(13.405)
    assert isinstance(tiny.settings.location.longitude, float)


def test_detail_comment_thread_flow(spa):
    """Add a comment on the detail view and see it in the thread and in
    the datastore (reference notesTab)."""
    tiny, session = spa
    session.navigate("detection/1")
    # the thread lives behind the notes tab
    tabs = session.query("[role=tab]")
    notes = [b for b in tabs if b.attrs.get("data-tab") == "notes"]
    assert notes, f"notes tab missing: {[b.attrs for b in tabs]}"
    session.click(notes[0])
    _assert_clean(session, "notes tab")
    inputs = [e for e in session.outlet().descendants()
              if e.tag == "input"
              and "comment" in e.attrs.get("placeholder", "").lower()]
    assert inputs, "comment input not rendered on the notes tab"
    box = inputs[0]
    session.input(box, "jsrt was here")
    row = box.parent
    saves = [b for b in row.children
             if getattr(b, "tag", "") == "button"]
    assert saves, "comment save button not rendered"
    session.click(saves[0])
    _assert_clean(session, "comment add")
    assert any(m == "POST" and u.endswith("/detections/1/comments")
               and st == 200 for (m, u, st) in session.fetch_log)
    assert "jsrt was here" in session.text()
    assert any(c["text"] == "jsrt was here"
               for c in tiny.datastore.list_comments(1))


def test_sse_events_drive_live_updates(spa):
    """Feed synthetic SSE events through the stubbed EventSources and
    assert the live-update render paths execute: 'currently hearing'
    pills, the 1/3-octave sound-level canvas, the detections 'N new'
    pill, and the unread-notifications badge."""
    import json as _j
    import urllib.request

    tiny, session = spa
    base = (f"http://{tiny.settings.webserver.host}:"
            f"{tiny.settings.webserver.port}")
    session.navigate("dashboard")

    def source(path):
        es = [e for e in session.event_sources
              if e.url.endswith(path) and not e.closed]
        assert es, (f"no live EventSource for {path}: "
                    f"{[(e.url, e.closed) for e in session.event_sources]}")
        return es[-1]

    # currently-hearing pending broadcast
    source("/detections/pending/stream").emit(
        session.interp, "pending", _j.dumps([{
            "source_id": "tone0", "models": ["BirdNET_V2.4"],
            "common_name": "Eurasian Blackbird",
            "scientific_name": "Turdus merula",
            "count": 3, "confidence": 0.91}]))
    session.interp.drain_jobs()
    _assert_clean(session, "pending SSE")
    assert "Eurasian Blackbird ×3 91%" in session.text()

    # sound-level bars (canvas paints; must not throw)
    source("/soundlevels/stream").emit(
        session.interp, "soundlevel", _j.dumps({
            "tone0": {"levels_db": [-60, -48, -33, -20, -41]}}))
    session.interp.drain_jobs()
    _assert_clean(session, "soundlevel SSE")

    # new-detection event → 'N new' pill refetch
    source("/detections/stream").emit(session.interp, "detection", "{}")
    session.interp.drain_jobs()
    _assert_clean(session, "detection SSE")
    assert "new" in session.text()

    # unread badge: create a real notification server-side, then nudge
    # the app-lifetime stream
    req = urllib.request.Request(
        base + "/api/v2/notifications/test", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST")
    urllib.request.urlopen(req, timeout=5)
    source("/notifications/stream").emit(
        session.interp, "notification", "{}")
    session.interp.drain_jobs()
    _assert_clean(session, "notification SSE")
    badge = [e for e in session.doc.root.descendants()
             if e.attrs.get("id") == "notif-badge"][0]
    assert badge.text_content().strip().isdigit() \
        and int(badge.text_content()) >= 1, badge.text_content()


def test_service_worker_installs_and_serves_shell(spa):
    """Execute sw.js: install must fetch every SHELL URL from the real
    server (catching stale paths when a view file moves), activate must
    clean old caches, and the fetch strategy must be cache-first for
    static assets and pass-through for /api."""
    from birdnet_go_tpu.jsrt.runner import ServiceWorkerHarness

    _, session = spa
    sw = ServiceWorkerHarness(session)
    sw.run()
    sw.cache_storage.caches["birdnet-tpu-v0-stale"] = {}
    sw.install()
    assert not session.errors, "\n".join(session.errors)
    assert sw.scope.skipped_waiting
    # the live cache name comes from sw.js itself — a version bump must
    # not silently leave this test asserting against a dead cache
    import re as _re

    sw_src = (Path(__file__).parent.parent
              / "birdnet_go_tpu/api/static/sw.js").read_text()
    cache_name = _re.search(r'const CACHE = "([^"]+)"', sw_src).group(1)
    shell = sw.cache_storage.caches.get(cache_name)
    assert shell and len(shell) >= 18, \
        f"shell precache incomplete: {sorted((shell or {}).keys())}"

    sw.activate()
    assert sw.scope.claimed
    assert "birdnet-tpu-v0-stale" not in sw.cache_storage.caches

    # /api is never intercepted (live data must not be stale)
    assert sw.fetch("/api/v2/health") is None
    # static assets serve cache-first: plant a stale sentinel and check
    # (a) the stale copy is returned instantly, (b) the anchored
    # revalidation replaced it with the fresh network copy
    from birdnet_go_tpu.jsrt.runner import FetchResponse
    stale = FetchResponse(200, b"stale-sentinel", [], "/static/app.js")
    shell["/static/app.js"] = stale
    resp = sw.fetch("/static/app.js")
    assert resp is not None and resp.body == b"stale-sentinel"
    refreshed = shell["/static/app.js"]
    assert refreshed.body != b"stale-sentinel", \
        "stale-while-revalidate never updated the cache"
    # and POSTs pass through even for static paths
    assert sw.fetch("/static/app.js", method="POST") is None


def test_all_locales_boot_without_errors(spa):
    """Boot the SPA once per shipped locale — a broken message bundle
    (bad interpolation, missing key crash) must fail CI, not a user."""
    from birdnet_go_tpu.jsrt.runner import BrowserSession, Module

    tiny, session = spa
    base = (f"http://{tiny.settings.webserver.host}:"
            f"{tiny.settings.webserver.port}")
    module = Module("<langs>")
    module.loader = session.loader
    scope = session.loader.exec_module(
        'import { LANGS } from "/static/app.js";'
        "let codes = LANGS.join(',');", module)
    codes = scope.get("codes").split(",")
    assert len(codes) >= 15, codes
    for code in codes:
        s = BrowserSession(base)
        s.interp.globals.get("localStorage").data["lang"] = code
        s.boot()
        assert not s.errors, f"locale {code}: " + "\n".join(s.errors)
        assert len(s.text()) > 20, f"locale {code} rendered nothing"


def test_gate_fails_on_injected_view_error(tmp_path):
    """Mutation check: a TypeError planted in a view MUST be caught.

    Without this, a silently-broken interpreter (e.g. one that swallows
    exceptions) would keep the suite green while the SPA is broken.
    """
    from birdnet_go_tpu.jsrt.runner import STATIC_DIR, BrowserSession

    broken = tmp_path / "static"
    shutil.copytree(STATIC_DIR, broken)
    dash = broken / "views" / "dashboard.js"
    src = dash.read_text()
    # sabotage the view's entry: first statement dereferences undefined
    needle = "export async function dashboardView"
    assert needle in src
    sabotaged = src.replace(
        needle,
        needle + "(...__args) { undefined.boom; }\n"
        "async function __disabledDashboardView", 1)
    assert sabotaged != src, "sabotage did not apply"
    dash.write_text(sabotaged)

    def fake_fetch(url, method, headers, body):
        return 200, b"{}", [("Content-Type", "application/json")]

    session = BrowserSession("http://t", static_dir=broken,
                             fetch_fn=fake_fetch)
    session.boot()
    session.navigate("dashboard")
    rendered = session.text().lower()
    caught = session.errors or any(sig in rendered
                                   for sig in ERROR_SIGNATURES)
    assert caught, "gate failed to surface an injected view TypeError"


def test_system_backup_now_and_verify_flow(spa):
    """Drive the System page's database panel: Backup now writes a real
    archive, Verify backup decrypts + hash-audits + integrity-checks it
    (reference backup/restore verification path), all through the UI."""
    _, session = spa
    session.navigate("system")

    def button(label):
        btns = [b for b in session.query("button")
                if b.text_content().strip() == label]
        assert btns, f"{label!r} button not rendered"
        return btns[0]

    session.click(button("Backup now"))
    _assert_clean(session, "backup now")
    assert ("POST", "/api/v2/system/database/backup", 200) \
        in session.fetch_log
    toasts = session.query(".toast")
    assert toasts and "Backup written" in toasts[-1].text_content()

    session.click(button("Verify backup"))
    _assert_clean(session, "verify backup")
    assert ("POST", "/api/v2/system/database/backup/verify", 200) \
        in session.fetch_log
    toasts = session.query(".toast")
    assert toasts and "verified" in toasts[-1].text_content().lower()


def test_range_rebuild_flow(spa):
    _, session = spa
    session.navigate("range")
    btns = [b for b in session.query("button")
            if b.text_content().strip() == "Rebuild now"]
    assert btns, "range rebuild button not rendered"
    session.click(btns[0])
    _assert_clean(session, "range rebuild")
    assert ("POST", "/api/v2/range/rebuild", 200) in session.fetch_log


def test_about_and_reportbug_views(spa):
    """Dedicated #/about and #/reportbug pages (VERDICT r4 #7; reference
    About.svelte / ReportBug.svelte): About shows live version info from
    /system/info; ReportBug pre-fills a copyable system-info block and
    links the support dump + GitHub issue flow."""
    _, session = spa
    session.navigate("about")
    _assert_clean(session, "about")
    txt = session.text()
    assert "BirdNET-TPU" in txt
    assert "Credits" in txt and "Technology" in txt and "License" in txt
    # version table filled from the live /system/info endpoint
    assert any(u.endswith("/system/info") for (_, u, _s) in
               session.fetch_log)

    session.navigate("reportbug")
    _assert_clean(session, "reportbug")
    txt = session.text()
    assert "System information" in txt
    assert "Version:" in txt and "Python:" in txt   # pre-filled block
    # copy-to-clipboard flows through the navigator.clipboard shim
    btn = next(b for b in session.query("button")
               if "Copy" in b.text_content())
    session.click(btn)
    writes = session.navigator.clipboard_writes
    assert writes and "Version:" in writes[-1]


def test_degraded_api_renders_no_typeerrors():
    """Every view must tolerate valid-but-empty API payloads ({} for
    every route): an older server, a proxy stripping fields, or a
    mid-migration deployment must degrade to empty states, never to
    TypeError text in an error boundary.  This sweep found (and now
    guards) 18 unguarded field accesses across 7 view modules."""
    from birdnet_go_tpu.jsrt.runner import BrowserSession

    def empty_fetch(url, method, headers, body):
        return 200, b"{}", [("Content-Type", "application/json")]

    session = BrowserSession("http://degraded", fetch_fn=empty_fetch)
    session.boot()
    assert not session.errors, "\n".join(session.errors)
    for view in VIEWS + ["detection/1", "species/Turdus%20merula"]:
        session.navigate(view)
        assert not session.errors, f"{view}: " + "\n".join(session.errors)
        txt = session.text().lower()
        hits = [sig for sig in ERROR_SIGNATURES if sig in txt]
        assert not hits, (f"view {view} leaked a TypeError under a "
                          f"degraded API: {hits}\n{session.text()[:400]}")


def test_gate_fails_on_unregistered_route(tmp_path):
    """Mutation check #2: a view fetching a nonexistent API path must
    surface as a 404 in the fetch log (the route-coverage assertion in
    test_every_view_renders_against_live_api would then fail)."""
    from birdnet_go_tpu.jsrt.runner import BrowserSession

    def fetch_404(url, method, headers, body):
        return 404, b'{"error": "no such route"}', []

    session = BrowserSession("http://t", fetch_fn=fetch_404)
    session.boot()
    misses = [u for (_, u, st) in session.fetch_log if st == 404]
    assert misses, "404 responses must be visible in the fetch log"
