"""Regression tests for the round-4 advisor findings: settings PATCH/PUT
with non-dict bodies on dataclass sections (medium — live-tree
corruption), jsrt loop iteration budget, module-loader path confinement,
and union-anchored scalar coercion."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from tests.test_app_integration import tiny_app  # noqa: F401  (fixture)


def _req(port, path, payload, method="PATCH"):
    return urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v2{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method=method)


def test_patch_settings_non_dict_body_400_and_tree_intact(tiny_app):
    """A scalar body for a dataclass section must 400 and leave the live
    settings tree untouched — previously it replaced settings.location
    with a string, validate() raised AttributeError past the narrow
    rollback except, and every later request 500d (advisor r4, medium)."""
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    before_lat = app.settings.location.latitude

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_req(port, "/settings/location", "hello"),
                               timeout=5)
    assert exc.value.code == 400
    # the live tree is intact: still the dataclass, still validating
    assert app.settings.location.latitude == before_lat
    assert not isinstance(app.settings.location, str)
    app.settings.validate()

    # and the server still serves later requests that touch location
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/v2/settings", timeout=5) as r:
        body = json.loads(r.read())
    assert isinstance(body["location"], dict)
    app.stop()


def test_put_settings_non_dict_section_400_and_tree_intact(tiny_app):
    """Same hole in the full-document PUT (handlers_ext h_put_settings):
    a scalar for one dataclass section must 400 and roll back ALL
    sections merged before it."""
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    before_conf = app.settings.privacy_filter.confidence

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(
            _req(port, "/settings",
                 {"privacy_filter": {"confidence": 0.9},
                  "location": "hello"}, method="PUT"), timeout=5)
    assert exc.value.code == 400
    # the earlier privacy_filter merge was rolled back too
    assert app.settings.privacy_filter.confidence == before_conf
    assert not isinstance(app.settings.location, str)
    app.settings.validate()
    app.stop()


def test_patch_settings_coerce_400_names_the_field(tiny_app):
    """A type-mismatched scalar returns a STRUCTURED 400 naming the
    offending field (CoerceError.key) so the SPA can anchor the message
    to the input (reference Settings.svelte per-field feedback)."""
    app = tiny_app
    app.start(warmup=False)
    port = app.settings.webserver.port
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(
            _req(port, "/settings/location", {"latitude": "abc"}),
            timeout=5)
    assert exc.value.code == 400
    body = json.loads(exc.value.read())
    assert body["field"] == "latitude"
    assert "expected number" in body["error"]
    app.stop()


def test_jsrt_infinite_loop_raises_deadlock_not_hang():
    """An accidental `while (true) {}` in a view must fail the CI gate
    with DeadlockError, not hang it (advisor r4)."""
    from birdnet_go_tpu.jsrt.interp import DeadlockError, Interp, Scope
    from birdnet_go_tpu.jsrt.parser import parse
    from birdnet_go_tpu.jsrt.values import UNDEF

    def run(src):
        it = Interp()
        scope = Scope(parent=it.globals, is_function=True)
        scope.declare("this", UNDEF)
        it.exec_program(parse(src), scope)
        return scope

    with pytest.raises(DeadlockError, match="iterations"):
        run("let i = 0; while (true) { i++; }")
    # a plain big-but-finite loop under the budget still completes
    assert run("let n = 0; for (let i = 0; i < 100000; i++) n++;"
               ).get("n") == 100000


def test_jsrt_module_loader_confined_to_static_dir(tmp_path):
    """A '../'-bearing import spec must not escape the SPA directory
    (advisor r4)."""
    from birdnet_go_tpu.jsrt.interp import Interp
    from birdnet_go_tpu.jsrt.runner import ModuleLoader
    from birdnet_go_tpu.jsrt.values import JSThrow

    (tmp_path / "static").mkdir()
    (tmp_path / "secret.js").write_text("export const leak = 1;")
    loader = ModuleLoader(Interp(), static_dir=tmp_path / "static")
    with pytest.raises(JSThrow):
        loader.load("../secret.js",
                    referrer=str(tmp_path / "static" / "app.js"))
    with pytest.raises(JSThrow):
        loader.load("/../secret.js")


def test_coerce_scalar_container_annotations_pass_through():
    """Scalar coercion anchors on the first non-None union member: a
    container-typed field must never be coerced to a bare scalar, and
    plain unions still coerce (advisor r4)."""
    from birdnet_go_tpu.config.settings import _coerce_scalar

    # container annotations: value passes through untouched
    assert _coerce_scalar("list[float]", 3, "k") == 3
    assert _coerce_scalar("dict[str, float]", "x", "k") == "x"
    assert _coerce_scalar("list[float] | None", 3, "k") == 3
    # plain + optional scalars still coerce
    assert _coerce_scalar("float", "1.5", "k") == 1.5
    assert _coerce_scalar("float | None", 2, "k") == 2.0
    assert _coerce_scalar("int | None", "7", "k") == 7
    assert _coerce_scalar("str | None", 5, "k") == "5"
    with pytest.raises(ValueError):
        _coerce_scalar("bool", "yes", "k")
