"""jsrt browser harness: module loader + window environment + fetch.

BrowserSession loads index.html into the DOM shim, executes the inline
ES module (which imports the whole SPA), and drives hash navigation the
way a browser would.  fetch() performs REAL HTTP requests against the
in-process API server, so a run exercises server routing, JSON shapes,
and the SPA render path end-to-end — the jsrt equivalent of the
reference's Playwright suite (/root/reference/frontend/tests/e2e).

Failure modes surfaced to the caller:
 - any uncaught JSThrow during module init, navigation, or timers
 - console.error output (collected, asserted empty by the test)
 - fetch of an unregistered route (HTTP error propagates to the view,
   whose error card is then visible to assertions)
 - an `await` that can never settle (DeadlockError)
"""

from __future__ import annotations

import http.cookiejar
import json as _json
import re
import urllib.error
import urllib.request
from html.parser import HTMLParser
from pathlib import Path

from .dom import Document, Element, Event, MutationObserver, TextNode, nf
from .interp import Interp, Scope
from .parser import parse
from .values import (UNDEF, HostObject, JSArray, JSObject, JSThrow,
                     NativeFunction)

STATIC_DIR = Path(__file__).resolve().parent.parent / "api" / "static"


class JSRuntimeError(RuntimeError):
    pass


# ========================================================== module loader


class Module:
    def __init__(self, path):
        self.path = path
        self.exports = {}
        self.live_exports = []
        self.loader = None


class ModuleLoader:
    def __init__(self, interp, static_dir=STATIC_DIR):
        self.interp = interp
        self.static_dir = Path(static_dir)
        self.cache = {}

    def resolve(self, spec, referrer=None):
        if spec.startswith("/static/"):
            path = (self.static_dir / spec[len("/static/"):]).resolve()
        elif spec.startswith("/"):
            path = (self.static_dir / spec.lstrip("/")).resolve()
        else:
            base = Path(referrer).parent if referrer else self.static_dir
            path = (base / spec).resolve()
        # confine to the SPA directory: a '../'-bearing spec must not
        # escape static_dir (advisor r4)
        root = self.static_dir.resolve()
        if path != root and root not in path.parents:
            raise JSThrow.type_error(
                f"module not found: {spec} (outside static dir)")
        return path

    def load(self, spec, referrer=None):
        path = self.resolve(spec, referrer)
        key = str(path)
        if key in self.cache:
            return self.cache[key]
        if not path.exists():
            raise JSThrow.type_error(
                f"module not found: {spec} (resolved {path})")
        module = Module(key)
        module.loader = self
        self.cache[key] = module
        src = path.read_text()
        self.exec_module(src, module)
        return module

    def exec_module(self, src, module):
        ast = parse(src, module.path)
        scope = Scope(parent=self.interp.globals, is_function=True)
        scope.declare("this", UNDEF)
        prev = self.interp.cur_path
        self.interp.cur_path = module.path
        try:
            self.interp.exec_program(ast, scope, module=module)
        finally:
            self.interp.cur_path = prev
        # refresh let/const exports reassigned later at top level
        for name, sc in module.live_exports:
            module.exports[name] = sc.get(name)
        return scope


# ======================================================== index.html → DOM


class _ShellParser(HTMLParser):
    def __init__(self, doc):
        super().__init__(convert_charrefs=True)
        self.doc = doc
        self.stack = []
        self.scripts = []
        self.in_script = False
        self.script_buf = []

    def handle_starttag(self, tag, attrs):
        if tag == "script":
            self.in_script = True
            self.script_buf = []
            return
        if tag in ("html",):
            self.stack = [self.doc.root]
            return
        if tag == "head":
            self.stack.append(self.doc.head)
            return
        if tag == "body":
            self.stack.append(self.doc.body)
            return
        el = Element(self.doc, tag)
        for k, v in attrs:
            el.attrs[k.lower()] = v if v is not None else ""
        if self.stack:
            parent = self.stack[-1]
            el.parent = parent
            parent.children.append(el)
        if tag not in ("meta", "link", "br", "img", "input", "hr"):
            self.stack.append(el)

    def handle_endtag(self, tag):
        if tag == "script":
            self.in_script = False
            self.scripts.append("".join(self.script_buf))
            return
        if tag in ("meta", "link", "br", "img", "input", "hr", "html"):
            return
        if self.stack:
            self.stack.pop()

    def handle_data(self, data):
        if self.in_script:
            self.script_buf.append(data)
            return
        if self.stack and data.strip():
            tn = TextNode(data)
            parent = self.stack[-1]
            tn.parent = parent
            parent.children.append(tn)


# =============================================================== host BOM


class Storage(HostObject):
    def __init__(self):
        self.data = {}

    def js_get(self, name):
        from .interp import js_str
        if name == "getItem":
            return nf("getItem", lambda i, t, a:
                      self.data.get(js_str(a[0]), None))
        if name == "setItem":
            def _set(i, t, a):
                self.data[js_str(a[0])] = js_str(a[1])
                return UNDEF
            return nf("setItem", _set)
        if name == "removeItem":
            def _rm(i, t, a):
                self.data.pop(js_str(a[0]), None)
                return UNDEF
            return nf("removeItem", _rm)
        if name == "clear":
            def _clear(i, t, a):
                self.data.clear()
                return UNDEF
            return nf("clear", _clear)
        if name == "length":
            return len(self.data)
        return UNDEF


class Location(HostObject):
    def __init__(self, session, base_url):
        self.session = session
        self.base = base_url.rstrip("/")
        self.hash = "#/dashboard"
        self.navigations = []             # full-page navigations (href=…)
        self.reloads = 0

    def js_get(self, name):
        from urllib.parse import urlsplit
        parts = urlsplit(self.base)
        if name == "hash":
            return self.hash
        if name == "href":
            return self.base + "/" + (self.hash or "")
        if name == "protocol":
            return parts.scheme + ":"
        if name == "host":
            return parts.netloc
        if name == "hostname":
            return parts.hostname or ""
        if name == "port":
            return str(parts.port or "")
        if name == "pathname":
            return "/"
        if name == "origin":
            return self.base
        if name == "search":
            return ""
        if name == "reload":
            def _reload(i, t, a):
                self.reloads += 1
                return UNDEF
            return nf("reload", _reload)
        if name == "assign" or name == "replace":
            def _assign(i, t, a):
                from .interp import js_str
                self.navigations.append(js_str(a[0]))
                return UNDEF
            return nf(name, _assign)
        return UNDEF

    def js_set(self, name, value):
        from .interp import js_str
        if name == "hash":
            self.session.set_hash(js_str(value))
            return
        if name == "href":
            self.navigations.append(js_str(value))
            return
        raise JSThrow.type_error(f"cannot set location.{name}")


class Navigator(HostObject):
    def __init__(self, interp):
        self.interp = interp
        self.clipboard_writes = []

    def js_get(self, name):
        if name == "language":
            return "en"
        if name == "languages":
            return JSArray(["en"])
        if name == "userAgent":
            return "jsrt/1.0 (headless CI)"
        if name == "onLine":
            return True
        if name == "serviceWorker":
            def _register(i, t, a):
                p = i.promise()
                i.resolve_promise(p, JSObject({"scope": "/"}))
                return p
            return JSObject({"register": nf("register", _register)})
        if name == "clipboard":
            def _write(i, t, a):
                from .interp import js_str
                self.clipboard_writes.append(js_str(a[0]))
                p = i.promise()
                i.resolve_promise(p, UNDEF)
                return p
            return JSObject({"writeText": nf("writeText", _write)})
        if name == "geolocation":
            return UNDEF
        return UNDEF

    def js_has(self, name):
        return name in ("language", "languages", "userAgent", "onLine",
                        "serviceWorker", "clipboard")


class FetchResponse(HostObject):
    def __init__(self, status, body_bytes, headers, url):
        self.status = status
        self.body = body_bytes
        self.headers = {k.lower(): v for k, v in headers}
        self.url = url

    def js_get(self, name):
        if name == "status":
            return self.status
        if name == "ok":
            return 200 <= self.status < 300
        if name == "statusText":
            return {200: "OK", 201: "Created", 204: "No Content",
                    400: "Bad Request", 401: "Unauthorized",
                    403: "Forbidden", 404: "Not Found",
                    409: "Conflict", 500: "Internal Server Error"}.get(
                        self.status, str(self.status))
        if name == "url":
            return self.url
        if name == "headers":
            hdrs = self.headers

            class _Headers(HostObject):
                def js_get(self, hname):
                    if hname == "get":
                        def _get(i, t, a):
                            from .interp import js_str
                            return hdrs.get(js_str(a[0]).lower(), None)
                        return nf("get", _get)
                    return UNDEF
            return _Headers()
        if name == "json":
            def _jsonm(i, t, a):
                from .builtins import py_to_js
                p = i.promise()
                try:
                    i.resolve_promise(
                        p, py_to_js(_json.loads(self.body.decode("utf-8"))))
                except (ValueError, UnicodeDecodeError) as e:
                    i.reject_promise(p, JSObject(
                        {"name": "SyntaxError", "message": str(e)}))
                return p
            return nf("json", _jsonm)
        if name == "text":
            def _text(i, t, a):
                p = i.promise()
                i.resolve_promise(p, self.body.decode("utf-8", "replace"))
                return p
            return nf("text", _text)
        if name == "clone":
            return nf("clone", lambda i, t, a: FetchResponse(
                self.status, self.body, list(self.headers.items()),
                self.url))
        if name == "blob" or name == "arrayBuffer":
            def _blob(i, t, a):
                p = i.promise()
                i.resolve_promise(p, JSObject({"size": len(self.body)}))
                return p
            return nf(name, _blob)
        return UNDEF


class EventSourceHost(HostObject):
    """Registered with the session so a test can feed synthetic events."""

    def __init__(self, session, url):
        self.session = session
        self.url = url
        self.closed = False
        self.handlers = {}                # type -> [fn]
        session.event_sources.append(self)

    def emit(self, interp, kind, data):
        ev = Event(kind, None, data=data)
        for fn in self.handlers.get(kind, []):
            interp.call(fn, UNDEF, [ev])

    def js_get(self, name):
        if name == "close":
            def _close(i, t, a):
                self.closed = True
                return UNDEF
            return nf("close", _close)
        if name == "addEventListener":
            def _ael(i, t, a):
                from .interp import js_str
                self.handlers.setdefault(js_str(a[0]), []).append(a[1])
                return UNDEF
            return nf("addEventListener", _ael)
        if name == "url":
            return self.url
        if name == "readyState":
            return 2 if self.closed else 1
        return UNDEF

    def js_set(self, name, value):
        if name.startswith("on"):
            self.handlers[name[2:]] = [value]
            return
        raise JSThrow.type_error(f"cannot set EventSource.{name}")


class WebSocketHost(HostObject):
    def __init__(self, session, url):
        self.session = session
        self.url = url
        self.closed = False
        self.sent = []
        self.handlers = {}
        session.websockets.append(self)

    def js_get(self, name):
        from .interp import js_str
        if name == "send":
            def _send(i, t, a):
                self.sent.append(js_str(a[0]))
                return UNDEF
            return nf("send", _send)
        if name == "close":
            def _close(i, t, a):
                self.closed = True
                for fn in self.handlers.get("close", []):
                    i.call(fn, UNDEF, [Event("close", None)])
                return UNDEF
            return nf("close", _close)
        if name == "addEventListener":
            def _ael(i, t, a):
                self.handlers.setdefault(js_str(a[0]), []).append(a[1])
                return UNDEF
            return nf("addEventListener", _ael)
        if name == "readyState":
            return 3 if self.closed else 1
        if name == "url":
            return self.url
        if name == "binaryType":
            return "blob"
        return UNDEF

    def js_set(self, name, value):
        if name.startswith("on"):
            if value is None:
                self.handlers[name[2:]] = []
            else:
                self.handlers[name[2:]] = [value]
            return
        if name == "binaryType":
            return
        raise JSThrow.type_error(f"cannot set WebSocket.{name}")


class AudioContextHost(HostObject):
    def js_get(self, name):
        if name in ("createMediaElementSource", "createAnalyser",
                    "createGain", "createOscillator"):
            return nf(name, lambda i, t, a: _audio_node())
        if name == "destination":
            return _audio_node()
        if name == "close" or name == "resume" or name == "suspend":
            def _close(i, t, a):
                p = i.promise()
                i.resolve_promise(p, UNDEF)
                return p
            return nf(name, _close)
        if name == "state":
            return "running"
        return UNDEF


def _audio_node():
    node = JSObject({})
    node.props["connect"] = nf("connect", lambda i, t, a:
                               a[0] if a else UNDEF)
    node.props["disconnect"] = nf("disconnect", lambda i, t, a: UNDEF)
    node.props["frequencyBinCount"] = 512
    node.props["fftSize"] = 1024
    node.props["getByteFrequencyData"] = nf(
        "getByteFrequencyData", lambda i, t, a: UNDEF)
    return node


class WindowHost(HostObject):
    """`window` — delegates unknown names to the global scope so
    `window.AudioContext` and bare `AudioContext` agree."""

    def __init__(self, interp, session):
        self.interp = interp
        self.session = session
        self.listeners = {}
        self.opened = []

    def js_get(self, name):
        if name == "addEventListener":
            def _ael(i, t, a):
                from .interp import js_str
                self.listeners.setdefault(js_str(a[0]), []).append(a[1])
                return UNDEF
            return nf("addEventListener", _ael)
        if name == "removeEventListener":
            def _rel(i, t, a):
                from .interp import js_str
                lst = self.listeners.get(js_str(a[0]), [])
                if len(a) > 1 and a[1] in lst:
                    lst.remove(a[1])
                return UNDEF
            return nf("removeEventListener", _rel)
        if name == "open":
            def _open(i, t, a):
                from .interp import js_str
                self.opened.append(js_str(a[0]) if a else "")
                return None
            return nf("open", _open)
        if name == "webkitAudioContext":
            return UNDEF
        if name in ("innerWidth",):
            return 1280
        if name in ("innerHeight",):
            return 720
        if name == "scrollTo" or name == "scrollBy" or name == "print":
            return nf(name, lambda i, t, a: UNDEF)
        if name == "matchMedia":
            return nf(name, lambda i, t, a: JSObject(
                {"matches": False,
                 "addEventListener": nf("addEventListener",
                                        lambda i2, t2, a2: UNDEF)}))
        if name == "getComputedStyle":
            return nf(name, lambda i, t, a: a[0].style
                      if a and isinstance(a[0], Element) else JSObject({}))
        s = self.interp.globals.lookup(name)
        if s is not None:
            return s.vars[name]
        return UNDEF

    def js_has(self, name):
        if name in ("addEventListener", "open", "innerWidth", "innerHeight",
                    "matchMedia", "getComputedStyle"):
            return True
        return self.interp.globals.lookup(name) is not None

    def js_set(self, name, value):
        self.interp.globals.declare(name, value)

    def fire(self, interp, type_, event):
        for fn in list(self.listeners.get(type_, [])):
            interp.call(fn, UNDEF, [event])


# ============================================================== session


class BrowserSession:
    """Headless browser over the SPA: boots index.html, navigates,
    renders views against the live API server at base_url."""

    def __init__(self, base_url, static_dir=STATIC_DIR, fetch_fn=None):
        self.base_url = base_url.rstrip("/")
        self.interp = Interp()
        self.loader = ModuleLoader(self.interp, static_dir)
        self.doc = Document()
        self.doc.interp = self.interp
        self.event_sources = []
        self.websockets = []
        self.fetch_log = []
        self.errors = []
        self._fetch_fn = fetch_fn or self._http_fetch
        self._cookies = http.cookiejar.CookieJar()
        self._opener = urllib.request.build_opener(
            urllib.request.HTTPCookieProcessor(self._cookies))
        self.window = WindowHost(self.interp, self)
        self.location = Location(self, self.base_url)
        self._install_bom()
        self._inline_scripts = self._load_shell()

    # ----------------------------------------------------------- plumbing

    def _install_bom(self):
        g = self.interp.globals
        g.declare("window", self.window)
        g.declare("globalThis", self.window)
        g.declare("self", self.window)
        g.declare("document", self.doc)
        g.declare("location", self.location)
        self.navigator = Navigator(self.interp)
        g.declare("navigator", self.navigator)
        g.declare("localStorage", Storage())
        g.declare("sessionStorage", Storage())
        g.declare("history", JSObject({
            "pushState": nf("pushState", lambda i, t, a: UNDEF),
            "replaceState": nf("replaceState", lambda i, t, a: UNDEF),
            "back": nf("back", lambda i, t, a: UNDEF),
        }))
        g.declare("fetch", nf("fetch", self._js_fetch))
        g.declare("alert", nf("alert", lambda i, t, a: UNDEF))
        g.declare("confirm", nf("confirm", lambda i, t, a: False))
        g.declare("prompt", nf("prompt", lambda i, t, a: None))
        g.declare("MutationObserver", NativeFunction(
            "MutationObserver", lambda i, t, a: UNDEF,
            ctor=lambda i, a: MutationObserver(i, a[0])))
        g.declare("EventSource", NativeFunction(
            "EventSource", lambda i, t, a: UNDEF,
            ctor=lambda i, a: EventSourceHost(self, _str(i, a[0]))))
        g.declare("WebSocket", NativeFunction(
            "WebSocket", lambda i, t, a: UNDEF,
            ctor=lambda i, a: WebSocketHost(self, _str(i, a[0]))))
        g.declare("Audio", NativeFunction(
            "Audio", lambda i, t, a: UNDEF,
            ctor=lambda i, a: self._make_audio(i, a)))
        g.declare("AudioContext", NativeFunction(
            "AudioContext", lambda i, t, a: UNDEF,
            ctor=lambda i, a: AudioContextHost()))
        g.declare("Image", NativeFunction(
            "Image", lambda i, t, a: UNDEF,
            ctor=lambda i, a: Element(self.doc, "img")))
        g.declare("Uint8Array", NativeFunction(
            "Uint8Array", lambda i, t, a: UNDEF,
            ctor=lambda i, a: JSArray(
                [0] * int(a[0])
                if a and isinstance(a[0], (int, float)) else [])))
        g.declare("TextDecoder", NativeFunction(
            "TextDecoder", lambda i, t, a: UNDEF,
            ctor=lambda i, a: JSObject({
                "decode": nf("decode", lambda i2, t2, a2: "")})))
        g.declare("FormData", NativeFunction(
            "FormData", lambda i, t, a: UNDEF,
            ctor=lambda i, a: JSObject({})))
        g.declare("Event", NativeFunction(
            "Event", lambda i, t, a: UNDEF,
            ctor=lambda i, a: Event(_str(i, a[0]))))
        g.declare("CustomEvent", NativeFunction(
            "CustomEvent", lambda i, t, a: UNDEF,
            ctor=lambda i, a: Event(_str(i, a[0]))))

    def _make_audio(self, interp, args):
        el = Element(self.doc, "audio")
        if args:
            from .interp import js_str
            el.attrs["src"] = js_str(args[0])
        return el

    def _load_shell(self):
        html = (Path(self.loader.static_dir) / "index.html").read_text()
        parser = _ShellParser(self.doc)
        parser.feed(html)
        return [s for s in parser.scripts if s.strip()]

    # -------------------------------------------------------------- fetch

    def _js_fetch(self, interp, this, args):
        from .interp import js_str
        target = args[0]
        req_method = None
        if isinstance(target, HostObject):
            # Request-like (service worker fetch event): url + method
            u = target.js_get("url")
            if isinstance(u, str):
                m = target.js_get("method")
                req_method = m if isinstance(m, str) else None
                target = u
        url = js_str(target)
        opts = args[1] if len(args) > 1 and isinstance(args[1], JSObject) \
            else JSObject({})
        method = js_str(opts.props.get("method", req_method or "GET"))
        headers = {}
        hdr_obj = opts.props.get("headers")
        if isinstance(hdr_obj, JSObject):
            headers = {k: js_str(v) for k, v in hdr_obj.props.items()}
        body = opts.props.get("body")
        body_bytes = None
        if body is not None and body is not UNDEF:
            body_bytes = js_str(body).encode("utf-8")
        p = interp.promise()
        try:
            status, data, resp_headers = self._fetch_fn(
                url, method, headers, body_bytes)
            self.fetch_log.append((method, url, status))
            interp.resolve_promise(
                p, FetchResponse(status, data, resp_headers, url))
        except OSError as e:
            self.fetch_log.append((method, url, -1))
            interp.reject_promise(p, JSObject(
                {"name": "TypeError", "message": f"fetch failed: {e}"}))
        return p

    def _http_fetch(self, url, method, headers, body):
        full = url if url.startswith("http") else self.base_url + url
        req = urllib.request.Request(full, data=body, method=method)
        for k, v in headers.items():
            req.add_header(k, v)
        try:
            with self._opener.open(req, timeout=30) as resp:
                return resp.status, resp.read(), list(resp.headers.items())
        except urllib.error.HTTPError as e:
            return e.code, e.read(), list(e.headers.items())

    # --------------------------------------------------------- public API

    def boot(self):
        """Execute every inline module in index.html (the SPA entry)."""
        try:
            for idx, src in enumerate(self._inline_scripts):
                module = Module(f"{self.loader.static_dir}/index.html"
                                f"#inline{idx}")
                module.loader = self.loader
                self.loader.exec_module(src, module)
            self.interp.drain_jobs()
        except JSThrow as t:
            self._record_throw("boot", t)
        except Exception:
            raise
        self._collect_console()

    def set_hash(self, value):
        if not value.startswith("#"):
            value = "#" + value
        if self.location.hash == value:
            return
        self.location.hash = value
        ev = Event("hashchange", None)
        try:
            self.window.fire(self.interp, "hashchange", ev)
            self.interp.drain_jobs()
        except JSThrow as t:
            self._record_throw(f"navigate {value}", t)
        self._collect_console()

    def navigate(self, view):
        self.set_hash(f"#/{view}")

    def click(self, element):
        from .dom import dispatch
        try:
            dispatch(self.interp, element, Event("click", element))
            self.interp.drain_jobs()
        except JSThrow as t:
            self._record_throw("click", t)
        self._collect_console()

    def input(self, element, value):
        from .dom import dispatch
        element.props["value"] = value
        try:
            dispatch(self.interp, element, Event("input", element))
            dispatch(self.interp, element, Event("change", element))
            self.interp.drain_jobs()
        except JSThrow as t:
            self._record_throw("input", t)
        self._collect_console()

    def keydown(self, key, target=None):
        from .dom import dispatch
        tgt = target or self.doc.body
        try:
            ev = Event("keydown", tgt, key=key)
            if target is not None:
                dispatch(self.interp, tgt, ev)
            else:
                self.doc.fire(self.interp, ev)
            self.interp.drain_jobs()
        except JSThrow as t:
            self._record_throw(f"keydown {key}", t)
        self._collect_console()

    def arm_modal(self, button_text, attempts=100):
        """Answer the NEXT modal/confirm dialog by clicking the first
        button whose label contains button_text.

        Needed because jsrt's `await` drives the job queue inline: a
        handler that awaits confirmDialog() would otherwise deadlock
        (the resolving click can only come from the harness).  Armed as
        a virtual-time timer, the click fires from inside the await
        loop itself — the same way a user's click interleaves in a real
        browser event loop."""
        from .dom import dispatch, select

        state = {"left": attempts}

        def attempt():
            overlays = self.query(".modal-overlay")
            if overlays:
                for b in select(overlays[-1], "button"):
                    if button_text in b.text_content():
                        dispatch(self.interp, b, Event("click", b))
                        return
            state["left"] -= 1
            if state["left"] > 0:
                self.interp.set_timer(attempt, 1)

        self.interp.set_timer(attempt, 1)

    def outlet(self):
        for el in self.doc.root.descendants():
            if el.attrs.get("id") == "outlet":
                return el
        raise JSRuntimeError("no #outlet in document")

    def query(self, selector):
        from .dom import select
        return select(self.doc.root, selector)

    def text(self, selector=None):
        if selector is None:
            return self.outlet().text_content()
        found = self.query(selector)
        return found[0].text_content() if found else ""

    def _record_throw(self, phase, t):
        from .interp import js_str
        detail = js_str(t.value)
        stack = ""
        if isinstance(t.value, JSObject) and "stack" in t.value.props:
            stack = js_str(t.value.props["stack"])
        self.errors.append(f"[{phase}] uncaught {detail} {stack}".strip())

    def _collect_console(self):
        from .interp import js_str
        for msg in self.interp.console_errors:
            self.errors.append(f"[console.error] {msg}")
        self.interp.console_errors = []
        for _, value in self.interp.rejected:
            self.errors.append(
                f"[unhandledrejection] {js_str(value)}")
        self.interp.rejected = []


def _str(interp, v):
    from .interp import js_str
    return js_str(v)


# ======================================================== service worker


class _SWCache(HostObject):
    def __init__(self, store):
        self.store = store                # url -> FetchResponse

    def js_get(self, name):
        if name == "addAll":
            def _add_all(i, t, a):
                p = i.promise()
                try:
                    for u in i.js_iterate(a[0]):
                        url = _str(i, u)
                        fetch_fn = i.globals.get("fetch")
                        resp_p = i.call(fetch_fn, UNDEF, [url])
                        resp = i.await_value(resp_p)
                        if not (200 <= resp.status < 300):
                            raise JSThrow.type_error(
                                f"addAll: {url} returned {resp.status}")
                        self.store[url] = resp
                    i.resolve_promise(p, UNDEF)
                except JSThrow as t2:
                    i.reject_promise(p, t2.value)
                return p
            return nf("addAll", _add_all)
        if name == "match":
            def _match(i, t, a):
                req = a[0]
                url = (_str(i, req.js_get("url"))
                       if isinstance(req, HostObject) else _str(i, req))
                from urllib.parse import urlsplit
                path = urlsplit(url).path or url
                p = i.promise()
                i.resolve_promise(p, self.store.get(path, UNDEF))
                return p
            return nf("match", _match)
        if name == "put":
            def _put(i, t, a):
                req, resp = a[0], a[1]
                url = (_str(i, req.js_get("url"))
                       if isinstance(req, HostObject) else _str(i, req))
                from urllib.parse import urlsplit
                self.store[urlsplit(url).path or url] = resp
                p = i.promise()
                i.resolve_promise(p, UNDEF)
                return p
            return nf("put", _put)
        if name == "delete":
            def _del(i, t, a):
                self.store.pop(_str(i, a[0]), None)
                p = i.promise()
                i.resolve_promise(p, True)
                return p
            return nf("delete", _del)
        return UNDEF


class _SWCacheStorage(HostObject):
    def __init__(self):
        self.caches = {}                  # name -> dict

    def js_get(self, name):
        if name == "open":
            def _open(i, t, a):
                cname = _str(i, a[0])
                p = i.promise()
                i.resolve_promise(
                    p, _SWCache(self.caches.setdefault(cname, {})))
                return p
            return nf("open", _open)
        if name == "keys":
            def _keys(i, t, a):
                p = i.promise()
                i.resolve_promise(p, JSArray(list(self.caches.keys())))
                return p
            return nf("keys", _keys)
        if name == "delete":
            def _del(i, t, a):
                existed = self.caches.pop(_str(i, a[0]), None) is not None
                p = i.promise()
                i.resolve_promise(p, existed)
                return p
            return nf("delete", _del)
        if name == "match":
            def _match(i, t, a):
                from urllib.parse import urlsplit
                req = a[0]
                url = (_str(i, req.js_get("url"))
                       if isinstance(req, HostObject) else _str(i, req))
                path = urlsplit(url).path or url
                p = i.promise()
                for store in self.caches.values():
                    if path in store:        # first cache with a hit wins
                        i.resolve_promise(p, store[path])
                        return p
                i.resolve_promise(p, UNDEF)
                return p
            return nf("match", _match)
        return UNDEF


class _SWScope(HostObject):
    def __init__(self):
        self.listeners = {}
        self.skipped_waiting = False
        self.claimed = False

    def js_get(self, name):
        if name == "addEventListener":
            def _ael(i, t, a):
                self.listeners.setdefault(_str(i, a[0]), []).append(a[1])
                return UNDEF
            return nf("addEventListener", _ael)
        if name == "skipWaiting":
            def _sw(i, t, a):
                self.skipped_waiting = True
                p = i.promise()
                i.resolve_promise(p, UNDEF)
                return p
            return nf("skipWaiting", _sw)
        if name == "clients":
            scope = self

            class _Clients(HostObject):
                def js_get(self, cname):
                    if cname == "claim":
                        def _claim(i, t, a):
                            scope.claimed = True
                            p = i.promise()
                            i.resolve_promise(p, UNDEF)
                            return p
                        return nf("claim", _claim)
                    return UNDEF
            return _Clients()
        return UNDEF


class _SWEvent(Event):
    """install/activate/fetch event with waitUntil + respondWith."""

    def __init__(self, type_, request=None):
        super().__init__(type_)
        self.request = request
        self.waited = []                  # promises anchored by waitUntil
        self.response = None              # respondWith operand

    def js_get(self, name):
        if name == "waitUntil":
            def _wu(i, t, a):
                self.waited.append(a[0])
                return UNDEF
            return nf("waitUntil", _wu)
        if name == "respondWith":
            def _rw(i, t, a):
                self.response = a[0]
                return UNDEF
            return nf("respondWith", _rw)
        if name == "request" and self.request is not None:
            return self.request
        return super().js_get(name)


class _SWRequest(HostObject):
    def __init__(self, url, method="GET"):
        self.url = url
        self.method = method

    def js_get(self, name):
        if name == "url":
            return self.url
        if name == "method":
            return self.method
        return UNDEF


class ServiceWorkerHarness:
    """Execute sw.js in a worker-like scope wired to a BrowserSession's
    fetch.  install verifies every SHELL URL actually serves; fetch
    events exercise the cache strategy (reference PWA behavior)."""

    def __init__(self, session: BrowserSession):
        self.session = session
        self.interp = session.interp
        self.scope = _SWScope()
        self.cache_storage = _SWCacheStorage()

    def run(self):
        src = (Path(self.session.loader.static_dir) / "sw.js").read_text()
        from .parser import parse as _parse
        ast = _parse(src, "sw.js")
        sw_scope = Scope(parent=self.interp.globals, is_function=True)
        sw_scope.declare("this", self.scope)
        sw_scope.declare("self", self.scope)
        sw_scope.declare("caches", self.cache_storage)
        sw_scope.declare("clients", self.scope.js_get("clients"))
        self.interp.exec_program(ast, sw_scope)
        self.interp.drain_jobs()

    def _dispatch(self, ev):
        for fn in self.scope.listeners.get(ev.type, []):
            self.interp.call(fn, UNDEF, [ev])
        for p in ev.waited:
            self.interp.await_value(p)
        self.interp.drain_jobs()
        return ev

    def install(self):
        return self._dispatch(_SWEvent("install"))

    def activate(self):
        return self._dispatch(_SWEvent("activate"))

    def fetch(self, url, method="GET"):
        """Returns the FetchResponse the SW responded with, or None when
        the SW let the request pass through to the network."""
        if url.startswith("/"):
            url = self.session.base_url + url
        ev = self._dispatch(_SWEvent("fetch", _SWRequest(url, method)))
        if ev.response is None:
            return None
        return self.interp.await_value(ev.response)


def run_module(path, base_url="http://127.0.0.1:1", fetch_fn=None):
    """Convenience: run one module file inside a fresh BrowserSession."""
    session = BrowserSession(base_url, fetch_fn=fetch_fn)
    module = session.loader.load(str(path))
    session.interp.drain_jobs()
    return session, module
