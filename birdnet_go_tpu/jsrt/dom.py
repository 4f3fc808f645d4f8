"""jsrt DOM/BOM shim.

A headless document object model sufficient for the SPA: element tree,
events with bubbling, classList/dataset/style, the selector subset the
views use (tag, .class, #id, [attr], [attr=v], :checked, compound,
descendant, comma), MutationObserver (childList), storage, and media /
canvas stubs.  No layout: geometry queries return fixed boxes.

The el() builder in app.js never uses innerHTML (verified by grep), so
no HTML parser is needed — the shell document is built from index.html
once by a tiny regex-free parser in runner.py.
"""

from __future__ import annotations

from .values import (UNDEF, HostObject, JSArray, JSObject, JSPromise,
                     JSThrow, NativeFunction, is_callable)


def nf(name, fn):
    return NativeFunction(name, fn)


def _s(interp, v):
    from .interp import js_str
    return js_str(v)


# ================================================================ events


class Event(HostObject):
    def __init__(self, type_, target=None, **fields):
        self.type = type_
        self.target = target
        self.current_target = target
        self.fields = fields
        self.default_prevented = False
        self.propagation_stopped = False
        self.immediate_stopped = False

    def js_get(self, name):
        if name == "type":
            return self.type
        if name == "target":
            return self.target if self.target is not None else UNDEF
        if name == "currentTarget":
            return self.current_target if self.current_target is not None \
                else UNDEF
        if name == "preventDefault":
            def _pd(i, t, a):
                self.default_prevented = True
                return UNDEF
            return nf("preventDefault", _pd)
        if name == "stopPropagation":
            def _sp(i, t, a):
                # remaining listeners on the SAME node still run; only
                # the bubble to ancestors stops
                self.propagation_stopped = True
                return UNDEF
            return nf(name, _sp)
        if name == "stopImmediatePropagation":
            def _sip(i, t, a):
                self.propagation_stopped = True
                self.immediate_stopped = True
                return UNDEF
            return nf(name, _sip)
        if name in self.fields:
            return self.fields[name]
        defaults = {"key": "", "clientX": 0, "clientY": 0, "data": "",
                    "detail": 0, "shiftKey": False, "ctrlKey": False,
                    "metaKey": False, "altKey": False, "button": 0,
                    "deltaY": 0, "newURL": "", "oldURL": ""}
        if name in defaults:
            return defaults[name]
        return UNDEF

    def js_set(self, name, value):
        self.fields[name] = value


class EventTargetMixin:
    def _listeners(self):
        if not hasattr(self, "listeners"):
            self.listeners = {}
        return self.listeners

    def add_listener(self, type_, fn):
        self._listeners().setdefault(type_, []).append(fn)

    def remove_listener(self, type_, fn):
        lst = self._listeners().get(type_, [])
        if fn in lst:
            lst.remove(fn)

    def fire(self, interp, event):
        event.current_target = self
        for fn in list(self._listeners().get(event.type, [])):
            interp.call(fn, self, [event])
            if getattr(event, "immediate_stopped", False):
                break


# ================================================================= style


class Style(HostObject):
    def __init__(self):
        self.props = {}

    def js_get(self, name):
        if name == "setProperty":
            def _sp(i, t, a):
                self.props[_s(i, a[0])] = _s(i, a[1])
                return UNDEF
            return nf("setProperty", _sp)
        if name == "removeProperty":
            def _rp(i, t, a):
                self.props.pop(_s(i, a[0]), None)
                return UNDEF
            return nf("removeProperty", _rp)
        if name == "cssText":
            return "; ".join(f"{k}: {v}" for k, v in self.props.items())
        return self.props.get(name, "")

    def js_set(self, name, value):
        from .interp import js_str
        if name == "cssText":
            self.props.clear()
            for part in js_str(value).split(";"):
                if ":" in part:
                    k, v = part.split(":", 1)
                    self.props[k.strip()] = v.strip()
            return
        self.props[name] = js_str(value)


class ClassList(HostObject):
    def __init__(self, element):
        self.element = element

    def _classes(self):
        return [c for c in self.element.attrs.get("class", "").split() if c]

    def _store(self, classes):
        self.element.attrs["class"] = " ".join(classes)

    def js_get(self, name):
        if name == "add":
            def _add(i, t, a):
                cs = self._classes()
                for v in a:
                    v = _s(i, v)
                    if v not in cs:
                        cs.append(v)
                self._store(cs)
                return UNDEF
            return nf("add", _add)
        if name == "remove":
            def _rm(i, t, a):
                names = [_s(i, v) for v in a]
                self._store([c for c in self._classes() if c not in names])
                return UNDEF
            return nf("remove", _rm)
        if name == "toggle":
            def _tg(i, t, a):
                from .interp import js_truthy
                c = _s(i, a[0])
                cs = self._classes()
                if len(a) > 1:
                    want = js_truthy(a[1])
                else:
                    want = c not in cs
                if want and c not in cs:
                    cs.append(c)
                if not want and c in cs:
                    cs.remove(c)
                self._store(cs)
                return want
            return nf("toggle", _tg)
        if name == "contains":
            return nf("contains",
                      lambda i, t, a: _s(i, a[0]) in self._classes())
        if name == "length":
            return len(self._classes())
        return UNDEF


class Dataset(HostObject):
    def __init__(self, element):
        self.element = element

    @staticmethod
    def _attr(name):
        out = []
        for ch in name:
            if ch.isupper():
                out.append("-" + ch.lower())
            else:
                out.append(ch)
        return "data-" + "".join(out)

    def js_get(self, name):
        v = self.element.attrs.get(self._attr(name))
        return v if v is not None else UNDEF

    def js_set(self, name, value):
        from .interp import js_str
        self.element.attrs[self._attr(name)] = js_str(value)

    def js_has(self, name):
        return self._attr(name) in self.element.attrs


# ================================================================= nodes


class Node(HostObject, EventTargetMixin):
    pass


class TextNode(Node):
    def __init__(self, data):
        self.data = data
        self.parent = None

    def js_get(self, name):
        if name == "nodeType":
            return 3
        if name == "textContent" or name == "data" or name == "nodeValue":
            return self.data
        if name == "nodeType":
            return 3
        if name == "parentElement" or name == "parentNode":
            return self.parent if self.parent is not None else None
        if name == "isConnected":
            return _is_connected(self)
        if name == "remove":
            def _remove(i, t, a):
                if self.parent is not None:
                    self.parent.remove_child(i, self)
                return UNDEF
            return nf("remove", _remove)
        return UNDEF

    def js_set(self, name, value):
        from .interp import js_str
        if name in ("textContent", "data", "nodeValue"):
            self.data = js_str(value)
            return
        raise JSThrow.type_error(f"cannot set '{name}' on a text node")


_VOID = {"input", "br", "img", "hr", "meta", "link", "source"}

_SELF_PROPS = {
    "value", "checked", "disabled", "selected", "open", "hidden",
    "scrollTop", "scrollLeft", "currentTime", "paused", "volume", "muted",
    "loop", "playbackRate", "duration", "indeterminate", "readOnly",
    "selectedIndex", "defaultValue", "valueAsNumber",
}


class Element(Node):
    def __init__(self, doc, tag, ns=None):
        self.doc = doc
        self.tag = tag.lower()
        self.ns = ns
        self.attrs = {}
        self.children = []                # Element | TextNode
        self.parent = None
        self.props = {}                   # live DOM properties + expandos
        self.style = Style()
        self.listeners = {}

    # ------------------------------------------------------------ tree ops

    def _adopt(self, interp, child):
        if isinstance(child, (Element, TextNode)):
            if child.parent is not None:
                child.parent.children.remove(child)
            child.parent = self
            self.children.append(child)
        else:
            tn = TextNode(_s(interp, child))
            tn.parent = self
            self.children.append(tn)

    def remove_child(self, interp, child):
        if child in self.children:
            self.children.remove(child)
            child.parent = None
            self.doc.notify_mutation(interp, self)
        return child

    def descendants(self):
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.descendants()

    def text_content(self):
        out = []

        def walk(n):
            for c in n.children:
                if isinstance(c, TextNode):
                    out.append(c.data)
                else:
                    walk(c)
        walk(self)
        return "".join(out)

    # -------------------------------------------------------------- js api

    def js_get(self, name):
        if name in self.props and name not in ("value",):
            return self.props[name]
        if name == "tagName":
            return self.tag.upper()
        if name == "nodeType":
            return 1
        if name == "namespaceURI":
            return self.ns or "http://www.w3.org/1999/xhtml"
        if name == "className":
            return self.attrs.get("class", "")
        if name == "classList":
            return ClassList(self)
        if name == "dataset":
            return Dataset(self)
        if name == "style":
            return self.style
        if name == "id":
            return self.attrs.get("id", "")
        if name == "textContent":
            return self.text_content()
        if name == "children":
            return JSArray([c for c in self.children
                            if isinstance(c, Element)])
        if name == "childNodes":
            return JSArray(list(self.children))
        if name == "firstChild":
            return self.children[0] if self.children else None
        if name == "lastChild":
            return self.children[-1] if self.children else None
        if name == "firstElementChild":
            for c in self.children:
                if isinstance(c, Element):
                    return c
            return None
        if name == "parentElement" or name == "parentNode":
            return self.parent
        if name == "nextSibling" or name == "nextElementSibling":
            if self.parent is None:
                return None
            sibs = (self.parent.children if name == "nextSibling"
                    else [c for c in self.parent.children
                          if isinstance(c, Element)])
            try:
                idx = sibs.index(self)
            except ValueError:
                return None
            return sibs[idx + 1] if idx + 1 < len(sibs) else None
        if name == "isConnected":
            return _is_connected(self)
        if name == "ownerDocument":
            return self.doc
        if name == "value":
            if "value" in self.props:
                return self.props["value"]
            if "value" in self.attrs:
                return self.attrs["value"]
            if self.tag == "select":
                # browsers default selectedIndex to 0 on a non-multiple
                # <select>: .value is the selected (else first) option's
                # value — or its text when it has no value attr — not ""
                opts = [c for c in self.descendants() if c.tag == "option"]
                chosen = next((o for o in opts
                               if o.props.get("selected")
                               or "selected" in o.attrs), None)
                o = chosen or (opts[0] if opts else None)
                if o is not None:
                    if "value" in o.props:
                        return o.props["value"]
                    return o.attrs.get("value", o.text_content())
            return ""
        if name in _SELF_PROPS:
            defaults = {"checked": False, "disabled": False,
                        "selected": False, "open": False, "hidden": False,
                        "scrollTop": 0, "scrollLeft": 0, "currentTime": 0,
                        "paused": True, "volume": 1, "muted": False,
                        "loop": False, "playbackRate": 1, "duration": 30,
                        "indeterminate": False, "readOnly": False,
                        "selectedIndex": 0, "defaultValue": "",
                        "valueAsNumber": 0}
            if name == "checked" and "checked" in self.attrs:
                return True
            return defaults.get(name, UNDEF)
        if name in ("offsetWidth", "clientWidth"):
            return 640
        if name in ("offsetHeight", "clientHeight"):
            return 180
        if name in ("scrollHeight", "scrollWidth"):
            return 1000
        if name in ("href", "src", "title", "type", "placeholder", "name",
                    "min", "max", "step", "rows", "cols", "alt", "role",
                    "lang", "loading", "download", "accept", "action"):
            return self.attrs.get(name.lower(), "")
        if name == "files":
            return self.props.get("files", JSArray([]))
        if name == "options":
            return JSArray([c for c in self.descendants()
                            if c.tag == "option"])
        return self._method(name)

    def _method(self, name):
        if name == "append" or name == "prepend":
            at_start = name == "prepend"

            def _append(i, t, a):
                flat = []
                for v in a:
                    if isinstance(v, JSArray):
                        flat.extend(v.items)
                    else:
                        flat.append(v)
                if at_start:
                    old = self.children
                    self.children = []
                    for v in flat:
                        self._adopt(i, v)
                    self.children.extend(old)
                else:
                    for v in flat:
                        self._adopt(i, v)
                self.doc.notify_mutation(i, self)
                return UNDEF
            return nf(name, _append)
        if name == "appendChild":
            def _ac(i, t, a):
                self._adopt(i, a[0])
                self.doc.notify_mutation(i, self)
                return a[0]
            return nf(name, _ac)
        if name == "insertBefore":
            def _ib(i, t, a):
                node, ref = a[0], a[1] if len(a) > 1 else None
                self._adopt(i, node)
                self.children.remove(node)
                if ref in (None, UNDEF):
                    self.children.append(node)
                else:
                    idx = self.children.index(ref) \
                        if ref in self.children else len(self.children)
                    self.children.insert(idx, node)
                self.doc.notify_mutation(i, self)
                return node
            return nf(name, _ib)
        if name == "after" or name == "before":
            after = name == "after"

            def _adjacent(i, t, a):
                if self.parent is None:
                    return UNDEF
                idx = self.parent.children.index(self) + (1 if after else 0)
                for v in a:
                    if isinstance(v, (Element, TextNode)):
                        if v.parent is not None:
                            v.parent.children.remove(v)
                        v.parent = self.parent
                        node = v
                    else:
                        node = TextNode(_s(i, v))
                        node.parent = self.parent
                    self.parent.children.insert(idx, node)
                    idx += 1
                self.doc.notify_mutation(i, self.parent)
                return UNDEF
            return nf(name, _adjacent)
        if name == "removeChild":
            return nf(name, lambda i, t, a: self.remove_child(i, a[0]))
        if name == "remove":
            def _remove(i, t, a):
                if self.parent is not None:
                    self.parent.remove_child(i, self)
                return UNDEF
            return nf(name, _remove)
        if name == "replaceChildren":
            def _rc(i, t, a):
                for c in list(self.children):
                    c.parent = None
                self.children = []
                flat = []
                for v in a:
                    if isinstance(v, JSArray):
                        flat.extend(v.items)
                    else:
                        flat.append(v)
                for v in flat:
                    self._adopt(i, v)
                self.doc.notify_mutation(i, self)
                return UNDEF
            return nf(name, _rc)
        if name == "setAttribute":
            def _sa(i, t, a):
                self.attrs[_s(i, a[0]).lower()] = _s(i, a[1])
                return UNDEF
            return nf(name, _sa)
        if name == "getAttribute":
            def _ga(i, t, a):
                return self.attrs.get(_s(i, a[0]).lower(), None)
            return nf(name, _ga)
        if name == "removeAttribute":
            def _ra(i, t, a):
                self.attrs.pop(_s(i, a[0]).lower(), None)
                return UNDEF
            return nf(name, _ra)
        if name == "hasAttribute":
            return nf(name, lambda i, t, a:
                      _s(i, a[0]).lower() in self.attrs)
        if name == "toggleAttribute":
            def _ta(i, t, a):
                k = _s(i, a[0]).lower()
                if k in self.attrs:
                    del self.attrs[k]
                    return False
                self.attrs[k] = ""
                return True
            return nf(name, _ta)
        if name == "addEventListener":
            def _ael(i, t, a):
                self.add_listener(_s(i, a[0]), a[1])
                return UNDEF
            return nf(name, _ael)
        if name == "removeEventListener":
            def _rel(i, t, a):
                self.remove_listener(_s(i, a[0]), a[1])
                return UNDEF
            return nf(name, _rel)
        if name == "dispatchEvent":
            def _de(i, t, a):
                ev = a[0]
                if isinstance(ev, Event):
                    ev.target = self
                    dispatch(i, self, ev)
                return True
            return nf(name, _de)
        if name == "click":
            def _click(i, t, a):
                dispatch(i, self, Event("click", self))
                return UNDEF
            return nf(name, _click)
        if name in ("focus", "blur", "select", "scrollIntoView",
                    "requestSubmit", "showModal", "close", "load"):
            if name == "requestSubmit":
                def _rs(i, t, a):
                    dispatch(i, self, Event("submit", self))
                    return UNDEF
                return nf(name, _rs)
            return nf(name, lambda i, t, a: UNDEF)
        if name == "closest":
            def _closest(i, t, a):
                sel = parse_selector(_s(i, a[0]))
                node = self
                while node is not None:
                    if matches(node, sel):
                        return node
                    node = node.parent
                return None
            return nf(name, _closest)
        if name == "matches":
            return nf(name, lambda i, t, a:
                      matches(self, parse_selector(_s(i, a[0]))))
        if name == "contains":
            def _contains(i, t, a):
                target = a[0]
                if target is self:
                    return True
                return any(c is target for c in self.descendants())
            return nf(name, _contains)
        if name == "querySelector":
            def _qs(i, t, a):
                found = select(self, _s(i, a[0]))
                return found[0] if found else None
            return nf(name, _qs)
        if name == "querySelectorAll":
            return nf(name, lambda i, t, a:
                      JSArray(select(self, _s(i, a[0]))))
        if name == "getBoundingClientRect":
            return nf(name, lambda i, t, a: JSObject({
                "left": 0, "top": 0, "right": 640, "bottom": 180,
                "width": 640, "height": 180, "x": 0, "y": 0}))
        if name == "getContext":
            return nf(name, lambda i, t, a: CanvasContext())
        if name == "play":
            def _play(i, t, a):
                self.props["paused"] = False
                p = i.promise()
                i.resolve_promise(p, UNDEF)
                return p
            return nf(name, _play)
        if name == "pause":
            def _pause(i, t, a):
                self.props["paused"] = True
                return UNDEF
            return nf(name, _pause)
        if name == "cloneNode":
            def _clone(i, t, a):
                from .interp import js_truthy
                deep = bool(a) and js_truthy(a[0])
                return _clone_el(self, deep)
            return nf(name, _clone)
        if name == "captureStream" or name == "animate":
            return nf(name, lambda i, t, a: JSObject({}))
        return UNDEF

    def js_set(self, name, value):
        from .interp import js_str, js_truthy, to_number
        if name == "className":
            self.attrs["class"] = js_str(value)
            return
        if name == "id":
            self.attrs["id"] = js_str(value)
            return
        if name == "textContent":
            for c in list(self.children):
                c.parent = None
            self.children = []
            if value is not None and value is not UNDEF and \
                    js_str(value) != "":
                tn = TextNode(js_str(value))
                tn.parent = self
                self.children.append(tn)
            # childList observers must see textContent replacement too
            if getattr(self.doc, "interp", None) is not None:
                self.doc.notify_mutation(self.doc.interp, self)
            return
        if name == "value":
            self.props["value"] = js_str(value)
            return
        if name in ("checked", "disabled", "selected", "open", "hidden",
                    "indeterminate", "muted", "loop", "readOnly"):
            self.props[name] = js_truthy(value)
            return
        if name in ("currentTime", "scrollTop", "scrollLeft", "volume",
                    "playbackRate", "selectedIndex", "valueAsNumber"):
            self.props[name] = to_number(value)
            return
        if name in ("href", "src", "title", "type", "placeholder", "name",
                    "min", "max", "step", "rows", "cols", "alt", "lang",
                    "download", "accept"):
            self.attrs[name.lower()] = js_str(value)
            return
        if name.startswith("on") and (is_callable(value) or value is None):
            # assignment-style handler: replaces the previous one
            etype = name[2:]
            self.listeners[etype] = [] if value is None else [value]
            return
        self.props[name] = value       # expando

    def js_has(self, name):
        return name in self.props or name in self.attrs

    def __repr__(self):  # pragma: no cover
        cls = self.attrs.get("class", "")
        return f"<{self.tag}{'.' + cls if cls else ''}>"


def _clone_el(el, deep):
    c = Element(el.doc, el.tag, el.ns)
    c.attrs = dict(el.attrs)
    c.props = dict(el.props)
    if deep:
        for ch in el.children:
            if isinstance(ch, Element):
                cc = _clone_el(ch, True)
                cc.parent = c
                c.children.append(cc)
            else:
                tn = TextNode(ch.data)
                tn.parent = c
                c.children.append(tn)
    return c


def _is_connected(node):
    n = node
    while n.parent is not None:
        n = n.parent
    return isinstance(n, Element) and n.tag == "html"


def dispatch(interp, target, event):
    """Fire an event at target, then bubble through ancestors, then the
    document itself (document-level listeners see all bubbled events)."""
    node = target
    while node is not None:
        node.fire(interp, event)
        if event.propagation_stopped:
            return
        node = node.parent
    target.doc.fire(interp, event)


# ============================================================== selectors


def parse_selector(src):
    """Parse a selector list into [[compound, ...], ...] where each
    compound is a dict of simple tests and consecutive compounds in one
    list are descendant-combined ('>' marks child combination)."""
    groups = []
    for part in src.split(","):
        chain = []
        tokens = part.replace(">", " > ").split()
        for tok in tokens:
            if tok == ">":
                chain.append(">")
                continue
            chain.append(_parse_compound(tok))
        groups.append(chain)
    return groups


def _parse_compound(tok):
    out = {"tag": None, "classes": [], "id": None, "attrs": [],
           "pseudo": []}
    i = 0
    cur = ""
    mode = "tag"

    def flush():
        nonlocal cur, mode
        if not cur:
            return
        if mode == "tag":
            out["tag"] = cur.lower()
        elif mode == "class":
            out["classes"].append(cur)
        elif mode == "id":
            out["id"] = cur
        elif mode == "pseudo":
            out["pseudo"].append(cur)
        cur = ""

    while i < len(tok):
        c = tok[i]
        if c == ".":
            flush()
            mode = "class"
        elif c == "#":
            flush()
            mode = "id"
        elif c == ":":
            flush()
            mode = "pseudo"
        elif c == "[":
            flush()
            j = tok.index("]", i)
            body = tok[i + 1:j]
            if "=" in body:
                k, v = body.split("=", 1)
                out["attrs"].append((k.lower(), v.strip("'\"")))
            else:
                out["attrs"].append((body.lower(), None))
            i = j
            mode = "tag"
        elif c == "*":
            pass
        else:
            cur += c
        i += 1
    flush()
    return out


def matches(el, groups):
    if not isinstance(el, Element):
        return False
    for chain in groups:
        if _match_chain(el, chain):
            return True
    return False


def _match_chain(el, chain):
    # match last compound against el, then the rest against ancestors
    # WITH backtracking: committing to the nearest matching ancestor is
    # wrong when the chain mixes descendant and '>' combinators
    idx = len(chain) - 1
    if idx < 0 or not _match_compound(el, chain[idx]):
        return False
    return _match_ancestors(el.parent, chain, idx - 1)


def _match_ancestors(node, chain, idx):
    if idx < 0:
        return True
    part = chain[idx]
    if part == ">":
        if idx - 1 < 0 or node is None:
            return False
        if not _match_compound(node, chain[idx - 1]):
            return False
        return _match_ancestors(node.parent, chain, idx - 2)
    n = node
    while n is not None:
        if _match_compound(n, part) \
                and _match_ancestors(n.parent, chain, idx - 1):
            return True
        n = n.parent
    return False


def _match_compound(el, c):
    if not isinstance(el, Element):
        return False
    if c["tag"] and el.tag != c["tag"]:
        return False
    classes = el.attrs.get("class", "").split()
    for cl in c["classes"]:
        if cl not in classes:
            return False
    if c["id"] and el.attrs.get("id") != c["id"]:
        return False
    for k, v in c["attrs"]:
        if k not in el.attrs:
            return False
        if v is not None and el.attrs.get(k) != v:
            return False
    for p in c["pseudo"]:
        if p == "checked":
            if not el.props.get("checked", "checked" in el.attrs):
                return False
        elif p in ("hover", "focus", "active", "focus-within", "visited"):
            return False
        # unknown pseudos (not-*) conservatively pass
    return True


def select(root, src):
    groups = parse_selector(src)
    return [el for el in root.descendants() if matches(el, groups)]


# ================================================================ canvas


class CanvasContext(HostObject):
    def __init__(self):
        self.settings = {}

    def js_get(self, name):
        if name == "measureText":
            return nf(name, lambda i, t, a:
                      JSObject({"width": 8 * len(_s(i, a[0]))}))
        if name == "getImageData":
            return nf(name, lambda i, t, a:
                      JSObject({"data": JSArray([0, 0, 0, 0]),
                                "width": 1, "height": 1}))
        if name == "createLinearGradient" or name == "createRadialGradient":
            return nf(name, lambda i, t, a:
                      JSObject({"addColorStop":
                                nf("addColorStop", lambda i2, t2, a2: UNDEF)}))
        if name in self.settings:
            return self.settings[name]
        return nf(name, lambda i, t, a: UNDEF)

    def js_set(self, name, value):
        self.settings[name] = value


# ============================================================== document


class Document(Node):
    def __init__(self):
        self.doc = self
        self.parent = None
        self.interp = None                # set by the owning session
        self.listeners = {}
        self.root = Element(self, "html")
        self.body = Element(self, "body")
        self.head = Element(self, "head")
        self.root.children = [self.head, self.body]
        self.head.parent = self.root
        self.body.parent = self.root
        self.observers = []                # MutationObserver instances
        self.active_element = None

    def notify_mutation(self, interp, target):
        for obs in self.observers:
            for watched, opts in obs.targets:
                if watched is target or (opts.get("subtree")
                                         and _ancestor_of(watched, target)):
                    obs.pending = True
                    interp.enqueue_micro(lambda o=obs, i=interp: o.flush(i))

    def js_get(self, name):
        if name == "body":
            return self.body
        if name == "head":
            return self.head
        if name == "documentElement":
            return self.root
        if name == "activeElement":
            return self.active_element or self.body
        if name == "nodeType":
            return 9
        if name == "title":
            return "BirdNET-TPU"
        if name == "createElement":
            return nf(name, lambda i, t, a: Element(self, _s(i, a[0])))
        if name == "createElementNS":
            return nf(name, lambda i, t, a:
                      Element(self, _s(i, a[1]), ns=_s(i, a[0])))
        if name == "createTextNode":
            return nf(name, lambda i, t, a: TextNode(_s(i, a[0])))
        if name == "createDocumentFragment":
            return nf(name, lambda i, t, a: Element(self, "fragment"))
        if name == "getElementById":
            def _gid(i, t, a):
                want = _s(i, a[0])
                for el in self.root.descendants():
                    if el.attrs.get("id") == want:
                        return el
                return None
            return nf(name, _gid)
        if name == "querySelector":
            def _qs(i, t, a):
                found = select(self.root, _s(i, a[0]))
                return found[0] if found else None
            return nf(name, _qs)
        if name == "querySelectorAll":
            return nf(name, lambda i, t, a:
                      JSArray(select(self.root, _s(i, a[0]))))
        if name == "addEventListener":
            def _ael(i, t, a):
                self.add_listener(_s(i, a[0]), a[1])
                return UNDEF
            return nf(name, _ael)
        if name == "removeEventListener":
            def _rel(i, t, a):
                self.remove_listener(_s(i, a[0]), a[1])
                return UNDEF
            return nf(name, _rel)
        if name == "hidden":
            return False
        if name == "visibilityState":
            return "visible"
        if name == "readyState":
            return "complete"
        if name == "location":
            return UNDEF   # runner injects `location` as a global
        return UNDEF

    def js_set(self, name, value):
        pass


def _ancestor_of(maybe_ancestor, node):
    n = node
    while n is not None:
        if n is maybe_ancestor:
            return True
        n = n.parent
    return False


class MutationObserver(HostObject):
    def __init__(self, interp, callback):
        self.callback = callback
        self.targets = []
        self.pending = False
        self.active = True

    def flush(self, interp):
        if not self.pending or not self.active:
            return
        self.pending = False
        interp.call(self.callback, UNDEF, [JSArray([]), self])

    def js_get(self, name):
        if name == "observe":
            def _observe(i, t, a):
                target = a[0]
                opts = {}
                if len(a) > 1 and isinstance(a[1], JSObject):
                    from .interp import js_truthy
                    opts = {k: js_truthy(v)
                            for k, v in a[1].props.items()}
                self.targets.append((target, opts))
                if isinstance(target, (Element, Document)):
                    doc = target.doc
                    if self not in doc.observers:
                        doc.observers.append(self)
                return UNDEF
            return nf(name, _observe)
        if name == "disconnect":
            def _disc(i, t, a):
                self.active = False
                for target, _ in self.targets:
                    if isinstance(target, (Element, Document)) \
                            and self in target.doc.observers:
                        target.doc.observers.remove(self)
                self.targets = []
                return UNDEF
            return nf(name, _disc)
        if name == "takeRecords":
            return nf(name, lambda i, t, a: JSArray([]))
        return UNDEF
