"""jsrt value model: JS values as thin Python wrappers.

undefined is a singleton sentinel; null is Python None; numbers are
Python int|float (js_str formats them JS-style); strings are Python str;
everything structured is one of the classes below.  Host objects (DOM,
fetch Response, storage) subclass HostObject and expose a js_get /
js_set / js_has protocol the interpreter dispatches to.
"""

from __future__ import annotations

import math


class _Undefined:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __repr__(self):
        return "undefined"

    def __bool__(self):
        return False


UNDEF = _Undefined()


class JSObject:
    __slots__ = ("props", "klass", "privs")

    def __init__(self, props=None, klass=None):
        self.props = props if props is not None else {}
        self.klass = klass                # JSClass for class instances
        self.privs = None                 # private #members (lazy dict)

    def __repr__(self):  # pragma: no cover - debug aid
        inner = ", ".join(f"{k}: {v!r}" for k, v in list(self.props.items())[:6])
        return "{" + inner + ("…" if len(self.props) > 6 else "") + "}"


class JSArray:
    __slots__ = ("items", "props")

    def __init__(self, items=None):
        self.items = items if items is not None else []
        self.props = None                 # expando properties (rare)

    def __repr__(self):  # pragma: no cover
        return f"JSArray({self.items!r})"


class JSClass:
    """An ES class: constructor + method/accessor tables + a parent link.
    Instances are plain JSObjects whose `klass` slot points here; method
    and accessor lookup walks the parent chain, so own props stay the
    only enumerable state (Object.keys / JSON / spread semantics hold)."""

    __slots__ = ("name", "parent", "ctor", "methods", "getters", "setters",
                 "statics", "static_getters", "static_setters", "fields")

    def __init__(self, name, parent=None):
        self.name = name or "<anonymous class>"
        self.parent = parent
        self.ctor = None
        self.methods = {}
        self.getters = {}
        self.setters = {}
        self.statics = {}                 # static methods AND field values
        self.static_getters = {}
        self.static_setters = {}
        self.fields = []                  # (key, init_expr|None, def_env)

    def __repr__(self):  # pragma: no cover - debug aid
        return f"<class {self.name}>"


class JSFunction:
    __slots__ = ("name", "params", "rest", "body", "env", "is_async",
                 "is_arrow", "expr_body", "this_val", "bound_this",
                 "bound_args", "path", "home_class", "is_gen")

    def __init__(self, name, params, rest, body, env, is_async=False,
                 is_arrow=False, expr_body=False, this_val=None, path="<js>"):
        self.name = name or "<anonymous>"
        self.params = params
        self.rest = rest
        self.body = body
        self.env = env
        self.is_async = is_async
        self.is_arrow = is_arrow
        self.expr_body = expr_body
        self.this_val = this_val          # lexical this for arrows
        self.bound_this = None
        self.bound_args = None
        self.path = path
        self.home_class = None            # JSClass for methods (super)
        self.is_gen = False               # function* (generator)


class NativeFunction:
    __slots__ = ("name", "fn", "ctor")

    def __init__(self, name, fn, ctor=None):
        self.name = name
        self.fn = fn                      # fn(interp, this, args) -> value
        self.ctor = ctor                  # optional construct behavior

    def __repr__(self):  # pragma: no cover
        return f"<native {self.name}>"


class BoundFunction:
    __slots__ = ("target", "this_val", "args")

    def __init__(self, target, this_val, args):
        self.target = target
        self.this_val = this_val
        self.args = args


class JSRegExp:
    __slots__ = ("source", "flags", "regex", "last_index")

    def __init__(self, source, flags, regex):
        self.source = source
        self.flags = flags
        self.regex = regex
        self.last_index = 0


class JSPromise:
    __slots__ = ("state", "value", "callbacks", "_handled")

    def __init__(self):
        self.state = "pending"            # pending | fulfilled | rejected
        self.value = UNDEF
        self.callbacks = []               # (on_fulfilled, on_rejected)
        self._handled = False


class JSMap:
    __slots__ = ("entries",)

    def __init__(self):
        self.entries = {}                 # hashable_key -> (orig_key, value)


class JSSet:
    __slots__ = ("entries",)

    def __init__(self):
        self.entries = {}                 # hashable_key -> orig_value


class JSProxy:
    """`new Proxy(target, handler)` — the interpreter's member protocol
    (get/set/has/delete/ownKeys) consults the handler's traps before
    falling through to the target, so Object.keys / for-in / `in` /
    `delete` all route through it; interp.call/construct likewise
    consult the apply/construct traps for callable targets."""

    __slots__ = ("target", "handler")

    def __init__(self, target, handler):
        self.target = target
        self.handler = handler

    def __repr__(self):  # pragma: no cover - debug aid
        return f"JSProxy({self.target!r})"


_SYM_SEQ = 0


class JSSymbol:
    """`Symbol(desc)` — a unique, unforgeable property key. `key` is the
    internal string under which a symbol-keyed property lives in an
    object's props dict; the '@@sym:' prefix keeps such keys out of
    every enumeration path (Object.keys / for-in / spread / JSON —
    interp.js_keys and js_to_py filter on it). Well-known symbols
    (Symbol.iterator) use fixed keys so protocols can test for them."""

    __slots__ = ("desc", "key")

    def __init__(self, desc="", key=None):
        global _SYM_SEQ
        if key is None:
            _SYM_SEQ += 1
            key = f"@@sym:{_SYM_SEQ}"
        self.desc = desc or ""
        self.key = key

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Symbol({self.desc})"


SYM_INTERNAL_PREFIX = "@@sym:"
SYM_ITERATOR_KEY = "@@sym:iterator"


class HostObject:
    """Base for DOM / BOM / fetch objects implemented in Python."""

    def js_get(self, name):
        return UNDEF

    def js_set(self, name, value):
        raise JSThrow.type_error(
            f"cannot set property '{name}' on {type(self).__name__}")

    def js_has(self, name):
        return self.js_get(name) is not UNDEF

    def js_keys(self):
        return []

    def js_delete(self, name):
        pass


class JSThrow(Exception):
    """A JS exception in flight.  .value is the thrown JS value."""

    def __init__(self, value, stack=None):
        super().__init__(repr(value))
        self.value = value
        self.js_stack = stack or []

    @staticmethod
    def error(interp_or_none, kind, message):
        obj = JSObject({"name": kind, "message": message,
                        "stack": f"{kind}: {message}"})
        return JSThrow(obj)

    @staticmethod
    def type_error(message):
        return JSThrow.error(None, "TypeError", message)

    @staticmethod
    def range_error(message):
        return JSThrow.error(None, "RangeError", message)


def map_key(v):
    """Hashable identity for Map/Set keys with JS semantics (SameValueZero
    for primitives, reference identity for objects)."""
    if isinstance(v, (str, bool)) or v is None or v is UNDEF:
        return (type(v).__name__, v)
    if isinstance(v, (int, float)):
        f = float(v)
        if math.isnan(f):
            return ("num", "nan")
        return ("num", f)
    return ("obj", id(v))


def is_callable(v):
    if isinstance(v, (JSFunction, NativeFunction, BoundFunction)):
        return True
    if isinstance(v, JSProxy):            # proxy of a function is callable
        return is_callable(v.target)
    # constructor hosts (Array, Map, …) and callable host objects expose
    # a NativeFunction-compatible .fn
    return isinstance(v, HostObject) and callable(getattr(v, "fn", None))
