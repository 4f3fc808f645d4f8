"""jsrt standard library: globals and prototype method tables.

Only what the SPA's inventory uses, implemented with JS semantics where
they differ from Python (sort comparators, NaN, sparse args, -0 we
ignore).  Every member lookup returns a fresh NativeFunction closure
over the receiver — cheap and keeps the value model free of hidden
state.
"""

from __future__ import annotations

import datetime as _dt
import json as _json
import math
import re
import time
import urllib.parse

from .values import (SYM_INTERNAL_PREFIX, UNDEF, BoundFunction, HostObject,
                     JSArray, JSFunction, JSMap, JSObject, JSPromise,
                     JSProxy, JSRegExp, JSSet, JSSymbol, JSThrow,
                     NativeFunction, is_callable, map_key)


def nf(name, fn):
    return NativeFunction(name, fn)


def _interp_mod():
    from . import interp as _i
    return _i


# ============================================================== regex


def make_regex(source, flags):
    py_flags = 0
    if "i" in flags:
        py_flags |= re.IGNORECASE
    if "m" in flags:
        py_flags |= re.MULTILINE
    if "s" in flags:
        py_flags |= re.DOTALL
    pattern = _js_regex_to_py(source)
    try:
        rx = re.compile(pattern, py_flags)
    except re.error as e:
        raise JSThrow.error(None, "SyntaxError",
                            f"invalid regex /{source}/{flags}: {e}")
    return JSRegExp(source, flags, rx)


def _js_regex_to_py(src):
    # The dialects agree on everything the SPA uses; translate the few
    # notational differences defensively.
    out = []
    i = 0
    while i < len(src):
        c = src[i]
        if c == "\\" and i + 1 < len(src):
            nxt = src[i + 1]
            if nxt == "d" or nxt == "D" or nxt == "w" or nxt == "W" \
                    or nxt == "s" or nxt == "S" or nxt == "b" or nxt == "B":
                out.append(c + nxt)
            elif nxt == "u" and i + 2 < len(src) and src[i + 2] == "{":
                end = src.index("}", i)
                out.append(chr(int(src[i + 3:end], 16)))
                i = end + 1
                continue
            else:
                out.append(c + nxt)
            i += 2
            continue
        if src.startswith("[^]", i):
            out.append(r"[\s\S]")
            i += 3
            continue
        out.append(c)
        i += 1
    return "".join(out)


def regex_member(interp, rx: JSRegExp, name):
    sticky = "g" in rx.flags or "y" in rx.flags

    def _search(s):
        """Search honoring lastIndex for /g regexes (JS semantics: exec
        and test advance lastIndex so while-exec loops terminate)."""
        start = rx.last_index if sticky else 0
        if start > len(s):
            rx.last_index = 0
            return None
        m = rx.regex.search(s, start)
        if m is None:
            if sticky:
                rx.last_index = 0
            return None
        if sticky:
            # zero-width matches still advance (JS moves one forward)
            rx.last_index = m.end() if m.end() > m.start() else m.end() + 1
        return m

    if name == "test":
        return nf("test", lambda i, t, a: _search(_s(a, 0)) is not None)
    if name == "exec":
        def _exec(i, t, a):
            m = _search(_s(a, 0))
            if m is None:
                return None
            arr = JSArray([m.group(0)]
                          + [g if g is not None else UNDEF
                             for g in m.groups()])
            return arr
        return nf("exec", _exec)
    if name == "source":
        return rx.source
    if name == "flags":
        return rx.flags
    if name == "lastIndex":
        return rx.last_index
    return UNDEF


# ============================================================ strings


def _s(args, i, default=""):
    v = args[i] if i < len(args) else UNDEF
    if v is UNDEF:
        return default
    from .interp import js_str
    return js_str(v)


def _n(args, i, default=0):
    from .interp import to_number
    v = args[i] if i < len(args) else UNDEF
    if v is UNDEF:
        return default
    return to_number(v)


def _int_or_none(args, i):
    v = args[i] if i < len(args) else UNDEF
    if v is UNDEF:
        return None
    from .interp import to_number
    n = to_number(v)
    if isinstance(n, float) and math.isnan(n):
        return 0
    return int(n)


def string_member(interp, s: str, name):
    from .interp import js_str, to_number

    if name == "length":
        return len(s)
    if name.lstrip("-").isdigit():
        i = int(name)
        return s[i] if 0 <= i < len(s) else UNDEF

    def m(fname):
        def deco(fn):
            return nf(fname, fn)
        return deco

    if name == "slice":
        def _slice(i, t, a):
            start = _int_or_none(a, 0) or 0
            end = _int_or_none(a, 1)
            return s[slice(start, end)] if end is not None else s[start:]
        return nf("slice", _slice)
    if name == "substring":
        def _sub(i, t, a):
            start = max(0, _int_or_none(a, 0) or 0)
            end = _int_or_none(a, 1)
            end = len(s) if end is None else max(0, end)
            if start > end:
                start, end = end, start
            return s[start:end]
        return nf("substring", _sub)
    if name == "split":
        def _split(i, t, a):
            sep = a[0] if a else UNDEF
            if sep is UNDEF:
                return JSArray([s])
            if isinstance(sep, JSRegExp):
                return JSArray(sep.regex.split(s))
            sep = js_str(sep)
            if sep == "":
                return JSArray(list(s))
            return JSArray(s.split(sep))
        return nf("split", _split)
    if name == "replace" or name == "replaceAll":
        is_all = name == "replaceAll"

        def _replace(i, t, a):
            pat = a[0] if a else UNDEF
            rep = a[1] if len(a) > 1 else UNDEF
            count = 0 if is_all else 1
            if isinstance(pat, JSRegExp):
                count = 0 if ("g" in pat.flags or is_all) else 1
                if is_callable(rep):
                    def pyrep(mo):
                        args = [mo.group(0)] + [g if g is not None else UNDEF
                                                for g in mo.groups()]
                        return js_str(i.call(rep, UNDEF, args
                                             + [mo.start(), s]))
                    return pat.regex.sub(pyrep, s, count=count)
                rs = js_str(rep)
                def dollar(mo):
                    out, j = [], 0
                    while j < len(rs):
                        if rs[j] == "$" and j + 1 < len(rs):
                            c2 = rs[j + 1]
                            if c2 == "&":
                                out.append(mo.group(0))
                                j += 2
                                continue
                            if c2.isdigit():
                                out.append(mo.group(int(c2)) or "")
                                j += 2
                                continue
                            if c2 == "$":
                                out.append("$")
                                j += 2
                                continue
                        out.append(rs[j])
                        j += 1
                    return "".join(out)
                return pat.regex.sub(dollar, s, count=count)
            pstr = js_str(pat)
            if is_callable(rep):
                # scan forward from the end of each replacement so a
                # replacement containing the pattern can't loop forever
                out = []
                pos = 0
                while True:
                    idx = s.find(pstr, pos)
                    if idx < 0:
                        out.append(s[pos:])
                        break
                    out.append(s[pos:idx])
                    out.append(js_str(i.call(rep, UNDEF, [pstr, idx, s])))
                    pos = idx + max(len(pstr), 1)
                    if not is_all:
                        out.append(s[pos:])
                        break
                return "".join(out)
            rs = js_str(rep)
            return s.replace(pstr, rs) if is_all else s.replace(pstr, rs, 1)
        return nf(name, _replace)
    if name == "match":
        def _match(i, t, a):
            pat = a[0]
            if not isinstance(pat, JSRegExp):
                pat = make_regex(js_str(pat), "")
            if "g" in pat.flags:
                # findall would yield group TUPLES for patterns with
                # captures; JS g-match returns whole-match strings
                found = [m.group(0) for m in pat.regex.finditer(s)]
                return JSArray(found) if found else None
            mo = pat.regex.search(s)
            if mo is None:
                return None
            return JSArray([mo.group(0)] + [g if g is not None else UNDEF
                                            for g in mo.groups()])
        return nf("match", _match)
    simple = {
        "toLowerCase": lambda: s.lower(),
        "toUpperCase": lambda: s.upper(),
        "trim": lambda: s.strip(),
        "trimStart": lambda: s.lstrip(),
        "trimEnd": lambda: s.rstrip(),
        "toString": lambda: s,
        "valueOf": lambda: s,
    }
    if name in simple:
        return nf(name, lambda i, t, a, f=simple[name]: f())
    if name == "includes":
        return nf(name, lambda i, t, a: _s(a, 0) in s)
    if name == "startsWith":
        return nf(name, lambda i, t, a: s.startswith(_s(a, 0)))
    if name == "endsWith":
        return nf(name, lambda i, t, a: s.endswith(_s(a, 0)))
    if name == "indexOf":
        return nf(name, lambda i, t, a: s.find(_s(a, 0)))
    if name == "lastIndexOf":
        return nf(name, lambda i, t, a: s.rfind(_s(a, 0)))
    if name == "charAt":
        return nf(name, lambda i, t, a:
                  s[int(_n(a, 0))] if 0 <= int(_n(a, 0)) < len(s) else "")
    if name == "charCodeAt":
        return nf(name, lambda i, t, a:
                  ord(s[int(_n(a, 0))]) if 0 <= int(_n(a, 0)) < len(s)
                  else float("nan"))
    if name == "codePointAt":
        return nf(name, lambda i, t, a:
                  ord(s[int(_n(a, 0))]) if 0 <= int(_n(a, 0)) < len(s)
                  else UNDEF)
    if name == "padStart":
        def _pad(i, t, a):
            width = int(_n(a, 0))
            fill = _s(a, 1, " ") or " "
            out = s
            while len(out) < width:
                out = fill[:max(1, width - len(out))] + out
            return out
        return nf(name, _pad)
    if name == "padEnd":
        def _pade(i, t, a):
            width = int(_n(a, 0))
            fill = _s(a, 1, " ") or " "
            out = s
            while len(out) < width:
                out = out + fill[:max(1, width - len(out))]
            return out
        return nf(name, _pade)
    if name == "repeat":
        return nf(name, lambda i, t, a: s * int(_n(a, 0)))
    if name == "concat":
        return nf(name, lambda i, t, a: s + "".join(_s(a, k)
                                                    for k in range(len(a))))
    if name == "localeCompare":
        def _lc(i, t, a):
            o = _s(a, 0)
            return -1 if s < o else (1 if s > o else 0)
        return nf(name, _lc)
    if name == "at":
        def _at(i, t, a):
            idx = int(_n(a, 0))
            if idx < 0:
                idx += len(s)
            return s[idx] if 0 <= idx < len(s) else UNDEF
        return nf(name, _at)
    if name == "normalize":
        return nf(name, lambda i, t, a: s)
    return UNDEF


# ============================================================= arrays


def array_member(interp, arr: JSArray, name):
    from .interp import js_str, js_strict_eq, js_truthy, to_number
    items = arr.items

    if name == "push":
        def _push(i, t, a):
            items.extend(a)
            return len(items)
        return nf(name, _push)
    if name == "pop":
        return nf(name, lambda i, t, a: items.pop() if items else UNDEF)
    if name == "shift":
        return nf(name, lambda i, t, a: items.pop(0) if items else UNDEF)
    if name == "unshift":
        def _unshift(i, t, a):
            items[0:0] = a
            return len(items)
        return nf(name, _unshift)
    if name == "map":
        def _map(i, t, a):
            fn = a[0]
            return JSArray([i.call(fn, UNDEF, [v, k, arr])
                            for k, v in enumerate(list(items))])
        return nf(name, _map)
    if name == "forEach":
        def _each(i, t, a):
            fn = a[0]
            for k, v in enumerate(list(items)):
                i.call(fn, UNDEF, [v, k, arr])
            return UNDEF
        return nf(name, _each)
    if name == "filter":
        def _filter(i, t, a):
            fn = a[0]
            return JSArray([v for k, v in enumerate(list(items))
                            if js_truthy(i.call(fn, UNDEF, [v, k, arr]))])
        return nf(name, _filter)
    if name == "find":
        def _find(i, t, a):
            fn = a[0]
            for k, v in enumerate(list(items)):
                if js_truthy(i.call(fn, UNDEF, [v, k, arr])):
                    return v
            return UNDEF
        return nf(name, _find)
    if name == "findIndex":
        def _findi(i, t, a):
            fn = a[0]
            for k, v in enumerate(list(items)):
                if js_truthy(i.call(fn, UNDEF, [v, k, arr])):
                    return k
            return -1
        return nf(name, _findi)
    if name == "some":
        def _some(i, t, a):
            fn = a[0]
            return any(js_truthy(i.call(fn, UNDEF, [v, k, arr]))
                       for k, v in enumerate(list(items)))
        return nf(name, _some)
    if name == "every":
        def _every(i, t, a):
            fn = a[0]
            return all(js_truthy(i.call(fn, UNDEF, [v, k, arr]))
                       for k, v in enumerate(list(items)))
        return nf(name, _every)
    if name == "reduce":
        def _reduce(i, t, a):
            fn = a[0]
            seq = list(items)
            if len(a) > 1:
                acc = a[1]
                start = 0
            else:
                if not seq:
                    raise JSThrow.type_error(
                        "reduce of empty array with no initial value")
                acc = seq[0]
                start = 1
            for k in range(start, len(seq)):
                acc = i.call(fn, UNDEF, [acc, seq[k], k, arr])
            return acc
        return nf(name, _reduce)
    if name == "slice":
        def _slice(i, t, a):
            start = _int_or_none(a, 0) or 0
            end = _int_or_none(a, 1)
            return JSArray(items[slice(start, end)] if end is not None
                           else items[start:])
        return nf(name, _slice)
    if name == "splice":
        def _splice(i, t, a):
            start = _int_or_none(a, 0) or 0
            if start < 0:
                start = max(0, len(items) + start)
            dc = _int_or_none(a, 1)
            dc = len(items) - start if dc is None else max(0, dc)
            removed = items[start:start + dc]
            items[start:start + dc] = list(a[2:])
            return JSArray(removed)
        return nf(name, _splice)
    if name == "concat":
        def _concat(i, t, a):
            out = list(items)
            for v in a:
                if isinstance(v, JSArray):
                    out.extend(v.items)
                else:
                    out.append(v)
            return JSArray(out)
        return nf(name, _concat)
    if name == "join":
        def _join(i, t, a):
            sep = _s(a, 0, ",")
            return sep.join("" if (v is None or v is UNDEF) else js_str(v)
                            for v in items)
        return nf(name, _join)
    if name == "includes":
        def _inc(i, t, a):
            target = a[0] if a else UNDEF
            return any(js_strict_eq(v, target) for v in items)
        return nf(name, _inc)
    if name == "indexOf":
        def _idx(i, t, a):
            target = a[0] if a else UNDEF
            for k, v in enumerate(items):
                if js_strict_eq(v, target):
                    return k
            return -1
        return nf(name, _idx)
    if name == "sort":
        def _sort(i, t, a):
            fn = a[0] if a else UNDEF
            if fn is UNDEF or fn is None:
                items.sort(key=lambda v: js_str(v))
            else:
                import functools

                def cmp(x, y):
                    r = to_number(i.call(fn, UNDEF, [x, y]))
                    if isinstance(r, float) and math.isnan(r):
                        return 0
                    return -1 if r < 0 else (1 if r > 0 else 0)
                items.sort(key=functools.cmp_to_key(cmp))
            return arr
        return nf(name, _sort)
    if name == "reverse":
        def _rev(i, t, a):
            items.reverse()
            return arr
        return nf(name, _rev)
    if name == "flat":
        def _flat(i, t, a):
            depth = int(_n(a, 0, 1))

            def go(seq, d):
                out = []
                for v in seq:
                    if isinstance(v, JSArray) and d > 0:
                        out.extend(go(v.items, d - 1))
                    else:
                        out.append(v)
                return out
            return JSArray(go(items, depth))
        return nf(name, _flat)
    if name == "flatMap":
        def _fm(i, t, a):
            fn = a[0]
            out = []
            for k, v in enumerate(list(items)):
                r = i.call(fn, UNDEF, [v, k, arr])
                if isinstance(r, JSArray):
                    out.extend(r.items)
                else:
                    out.append(r)
            return JSArray(out)
        return nf(name, _fm)
    if name == "fill":
        def _fill(i, t, a):
            v = a[0] if a else UNDEF
            start = _int_or_none(a, 1) or 0
            end = _int_or_none(a, 2)
            end = len(items) if end is None else end
            for k in range(start, min(end, len(items))):
                items[k] = v
            return arr
        return nf(name, _fill)
    if name == "keys":
        return nf(name, lambda i, t, a: JSArray(list(range(len(items)))))
    if name == "entries":
        return nf(name, lambda i, t, a:
                  JSArray([JSArray([k, v]) for k, v in enumerate(items)]))
    if name == "values":
        return nf(name, lambda i, t, a: JSArray(list(items)))
    if name == "at":
        def _at(i, t, a):
            idx = int(_n(a, 0))
            if idx < 0:
                idx += len(items)
            return items[idx] if 0 <= idx < len(items) else UNDEF
        return nf(name, _at)
    if name == "lastIndexOf":
        def _lidx(i, t, a):
            target = a[0] if a else UNDEF
            for k in range(len(items) - 1, -1, -1):
                if js_strict_eq(items[k], target):
                    return k
            return -1
        return nf(name, _lidx)
    if name == "toString":
        return nf(name, lambda i, t, a: js_str(arr))
    return UNDEF


# ============================================================ objects


def object_member(interp, obj: JSObject, name):
    from .interp import js_str
    if name == "hasOwnProperty":
        return nf(name, lambda i, t, a: _s(a, 0) in obj.props)
    if name == "toString":
        return nf(name, lambda i, t, a: js_str(obj))
    return UNDEF


def function_member(interp, fn, name):
    if name == "call":
        return nf("call", lambda i, t, a:
                  i.call(fn, a[0] if a else UNDEF, list(a[1:])))
    if name == "apply":
        def _apply(i, t, a):
            this = a[0] if a else UNDEF
            args = a[1].items if len(a) > 1 and isinstance(a[1], JSArray) \
                else []
            return i.call(fn, this, list(args))
        return nf("apply", _apply)
    if name == "bind":
        return nf("bind", lambda i, t, a:
                  BoundFunction(fn, a[0] if a else UNDEF, list(a[1:])))
    if name == "name":
        return getattr(fn, "name", "") or ""
    return UNDEF


def number_member(interp, num, name):
    from .interp import format_number
    if name == "toFixed":
        def _tf(i, t, a):
            digits = int(_n(a, 0))
            return f"{float(num):.{digits}f}"
        return nf(name, _tf)
    if name == "toLocaleString":
        def _tls(i, t, a):
            if isinstance(num, float) and not num.is_integer():
                return f"{num:,.3f}".rstrip("0").rstrip(".")
            return f"{int(num):,}"
        return nf(name, _tls)
    if name == "toString":
        def _ts(i, t, a):
            if a:
                base = int(_n(a, 0, 10))
                n = int(num)
                if base == 16:
                    return format(n, "x")
                if base == 2:
                    return format(n, "b")
                if base == 8:
                    return format(n, "o")
            return format_number(num)
        return nf(name, _ts)
    if name == "toPrecision":
        return nf(name, lambda i, t, a: f"{float(num):.{int(_n(a, 0))}g}")
    if name == "valueOf":
        return nf(name, lambda i, t, a: num)
    return UNDEF


# =========================================================== promises


def promise_member(interp, p: JSPromise, name):
    if name == "then":
        def _then(i, t, a):
            on_f = a[0] if a and is_callable(a[0]) else None
            on_r = a[1] if len(a) > 1 and is_callable(a[1]) else None
            return _chain(i, p, on_f, on_r)
        return nf(name, _then)
    if name == "catch":
        def _catch(i, t, a):
            on_r = a[0] if a and is_callable(a[0]) else None
            return _chain(i, p, None, on_r)
        return nf(name, _catch)
    if name == "finally":
        def _finally(i, t, a):
            fn = a[0] if a else None

            def on_f(v):
                if fn is not None:
                    i.call(fn, UNDEF, [])
                return v

            def on_r(v):
                if fn is not None:
                    i.call(fn, UNDEF, [])
                raise JSThrow(v)
            return _chain_py(i, p, on_f, on_r)
        return nf(name, _finally)
    return UNDEF


def _chain(interp, p, on_f, on_r):
    def f(v):
        return interp.call(on_f, UNDEF, [v]) if on_f is not None else v

    def r(v):
        if on_r is not None:
            return interp.call(on_r, UNDEF, [v])
        raise JSThrow(v)
    return _chain_py(interp, p, f, r)


def _chain_py(interp, p, f, r):
    out = interp.promise()

    def on_fulfilled(v):
        try:
            interp.resolve_promise(out, f(v))
        except JSThrow as t:
            interp.reject_promise(out, t.value)

    def on_rejected(v):
        try:
            interp.resolve_promise(out, r(v))
        except JSThrow as t:
            interp.reject_promise(out, t.value)

    interp.promise_then(p, on_fulfilled, on_rejected)
    return out


# ============================================================ Map/Set


def map_member(interp, m: JSMap, name):
    if name == "get":
        def _get(i, t, a):
            e = m.entries.get(map_key(a[0] if a else UNDEF))
            return e[1] if e else UNDEF
        return nf(name, _get)
    if name == "set":
        def _set(i, t, a):
            k = a[0] if a else UNDEF
            m.entries[map_key(k)] = (k, a[1] if len(a) > 1 else UNDEF)
            return m
        return nf(name, _set)
    if name == "has":
        return nf(name, lambda i, t, a:
                  map_key(a[0] if a else UNDEF) in m.entries)
    if name == "delete":
        return nf(name, lambda i, t, a:
                  m.entries.pop(map_key(a[0] if a else UNDEF), None)
                  is not None)
    if name == "clear":
        def _clear(i, t, a):
            m.entries.clear()
            return UNDEF
        return nf(name, _clear)
    if name == "size":
        return len(m.entries)
    if name == "keys":
        return nf(name, lambda i, t, a:
                  JSArray([k for k, _ in m.entries.values()]))
    if name == "values":
        return nf(name, lambda i, t, a:
                  JSArray([v for _, v in m.entries.values()]))
    if name == "entries":
        return nf(name, lambda i, t, a:
                  JSArray([JSArray([k, v]) for k, v in m.entries.values()]))
    if name == "forEach":
        def _each(i, t, a):
            fn = a[0]
            for k, v in list(m.entries.values()):
                i.call(fn, UNDEF, [v, k, m])
            return UNDEF
        return nf(name, _each)
    return UNDEF


def set_member(interp, s: JSSet, name):
    if name == "add":
        def _add(i, t, a):
            v = a[0] if a else UNDEF
            s.entries[map_key(v)] = v
            return s
        return nf(name, _add)
    if name == "has":
        return nf(name, lambda i, t, a:
                  map_key(a[0] if a else UNDEF) in s.entries)
    if name == "delete":
        return nf(name, lambda i, t, a:
                  s.entries.pop(map_key(a[0] if a else UNDEF), None)
                  is not None)
    if name == "clear":
        def _clear(i, t, a):
            s.entries.clear()
            return UNDEF
        return nf(name, _clear)
    if name == "size":
        return len(s.entries)
    if name == "forEach":
        def _each(i, t, a):
            fn = a[0]
            for v in list(s.entries.values()):
                i.call(fn, UNDEF, [v, v, s])
            return UNDEF
        return nf(name, _each)
    if name == "values" or name == "keys":
        return nf(name, lambda i, t, a: JSArray(list(s.entries.values())))
    return UNDEF


# =============================================================== Date


class JSDate(HostObject):
    def __init__(self, epoch_ms: float):
        self.ms = float(epoch_ms)

    def _dt(self):
        return _dt.datetime.fromtimestamp(self.ms / 1000.0,
                                          tz=_dt.timezone.utc)

    def js_get(self, name):
        if name == "__num__":
            return self.ms
        if name == "getTime" or name == "valueOf":
            return nf(name, lambda i, t, a: self.ms)
        if name == "toISOString":
            def _iso(i, t, a):
                d = self._dt()
                return (d.strftime("%Y-%m-%dT%H:%M:%S.")
                        + f"{d.microsecond // 1000:03d}Z")
            return nf(name, _iso)
        if name == "toLocaleString":
            return nf(name, lambda i, t, a:
                      self._dt().strftime("%b %d, %Y, %H:%M"))
        if name == "toLocaleDateString":
            return nf(name, lambda i, t, a:
                      self._dt().strftime("%b %d, %Y"))
        if name == "toLocaleTimeString":
            return nf(name, lambda i, t, a: self._dt().strftime("%H:%M:%S"))
        if name == "toString" or name == "__str__":
            if name == "__str__":
                return self._dt().strftime("%a %b %d %Y %H:%M:%S GMT+0000")
            return nf(name, lambda i, t, a:
                      self._dt().strftime("%a %b %d %Y %H:%M:%S GMT+0000"))
        getters = {
            "getFullYear": lambda d: d.year,
            "getMonth": lambda d: d.month - 1,
            "getDate": lambda d: d.day,
            "getDay": lambda d: (d.weekday() + 1) % 7,
            "getHours": lambda d: d.hour,
            "getMinutes": lambda d: d.minute,
            "getSeconds": lambda d: d.second,
            "getMilliseconds": lambda d: d.microsecond // 1000,
            "getUTCFullYear": lambda d: d.year,
            "getUTCMonth": lambda d: d.month - 1,
            "getUTCDate": lambda d: d.day,
            "getUTCDay": lambda d: (d.weekday() + 1) % 7,
            "getUTCHours": lambda d: d.hour,
            "getUTCMinutes": lambda d: d.minute,
            "getTimezoneOffset": lambda d: 0,
        }
        if name in getters:
            return nf(name, lambda i, t, a, g=getters[name]: g(self._dt()))
        if name in ("setUTCDate", "setDate"):
            def _setd(i, t, a):
                d = self._dt()
                day = int(_n(a, 0))
                # day may overflow the month (JS rolls over)
                nd = d.replace(day=1) + _dt.timedelta(days=day - 1)
                self.ms = nd.timestamp() * 1000.0
                return self.ms
            return nf(name, _setd)
        if name == "setTime":
            def _sett(i, t, a):
                self.ms = float(_n(a, 0))
                return self.ms
            return nf(name, _sett)
        if name in ("setHours", "setUTCHours"):
            def _seth(i, t, a):
                d = self._dt().replace(
                    hour=int(_n(a, 0)),
                    minute=int(_n(a, 1, self._dt().minute)),
                    second=int(_n(a, 2, self._dt().second)),
                    microsecond=int(_n(a, 3,
                                       self._dt().microsecond // 1000))
                    * 1000)
                self.ms = d.timestamp() * 1000.0
                return self.ms
            return nf(name, _seth)
        return UNDEF


def parse_date(text):
    t = text.strip()
    fmts = [
        "%Y-%m-%dT%H:%M:%S.%f%z", "%Y-%m-%dT%H:%M:%S%z",
        "%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ",
        "%Y-%m-%dT%H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S",
        "%Y-%m-%dT%H:%M", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d %H:%M",
        "%Y-%m-%d", "%Y/%m/%d",
    ]
    if t.endswith("Z"):
        pass
    for f in fmts:
        try:
            d = _dt.datetime.strptime(t, f)
            if d.tzinfo is None:
                d = d.replace(tzinfo=_dt.timezone.utc)
            return d.timestamp() * 1000.0
        except ValueError:
            continue
    return float("nan")


# ===================================================== URLSearchParams


class JSURLSearchParams(HostObject):
    def __init__(self, init=""):
        from .interp import js_str
        self.pairs = []
        if isinstance(init, JSURLSearchParams):
            self.pairs = list(init.pairs)
        elif isinstance(init, JSObject):
            self.pairs = [(k, js_str(v)) for k, v in init.props.items()]
        elif isinstance(init, str) and init:
            q = init[1:] if init.startswith("?") else init
            self.pairs = urllib.parse.parse_qsl(q, keep_blank_values=True)

    def js_get(self, name):
        from .interp import js_str
        if name == "get":
            def _get(i, t, a):
                k = _s(a, 0)
                for pk, pv in self.pairs:
                    if pk == k:
                        return pv
                return None
            return nf(name, _get)
        if name == "getAll":
            return nf(name, lambda i, t, a:
                      JSArray([pv for pk, pv in self.pairs
                               if pk == _s(a, 0)]))
        if name == "set":
            def _set(i, t, a):
                k, v = _s(a, 0), _s(a, 1)
                self.pairs = [(pk, pv) for pk, pv in self.pairs if pk != k]
                self.pairs.append((k, v))
                return UNDEF
            return nf(name, _set)
        if name == "append":
            def _append(i, t, a):
                self.pairs.append((_s(a, 0), _s(a, 1)))
                return UNDEF
            return nf(name, _append)
        if name == "delete":
            def _del(i, t, a):
                k = _s(a, 0)
                self.pairs = [(pk, pv) for pk, pv in self.pairs if pk != k]
                return UNDEF
            return nf(name, _del)
        if name == "has":
            return nf(name, lambda i, t, a:
                      any(pk == _s(a, 0) for pk, pv in self.pairs))
        if name == "toString" or name == "__str__":
            enc = urllib.parse.urlencode(self.pairs)
            if name == "__str__":
                return enc
            return nf(name, lambda i, t, a: enc)
        if name == "entries":
            return nf(name, lambda i, t, a:
                      JSArray([JSArray([k, v]) for k, v in self.pairs]))
        if name == "keys":
            return nf(name, lambda i, t, a:
                      JSArray([k for k, _ in self.pairs]))
        if name == "forEach":
            def _each(i, t, a):
                fn = a[0]
                for k, v in list(self.pairs):
                    i.call(fn, UNDEF, [v, k, self])
                return UNDEF
            return nf(name, _each)
        if name == "__iterate__":
            return lambda i: [JSArray([k, v]) for k, v in self.pairs]
        if name == "size":
            return len(self.pairs)
        return UNDEF


class JSURL(HostObject):
    def __init__(self, href, base=None):
        if base:
            href = urllib.parse.urljoin(base, href)
        self.parts = urllib.parse.urlsplit(href)
        self.href = href

    def js_get(self, name):
        if name == "href":
            return self.href
        if name == "pathname":
            return self.parts.path
        if name == "origin":
            return f"{self.parts.scheme}://{self.parts.netloc}"
        if name == "host":
            return self.parts.netloc
        if name == "hostname":
            return self.parts.hostname or ""
        if name == "protocol":
            return self.parts.scheme + ":"
        if name == "search":
            return ("?" + self.parts.query) if self.parts.query else ""
        if name == "hash":
            return ("#" + self.parts.fragment) if self.parts.fragment else ""
        if name == "searchParams":
            return JSURLSearchParams(self.parts.query)
        if name == "__str__":
            return self.href
        return UNDEF


class JSBlob(HostObject):
    """Blob([parts], {type}) — string parts only; enough for the SPA's
    client-side CSV export through URL.createObjectURL (no byte
    semantics, no streaming)."""

    def __init__(self, parts=None, opts=None):
        from .interp import js_str
        items = parts.items if isinstance(parts, JSArray) else []
        self.data = "".join(
            p.data if isinstance(p, JSBlob) else js_str(p) for p in items)
        self.type = ""
        if isinstance(opts, JSObject):
            t = opts.props.get("type")
            if isinstance(t, str):
                self.type = t

    def js_get(self, name):
        if name == "size":
            return len(self.data)
        if name == "type":
            return self.type
        if name == "text":
            def _text(i, t, a):
                p = i.promise()
                i.resolve_promise(p, self.data)
                return p
            return nf("text", _text)
        return UNDEF


#: object-URL registry — lets tests reach the blob a download pointed at.
#: LAST_OBJECT_URL_BLOB survives revokeObjectURL so a test can inspect a
#: download the page already cleaned up after.
OBJECT_URLS = {}
LAST_OBJECT_URL_BLOB = None


def _create_object_url(blob):
    global LAST_OBJECT_URL_BLOB
    LAST_OBJECT_URL_BLOB = blob
    key = f"blob:jsrt/{len(OBJECT_URLS) + 1}"
    OBJECT_URLS[key] = blob
    return key


# ============================================================= install


def js_instanceof(value, ctor):
    from .values import JSClass
    if isinstance(ctor, JSClass):
        c = getattr(value, "klass", None)
        while c is not None:
            if c is ctor:
                return True
            c = c.parent
        return False
    name = getattr(ctor, "name", None)
    table = {
        "Array": JSArray, "Object": (JSObject, JSArray), "Map": JSMap,
        "Set": JSSet, "Promise": JSPromise, "RegExp": JSRegExp,
        "Date": JSDate, "URLSearchParams": JSURLSearchParams,
        "Function": (JSFunction, NativeFunction, BoundFunction),
    }
    if name in table:
        return isinstance(value, table[name])
    if name in ("Error", "TypeError", "RangeError", "SyntaxError"):
        return isinstance(value, JSObject) and "message" in value.props
    return False


def js_to_py(v):
    """JS value → plain Python (for JSON / host hand-off)."""
    from .interp import UNDEF as U
    if v is U:
        return None
    if isinstance(v, JSProxy):
        # trap-free materialization: JSON sees the target (get traps
        # would need the interpreter; spread the proxy first if they
        # must apply)
        return js_to_py(v.target)
    if isinstance(v, JSArray):
        return [js_to_py(x) for x in v.items]
    if isinstance(v, JSObject):
        return {k: js_to_py(x) for k, x in v.props.items()
                if x is not U and not k.startswith(SYM_INTERNAL_PREFIX)}
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    if isinstance(v, (str, bool, int, float)) or v is None:
        return v
    if isinstance(v, JSDate):
        return v.ms
    return None


def py_to_js(v):
    """Plain Python (json.loads output) → JS value."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, list):
        return JSArray([py_to_js(x) for x in v])
    if isinstance(v, dict):
        return JSObject({str(k): py_to_js(x) for k, x in v.items()})
    return None


def install_globals(interp):
    from .interp import (format_number, js_str, js_truthy, to_number)
    g = interp.globals

    # ------------------------------------------------------------ console
    def console_method(level):
        def _log(i, t, a):
            msg = " ".join(js_str(x) for x in a)
            if level == "error":
                i.console_errors.append(msg)
            return UNDEF
        return nf(level, _log)

    g.declare("console", JSObject({
        "log": console_method("log"), "info": console_method("info"),
        "warn": console_method("warn"), "error": console_method("error"),
        "debug": console_method("debug"),
    }))

    # --------------------------------------------------------------- Math
    def m1(name, fn):
        return nf(name, lambda i, t, a: fn(to_number(_first(a))))

    def _first(a):
        return a[0] if a else UNDEF

    math_obj = JSObject({
        "PI": math.pi, "E": math.e, "LN2": math.log(2),
        "abs": m1("abs", abs),
        "floor": m1("floor", lambda x: math.floor(x)
                    if not _bad(x) else float("nan")),
        "ceil": m1("ceil", lambda x: math.ceil(x)
                   if not _bad(x) else float("nan")),
        "round": m1("round", lambda x: math.floor(x + 0.5)
                    if not _bad(x) else float("nan")),
        "trunc": m1("trunc", lambda x: math.trunc(x)
                    if not _bad(x) else float("nan")),
        "sqrt": m1("sqrt", lambda x: math.sqrt(x) if x >= 0
                   else float("nan")),
        "sign": m1("sign", lambda x: (x > 0) - (x < 0)),
        "log": m1("log", lambda x: math.log(x) if x > 0 else float("-inf")
                  if x == 0 else float("nan")),
        "log2": m1("log2", lambda x: math.log2(x) if x > 0
                   else float("nan")),
        "log10": m1("log10", lambda x: math.log10(x) if x > 0
                    else float("nan")),
        "exp": m1("exp", math.exp),
        "sin": m1("sin", math.sin), "cos": m1("cos", math.cos),
        "tan": m1("tan", math.tan), "atan": m1("atan", math.atan),
        "asin": m1("asin", math.asin), "acos": m1("acos", math.acos),
        "atan2": nf("atan2", lambda i, t, a:
                    math.atan2(to_number(a[0]), to_number(a[1]))),
        "pow": nf("pow", lambda i, t, a:
                  to_number(a[0]) ** to_number(a[1])),
        "hypot": nf("hypot", lambda i, t, a:
                    math.hypot(*[to_number(x) for x in a])),
        "max": nf("max", lambda i, t, a:
                  max([to_number(x) for x in a], default=float("-inf"))),
        "min": nf("min", lambda i, t, a:
                  min([to_number(x) for x in a], default=float("inf"))),
        "random": nf("random", lambda i, t, a: _next_random(i)),
    })
    g.declare("Math", math_obj)

    # --------------------------------------------------------------- JSON
    def _stringify(i, t, a):
        v = a[0] if a else UNDEF
        if v is UNDEF:
            return UNDEF
        indent = None
        if len(a) > 2 and a[2] not in (None, UNDEF):
            sp = a[2]
            indent = int(to_number(sp)) if isinstance(sp, (int, float)) \
                else str(sp)
        return _json.dumps(js_to_py(v), indent=indent,
                           separators=(",", ":") if indent is None
                           else None, ensure_ascii=False)

    def _parse(i, t, a):
        try:
            return py_to_js(_json.loads(_s(a, 0)))
        except (_json.JSONDecodeError, ValueError) as e:
            raise JSThrow.error(None, "SyntaxError",
                                f"JSON.parse: {e}")

    g.declare("JSON", JSObject({"stringify": nf("stringify", _stringify),
                                "parse": nf("parse", _parse)}))

    # ------------------------------------------------------------- Object
    def _keys(i, t, a):
        return JSArray(i.js_keys(a[0] if a else UNDEF))

    def _values(i, t, a):
        o = a[0]
        return JSArray([i.get_member(o, k) for k in i.js_keys(o)])

    def _entries(i, t, a):
        o = a[0]
        return JSArray([JSArray([k, i.get_member(o, k)])
                        for k in i.js_keys(o)])

    def _assign(i, t, a):
        target = a[0]
        for src in a[1:]:
            if src is None or src is UNDEF:
                continue
            for k in i.js_keys(src):
                i.set_member(target, k, i.get_member(src, k))
        return target

    def _from_entries(i, t, a):
        out = {}
        for pair in i.js_iterate(a[0]):
            k, v = pair.items[0], pair.items[1]
            out[js_str(k)] = v
        return JSObject(out)

    g.declare("Object", _ctor_obj("Object", {
        "keys": nf("keys", _keys), "values": nf("values", _values),
        "entries": nf("entries", _entries), "assign": nf("assign", _assign),
        "fromEntries": nf("fromEntries", _from_entries),
        "freeze": nf("freeze", lambda i, t, a: a[0] if a else UNDEF),
    }, ctor=lambda i, a: JSObject()))

    # ----------------------------------------------------- Proxy / Reflect
    def _proxy_ctor(i, a):
        target = a[0] if a else UNDEF
        handler = a[1] if len(a) > 1 else UNDEF
        from .values import JSClass
        if not isinstance(target, (JSObject, JSArray, JSProxy, JSClass,
                                   JSFunction, NativeFunction,
                                   BoundFunction)) \
                or not isinstance(handler, JSObject):
            raise JSThrow.type_error(
                "Cannot create proxy with a non-object as target "
                "or handler")
        return JSProxy(target, handler)

    g.declare("Proxy", _ctor_obj("Proxy", {}, ctor=_proxy_ctor))

    # --------------------------------------------------------------- Symbol
    # Symbol(desc) is call-only (`new Symbol` is a TypeError); Symbol.for
    # interns in a per-realm registry keyed so equal names share one
    # internal property key; well-known Symbol.iterator/asyncIterator use
    # fixed keys the iteration protocol tests for.
    sym_registry: dict[str, JSSymbol] = {}

    def _symbol_call(i, t, a):
        d = "" if not a or a[0] is UNDEF else js_str(a[0])
        return JSSymbol(d)

    def _symbol_for(i, t, a):
        k = js_str(a[0]) if a else "undefined"
        if k not in sym_registry:
            sym_registry[k] = JSSymbol(k, key=f"{SYM_INTERNAL_PREFIX}for:{k}")
        return sym_registry[k]

    def _symbol_keyfor(i, t, a):
        s = a[0] if a else UNDEF
        if isinstance(s, JSSymbol) \
                and s.key.startswith(f"{SYM_INTERNAL_PREFIX}for:"):
            return s.key[len(SYM_INTERNAL_PREFIX) + 4:]
        return UNDEF

    g.declare("Symbol", _ctor_obj("Symbol", {
        "for": nf("for", _symbol_for),
        "keyFor": nf("keyFor", _symbol_keyfor),
        "iterator": JSSymbol("Symbol.iterator",
                             key=f"{SYM_INTERNAL_PREFIX}iterator"),
        "asyncIterator": JSSymbol("Symbol.asyncIterator",
                                  key=f"{SYM_INTERNAL_PREFIX}asyncIterator"),
    }, call=_symbol_call))

    def _r2(fn):                     # (obj, key) operations
        return lambda i, t, a: fn(i, a[0], js_str(a[1]))

    g.declare("Reflect", JSObject({
        "get": nf("get", _r2(lambda i, o, k: i.get_member(o, k))),
        "set": nf("set", lambda i, t, a: (
            i.set_member(a[0], js_str(a[1]), a[2] if len(a) > 2 else UNDEF),
            True)[1]),
        "has": nf("has", _r2(lambda i, o, k: i.js_has(o, k))),
        "deleteProperty": nf("deleteProperty", _r2(
            lambda i, o, k: (i.delete_member(o, k), True)[1])),
        "ownKeys": nf("ownKeys",
                      lambda i, t, a: JSArray(i.js_keys(a[0]))),
    }))

    # -------------------------------------------------------------- Array
    def _is_array(i, t, a):
        return isinstance(a[0] if a else UNDEF, JSArray)

    def _from(i, t, a):
        src = a[0] if a else UNDEF
        if src is None or src is UNDEF:
            items = []
        elif isinstance(src, JSObject) and "length" in src.props:
            items = [UNDEF] * int(to_number(src.props["length"]))
        else:
            items = i.js_iterate(src)
        if len(a) > 1 and is_callable(a[1]):
            items = [i.call(a[1], UNDEF, [v, k])
                     for k, v in enumerate(items)]
        return JSArray(items)

    def _array_ctor(i, a):
        if len(a) == 1 and isinstance(a[0], (int, float)):
            return JSArray([UNDEF] * int(a[0]))
        return JSArray(list(a))

    # Array(n) without `new` behaves exactly like `new Array(n)` (spec)
    g.declare("Array", _ctor_obj("Array", {
        "isArray": nf("isArray", _is_array),
        "from": nf("from", _from),
        "of": nf("of", lambda i, t, a: JSArray(list(a))),
    }, call=lambda i, t, a: _array_ctor(i, a), ctor=_array_ctor))

    # ------------------------------------------------------------- Number
    def _num_call(i, t, a):
        return to_number(a[0]) if a else 0

    num = _ctor_obj("Number", {
        "isFinite": nf("isFinite", lambda i, t, a:
                       isinstance(_first(a), (int, float))
                       and not isinstance(_first(a), bool)
                       and not _bad(float(_first(a)))
                       and not math.isinf(float(_first(a)))),
        "isNaN": nf("isNaN", lambda i, t, a:
                    isinstance(_first(a), float) and math.isnan(_first(a))),
        "isInteger": nf("isInteger", lambda i, t, a:
                        (isinstance(_first(a), int)
                         and not isinstance(_first(a), bool))
                        or (isinstance(_first(a), float)
                            and not _bad(_first(a))
                            and not math.isinf(_first(a))
                            and _first(a).is_integer())),
        "parseFloat": nf("parseFloat", lambda i, t, a: _parse_float(_s(a, 0))),
        "parseInt": nf("parseInt", lambda i, t, a:
                       _parse_int(_s(a, 0), int(_n(a, 1, 10) or 10))),
        "MAX_SAFE_INTEGER": 2**53 - 1,
        "MIN_SAFE_INTEGER": -(2**53 - 1),
        "POSITIVE_INFINITY": float("inf"),
        "NEGATIVE_INFINITY": float("-inf"),
        "EPSILON": 2.220446049250313e-16,
        "NaN": float("nan"),
    }, call=_num_call, ctor=lambda i, a: to_number(a[0]) if a else 0)
    g.declare("Number", num)

    def _string_raw(i, t, a):
        strings = a[0] if a else UNDEF
        raw = None
        if isinstance(strings, JSArray):
            raw = strings.props.get("raw") if strings.props else None
            raw = raw if isinstance(raw, JSArray) else strings
        if raw is None:
            raise JSThrow.type_error("String.raw needs a template object")
        out = []
        for idx, part in enumerate(raw.items):
            out.append(js_str(part))
            if idx + 1 < len(raw.items) and idx + 1 < len(a):
                out.append(js_str(a[idx + 1]))
        return "".join(out)

    g.declare("String", _ctor_obj("String", {
        "fromCharCode": nf("fromCharCode", lambda i, t, a:
                           "".join(chr(int(to_number(x))) for x in a)),
        "raw": nf("raw", _string_raw),
    }, call=lambda i, t, a: js_str(a[0]) if a else "",
        ctor=lambda i, a: js_str(a[0]) if a else ""))

    g.declare("Boolean", _ctor_obj(
        "Boolean", {}, call=lambda i, t, a: js_truthy(a[0]) if a else False,
        ctor=lambda i, a: js_truthy(a[0]) if a else False))

    # ------------------------------------------------------------ Promise
    def _promise_ctor(i, a):
        p = i.promise()
        executor = a[0] if a else UNDEF
        resolve = nf("resolve", lambda ii, t2, a2:
                     (ii.resolve_promise(p, a2[0] if a2 else UNDEF), UNDEF)[1])
        reject = nf("reject", lambda ii, t2, a2:
                    (ii.reject_promise(p, a2[0] if a2 else UNDEF), UNDEF)[1])
        try:
            i.call(executor, UNDEF, [resolve, reject])
        except JSThrow as t:
            i.reject_promise(p, t.value)
        return p

    def _promise_resolve(i, t, a):
        v = a[0] if a else UNDEF
        if isinstance(v, JSPromise):
            return v
        p = i.promise()
        i.resolve_promise(p, v)
        return p

    def _promise_reject(i, t, a):
        p = i.promise()
        i.reject_promise(p, a[0] if a else UNDEF)
        return p

    def _promise_all(i, t, a):
        items = i.js_iterate(a[0]) if a else []
        out = i.promise()
        results = [UNDEF] * len(items)
        remaining = [len(items)]
        if not items:
            i.resolve_promise(out, JSArray([]))
            return out
        for k, item in enumerate(items):
            pk = item if isinstance(item, JSPromise) else None

            def on_f(v, k=k):
                results[k] = v
                remaining[0] -= 1
                if remaining[0] == 0:
                    i.resolve_promise(out, JSArray(results))

            def on_r(v):
                i.reject_promise(out, v)
            if pk is None:
                on_f(item)
            else:
                i.promise_then(pk, on_f, on_r)
        return out

    def _promise_all_settled(i, t, a):
        items = i.js_iterate(a[0]) if a else []
        out = i.promise()
        results = [UNDEF] * len(items)
        remaining = [len(items)]
        if not items:
            i.resolve_promise(out, JSArray([]))
            return out
        for k, item in enumerate(items):
            def settle(k=k):
                remaining[0] -= 1
                if remaining[0] == 0:
                    i.resolve_promise(out, JSArray(results))

            def on_f(v, k=k):
                results[k] = JSObject({"status": "fulfilled", "value": v})
                settle(k)

            def on_r(v, k=k):
                results[k] = JSObject({"status": "rejected", "reason": v})
                settle(k)
            if isinstance(item, JSPromise):
                i.promise_then(item, on_f, on_r)
            else:
                on_f(item)
        return out

    g.declare("Promise", _ctor_obj("Promise", {
        "resolve": nf("resolve", _promise_resolve),
        "reject": nf("reject", _promise_reject),
        "all": nf("all", _promise_all),
        "allSettled": nf("allSettled", _promise_all_settled),
    }, ctor=_promise_ctor))

    # ------------------------------------------------------------ Map/Set
    def _map_ctor(i, a):
        m = JSMap()
        if a and a[0] not in (None, UNDEF):
            for pair in i.js_iterate(a[0]):
                m.entries[map_key(pair.items[0])] = (pair.items[0],
                                                     pair.items[1])
        return m

    def _set_ctor(i, a):
        s = JSSet()
        if a and a[0] not in (None, UNDEF):
            for v in i.js_iterate(a[0]):
                s.entries[map_key(v)] = v
        return s

    g.declare("Map", _ctor_obj("Map", {}, ctor=_map_ctor))
    g.declare("Set", _ctor_obj("Set", {}, ctor=_set_ctor))
    g.declare("WeakMap", _ctor_obj("WeakMap", {}, ctor=lambda i, a: JSMap()))

    # --------------------------------------------------------------- Date
    def _date_ctor(i, a):
        if not a:
            return JSDate(time.time() * 1000.0)
        if len(a) == 1:
            v = a[0]
            if isinstance(v, str):
                return JSDate(parse_date(v))
            if isinstance(v, JSDate):
                return JSDate(v.ms)
            return JSDate(to_number(v))
        year = int(to_number(a[0]))
        month = int(to_number(a[1])) if len(a) > 1 else 0
        day = int(to_number(a[2])) if len(a) > 2 else 1
        hour = int(to_number(a[3])) if len(a) > 3 else 0
        minute = int(to_number(a[4])) if len(a) > 4 else 0
        sec = int(to_number(a[5])) if len(a) > 5 else 0
        base = _dt.datetime(year, 1, 1, tzinfo=_dt.timezone.utc)
        base += _dt.timedelta(days=day - 1, hours=hour, minutes=minute,
                              seconds=sec)
        # month arithmetic with overflow
        m_total = month
        y_extra, m_norm = divmod(m_total, 12)
        base = base.replace(year=year + y_extra)
        try:
            base = base.replace(month=m_norm + 1)
        except ValueError:
            base = base.replace(month=1)
        return JSDate(base.timestamp() * 1000.0)

    g.declare("Date", _ctor_obj("Date", {
        "now": nf("now", lambda i, t, a: time.time() * 1000.0),
        "parse": nf("parse", lambda i, t, a: parse_date(_s(a, 0))),
    }, ctor=_date_ctor))

    # ------------------------------------------------------------- RegExp
    g.declare("RegExp", _ctor_obj("RegExp", {}, ctor=lambda i, a:
              make_regex(_s(a, 0), _s(a, 1))))

    # --------------------------------------------------------------- URL*
    g.declare("URLSearchParams", _ctor_obj(
        "URLSearchParams", {},
        ctor=lambda i, a: JSURLSearchParams(a[0] if a else "")))
    g.declare("URL", _ctor_obj("URL", {
        "createObjectURL": nf(
            "createObjectURL",
            lambda i, t, a: _create_object_url(a[0] if a else UNDEF)),
        "revokeObjectURL": nf(
            "revokeObjectURL",
            lambda i, t, a: (OBJECT_URLS.pop(_s(a, 0), None), UNDEF)[1]),
    }, ctor=lambda i, a:
              JSURL(_s(a, 0), _s(a, 1, None) if len(a) > 1 else None)))
    g.declare("Blob", _ctor_obj(
        "Blob", {}, ctor=lambda i, a: JSBlob(
            a[0] if a else None, a[1] if len(a) > 1 else None)))

    # ------------------------------------------------------------- errors
    for ename in ("Error", "TypeError", "RangeError", "SyntaxError",
                  "ReferenceError"):
        def _err_ctor(i, a, ename=ename):
            msg = _s(a, 0)
            return JSObject({"name": ename, "message": msg,
                             "stack": f"{ename}: {msg}"})
        g.declare(ename, _ctor_obj(ename, {},
                                   call=lambda i, t, a, e=ename:
                                   _err_ctor(i, a, e),
                                   ctor=_err_ctor))

    # ------------------------------------------------------------ numeric
    g.declare("NaN", float("nan"))
    g.declare("Infinity", float("inf"))
    g.declare("undefined", UNDEF)
    g.declare("parseInt", nf("parseInt", lambda i, t, a:
                             _parse_int(_s(a, 0), int(_n(a, 1, 10) or 10))))
    g.declare("parseFloat", nf("parseFloat",
                               lambda i, t, a: _parse_float(_s(a, 0))))
    g.declare("isNaN", nf("isNaN", lambda i, t, a:
                          _bad(to_number(a[0] if a else UNDEF))))
    g.declare("isFinite", nf("isFinite", lambda i, t, a:
                             not _bad(to_number(_first(a)))
                             and not math.isinf(to_number(_first(a)))))
    g.declare("encodeURIComponent", nf(
        "encodeURIComponent",
        lambda i, t, a: urllib.parse.quote(_s(a, 0), safe="!'()*-._~")))
    g.declare("decodeURIComponent", nf(
        "decodeURIComponent", lambda i, t, a: urllib.parse.unquote(_s(a, 0))))
    g.declare("structuredClone", nf(
        "structuredClone", lambda i, t, a: py_to_js(js_to_py(_first(a)))))

    # -------------------------------------------------------------- timers
    def _set_timeout(i, t, a):
        fn = a[0] if a else UNDEF
        delay = _n(a, 1, 0)
        extra = list(a[2:])
        return i.set_timer(lambda: i.call(fn, UNDEF, extra), delay)

    def _set_interval(i, t, a):
        fn = a[0] if a else UNDEF
        delay = _n(a, 1, 0)
        return i.set_timer(lambda: i.call(fn, UNDEF, []), delay,
                           interval=True)

    g.declare("setTimeout", nf("setTimeout", _set_timeout))
    g.declare("setInterval", nf("setInterval", _set_interval))
    g.declare("clearTimeout", nf("clearTimeout", lambda i, t, a:
                                 (i.clear_timer(int(_n(a, 0, -1))), UNDEF)[1]
                                 if a and a[0] not in (None, UNDEF)
                                 else UNDEF))
    g.declare("clearInterval", nf("clearInterval", lambda i, t, a:
                                  (i.clear_timer(int(_n(a, 0, -1))),
                                   UNDEF)[1]
                                  if a and a[0] not in (None, UNDEF)
                                  else UNDEF))
    g.declare("queueMicrotask", nf(
        "queueMicrotask",
        lambda i, t, a: (i.enqueue_micro(
            lambda fn=a[0]: i.call(fn, UNDEF, [])), UNDEF)[1]))
    g.declare("requestAnimationFrame", nf(
        "requestAnimationFrame",
        lambda i, t, a: i.set_timer(
            lambda fn=a[0]: i.call(fn, UNDEF, [16.7]), 16)))
    g.declare("cancelAnimationFrame", nf(
        "cancelAnimationFrame",
        lambda i, t, a: (i.clear_timer(int(_n(a, 0, -1))), UNDEF)[1]))


def _ctor_obj(name, statics, call=None, ctor=None):
    fn = NativeFunction(
        name,
        call or (lambda i, t, a: (_ for _ in ()).throw(
            JSThrow.type_error(f"{name} requires new"))),
        ctor=ctor)
    obj = _CtorHost(name, fn, statics)
    return obj


class _CtorHost(HostObject):
    """A constructor: callable, constructible, with static members."""

    def __init__(self, name, fn, statics):
        self.name = name
        self.fn = fn.fn
        self.ctor = fn.ctor
        self.statics = statics

    def js_get(self, name):
        if name in self.statics:
            return self.statics[name]
        if name == "name":
            return self.name
        return UNDEF

    def js_has(self, name):
        return name in self.statics


# _CtorHost must be callable/constructible through the interpreter's
# dispatch: register it as both NativeFunction-like and HostObject.
# Simplest: teach is_callable/call about it via duck typing below.


def _bad(x):
    return isinstance(x, float) and math.isnan(x)


def _parse_int(s, radix=10):
    s = s.strip()
    neg = s.startswith("-")
    if s[:1] in "+-":
        s = s[1:]
    if s[:2].lower() == "0x" and radix in (10, 16):
        # JS auto-detects the 0x prefix with the default radix
        radix = 16
        s = s[2:]
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:radix]
    out = 0
    seen = False
    for c in s.lower():
        if c not in digits:
            break
        out = out * radix + digits.index(c)
        seen = True
    if not seen:
        return float("nan")
    return -out if neg else out


def _parse_float(s):
    s = s.strip()
    m = re.match(r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?", s)
    if not m:
        return float("nan")
    f = float(m.group(0))
    return int(f) if f.is_integer() and "e" not in m.group(0).lower() \
        and "." not in m.group(0) else f


_rand_state = [0x9E3779B97F4A7C15]


def _next_random(interp):
    # deterministic LCG: CI runs must be reproducible
    _rand_state[0] = (_rand_state[0] * 6364136223846793005 + 1442695040888963407) % 2**64
    return (_rand_state[0] >> 11) / float(2**53)
