"""Static semantic analyzer for the vanilla-ES-module SPA.

No JS engine exists in this image (no node/deno/quickjs, and the
reference's Playwright e2e needs a browser), so the strongest available
gate is semantic static analysis: a real tokenizer plus scope collection
that catches the error classes that have actually broken views before a
user would — references to undefined identifiers (typos, renamed
helpers), duplicate `const`/`let` in one block scope, and destructured
names shadowing the enclosing function (see .claude/skills/verify —
both latter classes broke views in earlier rounds). Runs in CI on every
view (tests/test_frontend.py); replaces nothing once a browser e2e can
run (tests/test_browser_e2e.py self-activates when playwright exists).

Design: conservative where JS is ambiguous. Declarations are collected
LIBERALLY (over-collection ⇒ false negatives, never false positives);
references are skipped in property/key/method positions. The analyzer
targets this repo's SPA idiom (ES modules, no `with`, no eval) rather
than arbitrary JS.
"""

from __future__ import annotations

import dataclasses
import re

# identifiers the browser provides (the SPA's actual global surface)
BROWSER_GLOBALS = frozenset("""
window document navigator location history console fetch setTimeout
setInterval clearTimeout clearInterval requestAnimationFrame
cancelAnimationFrame addEventListener removeEventListener alert confirm
prompt localStorage sessionStorage URL URLSearchParams FormData Headers
Request Response AbortController AbortSignal WebSocket EventSource
CustomEvent Event KeyboardEvent MouseEvent Element HTMLElement Node
NodeList MutationObserver IntersectionObserver ResizeObserver
DOMParser XMLSerializer Blob File FileReader Image Audio AudioContext
MediaSource SourceBuffer Notification performance crypto structuredClone
atob btoa queueMicrotask getComputedStyle matchMedia scrollTo scrollBy
innerWidth innerHeight devicePixelRatio cancelIdleCallback
requestIdleCallback Intl screen frames parent top self globalThis
Promise Array Object String Number Boolean Symbol BigInt Math JSON Date
RegExp Map Set WeakMap WeakSet Proxy Reflect Error TypeError RangeError
SyntaxError EvalError ReferenceError URIError AggregateError
encodeURIComponent decodeURIComponent encodeURI decodeURI parseInt
parseFloat isNaN isFinite NaN Infinity undefined arguments
Int8Array Uint8Array Uint8ClampedArray Int16Array Uint16Array
Int32Array Uint32Array Float32Array Float64Array BigInt64Array
BigUint64Array ArrayBuffer SharedArrayBuffer DataView TextEncoder
TextDecoder ReadableStream WritableStream TransformStream
CompressionStream DecompressionStream clipboard caches indexedDB
ServiceWorker ServiceWorkerRegistration PushManager Worker
BroadcastChannel MessageChannel MessagePort OffscreenCanvas
CanvasRenderingContext2D Path2D ImageData createImageBitmap
AnalyserNode GainNode HTMLCanvasElement SVGElement DOMRect
""".split())

KEYWORDS = frozenset("""
var let const function class return if else for while do switch case
default break continue new delete typeof instanceof in of this super
null true false void yield await async static get set try catch finally
throw import export from as extends with debugger
""".split())

_PUNCT = re.compile(
    r"=>|\.\.\.|\?\.|&&|\|\||\?\?|[+\-*/%&|^<>=!]=|<<|>>>|>>|\+\+|--|"
    r"\*\*|[{}()\[\];,.<>:?~!^&|*/%+=-]")
_IDENT = re.compile(r"[A-Za-z_$][A-Za-z0-9_$]*")
_NUM = re.compile(r"0[xXbBoO][0-9a-fA-F_]+n?|\d[\d_]*(\.[\d_]*)?"
                  r"([eE][+-]?\d+)?n?|\.\d[\d_]*([eE][+-]?\d+)?")
_WS = re.compile(r"\s+")


@dataclasses.dataclass
class Tok:
    kind: str          # ident | kw | punct | num | str | template | regex
    text: str
    line: int


class JsTokenizeError(ValueError):
    pass


def tokenize(src: str) -> list[Tok]:
    """Tokenize ES-module source. Template literals are recursed so
    `${...}` expressions contribute their identifier references."""
    toks: list[Tok] = []
    i, n, line = 0, len(src), 1

    def prev_significant() -> Tok | None:
        return toks[-1] if toks else None

    while i < n:
        c = src[i]
        if c in " \t\r":
            i += 1
            continue
        if c == "\n":
            line += 1
            i += 1
            continue
        if src.startswith("//", i):
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if src.startswith("/*", i):
            j = src.find("*/", i)
            if j < 0:
                raise JsTokenizeError(f"unterminated block comment @L{line}")
            line += src.count("\n", i, j)
            i = j + 2
            continue
        if c in "'\"":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == c:
                    break
                if src[j] == "\n":
                    raise JsTokenizeError(
                        f"newline in string literal @L{line}")
                j += 1
            else:
                raise JsTokenizeError(f"unterminated string @L{line}")
            toks.append(Tok("str", src[i:j + 1], line))
            i = j + 1
            continue
        if c == "`":
            # template literal: emit as one token, but splice the ${}
            # expressions back through the tokenizer
            j = i + 1
            depth_stack = []
            exprs = []
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src.startswith("${", j):
                    k = j + 2
                    d = 1
                    while k < n and d:
                        if src[k] == "{":
                            d += 1
                        elif src[k] == "}":
                            d -= 1
                        elif src[k] in "'\"`":
                            q = src[k]
                            k += 1
                            while k < n and src[k] != q:
                                k += 2 if src[k] == "\\" else 1
                        k += 1
                    exprs.append((src[j + 2:k - 1], line + src.count(
                        "\n", i, j)))
                    j = k
                    continue
                if src[j] == "`":
                    break
                j += 1
            else:
                raise JsTokenizeError(f"unterminated template @L{line}")
            toks.append(Tok("template", src[i:j + 1], line))
            for expr, at in exprs:
                toks.extend(tokenize(expr))
            line += src.count("\n", i, j)
            i = j + 1
            continue
        if c == "/":
            # regex vs division: regex when the previous significant
            # token cannot end an expression
            p = prev_significant()
            is_regex = p is None or (
                p.kind == "punct" and p.text not in (")", "]", "}")) or (
                p.kind == "kw" and p.text not in ("this", "super",
                                                  "true", "false", "null"))
            if is_regex:
                j = i + 1
                in_class = False
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == "[":
                        in_class = True
                    elif src[j] == "]":
                        in_class = False
                    elif src[j] == "/" and not in_class:
                        break
                    elif src[j] == "\n":
                        raise JsTokenizeError(
                            f"unterminated regex @L{line}")
                    j += 1
                else:
                    raise JsTokenizeError(f"unterminated regex @L{line}")
                j += 1
                while j < n and src[j] in "dgimsuvy":
                    j += 1
                toks.append(Tok("regex", src[i:j], line))
                i = j
                continue
        m = _IDENT.match(src, i)
        if m:
            word = m.group(0)
            toks.append(Tok("kw" if word in KEYWORDS else "ident",
                            word, line))
            i = m.end()
            continue
        m = _NUM.match(src, i)
        if m:
            toks.append(Tok("num", m.group(0), line))
            i = m.end()
            continue
        m = _PUNCT.match(src, i)
        if m:
            toks.append(Tok("punct", m.group(0), line))
            i = m.end()
            continue
        raise JsTokenizeError(f"unexpected char {c!r} @L{line}")
    return toks


def _scan_binding(toks: list[Tok], j: int,
                  on_name) -> int:
    """Walk a `const/let/var` declaration from the token after the
    keyword: calls on_name(tok, top_level: bool) for every identifier in
    binding position (multi-declarator `a = 1, b = 2` continues past
    each initializer; destructuring patterns collect at any depth).
    Returns the index where the declaration ends."""
    n = len(toks)
    depth = 0
    in_binding = True            # before the current declarator's '='
    while j < n:
        tj = toks[j]
        if tj.kind == "punct":
            if tj.text in ("[", "{", "("):
                depth += 1
            elif tj.text in ("]", "}", ")"):
                depth -= 1
                if depth < 0:
                    return j
            elif depth == 0 and tj.text == "=":
                in_binding = False
            elif depth == 0 and tj.text == ",":
                in_binding = True
            elif depth == 0 and tj.text == ";":
                return j
        elif tj.kind == "kw" and depth == 0 and tj.text in ("of", "in"):
            return j
        elif tj.kind == "ident" and in_binding:
            on_name(tj, depth == 0)
        j += 1
    return j


def _collect_declarations(toks: list[Tok]) -> set[str]:
    """Every name that is declared ANYWHERE in the module, liberally:
    function/class names, const/let/var bindings (incl. destructuring),
    function/method/arrow parameters, catch params, import bindings."""
    declared: set[str] = set()
    n = len(toks)
    for i, t in enumerate(toks):
        nxt = toks[i + 1] if i + 1 < n else None
        prv = toks[i - 1] if i > 0 else None
        if t.kind == "kw" and t.text in ("function", "class") and nxt:
            # `function f` / `function* f` / `async function* f`
            if nxt.kind == "ident":
                declared.add(nxt.text)
            elif nxt.text == "*" and i + 2 < n \
                    and toks[i + 2].kind == "ident":
                declared.add(toks[i + 2].text)
        if t.kind == "kw" and t.text in ("const", "let", "var"):
            # {a: local} declares local, not a — but shorthand {a}
            # declares a; over-collect both (liberal)
            _scan_binding(toks, i + 1,
                          lambda tok, _top: declared.add(tok.text))
        if t.kind == "kw" and t.text == "catch" and nxt \
                and nxt.text == "(":
            j = i + 2
            while j < n and toks[j].text != ")":
                if toks[j].kind == "ident":
                    declared.add(toks[j].text)
                j += 1
        if t.kind == "punct" and t.text == "=>":
            # arrow params: walk back over the parenthesized list or
            # single identifier
            if prv and prv.kind == "ident":
                declared.add(prv.text)
            elif prv and prv.text == ")":
                d = 0
                j = i - 1
                while j >= 0:
                    tj = toks[j]
                    if tj.text == ")":
                        d += 1
                    elif tj.text == "(":
                        d -= 1
                        if d == 0:
                            break
                    elif tj.kind == "ident":
                        declared.add(tj.text)
                    j -= 1
        if t.text == "(" and prv is not None and i >= 1:
            # function/method parameter lists: function f(...), method
            # shorthand in class/object bodies, function(...) exprs
            head = prv
            is_fn = (head.kind == "kw" and head.text == "function") or (
                head.kind == "ident" and i >= 2
                and toks[i - 2].kind == "kw"
                and toks[i - 2].text == "function") or (
                # generator forms: `function* f(` / `async function* f(`
                head.kind == "ident" and i >= 3
                and toks[i - 2].text == "*"
                and toks[i - 3].kind == "kw"
                and toks[i - 3].text == "function")
            is_method = head.kind == "ident" and i >= 2 \
                and toks[i - 2].kind == "punct" \
                and toks[i - 2].text in ("{", ",", ";", "}")
            if is_fn or is_method:
                d = 1
                j = i + 1
                while j < n and d:
                    tj = toks[j]
                    if tj.text == "(":
                        d += 1
                    elif tj.text == ")":
                        d -= 1
                    elif tj.kind == "ident" and d == 1:
                        declared.add(tj.text)
                    j += 1
    return declared


def _imported_names(toks: list[Tok]) -> set[str]:
    out: set[str] = set()
    n = len(toks)
    i = 0
    while i < n:
        if toks[i].kind == "kw" and toks[i].text == "import":
            j = i + 1
            while j < n and not (toks[j].kind == "kw"
                                 and toks[j].text == "from") \
                    and toks[j].kind != "str":
                tj = toks[j]
                if tj.kind == "ident":
                    out.add(tj.text)
                j += 1
            i = j
        i += 1
    return out


def _is_method_def(toks: list[Tok], i: int) -> bool:
    """True when toks[i] (an ident followed by '(') is a method/function
    shorthand definition — i.e. its parameter list's matching ')' is
    immediately followed by '{'. A plain call in argument position
    (`tile(x, fmtNum(y))`) is followed by ',' or ')' instead."""
    n = len(toks)
    j = i + 1              # the '('
    depth = 0
    while j < n:
        t = toks[j]
        if t.kind == "punct":
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    return j + 1 < n and toks[j + 1].kind == "punct" \
                        and toks[j + 1].text == "{"
        j += 1
    return False


def undefined_references(src: str,
                         extra_globals: set[str] = frozenset()
                         ) -> list[tuple[str, int]]:
    """(name, line) for every identifier referenced but declared nowhere
    in the module, not imported, and not a known browser global."""
    toks = tokenize(src)
    known = (_collect_declarations(toks) | _imported_names(toks)
             | BROWSER_GLOBALS | set(extra_globals))
    bad: list[tuple[str, int]] = []
    n = len(toks)
    skip_decl_region = 0
    for i, t in enumerate(toks):
        if t.kind != "ident":
            continue
        prv = toks[i - 1] if i > 0 else None
        nxt = toks[i + 1] if i + 1 < n else None
        # property access: a.b / a?.b — b is not a reference
        if prv and prv.kind == "punct" and prv.text in (".", "?."):
            continue
        # object key / class member: {a: 1}, {a}, method a() after
        # '{', ',', ';' or line-start in class body
        if nxt and nxt.kind == "punct" and nxt.text == ":" and prv \
                and prv.kind == "punct" and prv.text in ("{", ","):
            continue
        if nxt and nxt.kind == "punct" and nxt.text == "(" and prv \
                and prv.kind == "punct" \
                and prv.text in ("{", ";", ",", "}") \
                and _is_method_def(toks, i):
            continue
        # import clauses already harvested
        if prv and prv.kind == "kw" and prv.text in ("import", "as"):
            continue
        if t.text not in known:
            bad.append((t.text, t.line))
    return bad


def duplicate_block_declarations(src: str) -> list[tuple[str, int]]:
    """(name, line) for a second `const`/`let` of the same name in the
    same brace scope — a SyntaxError at browser load time that brace-
    balance checks cannot see."""
    toks = tokenize(src)
    scopes: list[set[str]] = [set()]
    out: list[tuple[str, int]] = []
    n = len(toks)
    i = 0
    while i < n:
        t = toks[i]
        if t.kind == "punct" and t.text == "{":
            scopes.append(set())
        elif t.kind == "punct" and t.text == "}":
            if len(scopes) > 1:
                scopes.pop()
        elif t.kind == "kw" and t.text in ("const", "let"):
            # for-loop bindings live in the loop's own scope, not the
            # enclosing block: two sibling `for (let h ...)` loops are
            # legal — only dup-check block-level declarations
            in_for_head = i > 0 and toks[i - 1].kind == "punct" \
                and toks[i - 1].text == "("

            def on_name(tok, top_level, _scope=scopes[-1],
                        _skip=in_for_head):
                if not top_level or _skip:
                    return
                if tok.text in _scope:
                    out.append((tok.text, tok.line))
                _scope.add(tok.text)

            i = _scan_binding(toks, i + 1, on_name)
            continue
        i += 1
    return out
