"""jsrt tree-walking evaluator.

Single-threaded with an explicit job queue: microtasks (promise
reactions) and virtual-time timers.  `await` drives the queue inline —
sound here because the host fetch is synchronous under the hood — so an
await that can never settle is detected and reported as a deadlock
instead of hanging CI.
"""

from __future__ import annotations

import math
import queue
import threading

from .values import (SYM_INTERNAL_PREFIX, SYM_ITERATOR_KEY, UNDEF,
                     BoundFunction, HostObject, JSArray, JSClass,
                     JSFunction, JSMap, JSObject, JSPromise, JSProxy,
                     JSRegExp, JSSet, JSSymbol, JSThrow, NativeFunction,
                     is_callable, map_key)


def prop_key(v):
    """ToPropertyKey for computed member access: symbols map to their
    unique internal '@@sym:' string, everything else stringifies."""
    return v.key if isinstance(v, JSSymbol) else js_str(v)


class _ShortCircuit:
    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst


_SC = _ShortCircuit()


def _is_priv_name(name) -> bool:
    """#ident-shaped member name (the only shape the lexer's privid
    token produces) — distinguishes private members from ordinary
    '#'-prefixed string keys arriving via computed access."""
    return (isinstance(name, str) and len(name) > 1 and name[0] == "#"
            and (name[1].isalpha() or name[1] in "_$"))


class BreakEx(Exception):
    def __init__(self, label=None):
        self.label = label


class ContinueEx(Exception):
    def __init__(self, label=None):
        self.label = label


class ReturnEx(Exception):
    def __init__(self, value):
        self.value = value


class DeadlockError(RuntimeError):
    pass


class JSGenerator:
    """A `function*` instance. The body runs on a dedicated daemon thread
    with strict two-queue handoff (queues of size 1, strict alternation),
    so exactly ONE of caller/body ever executes — JS single-thread
    semantics hold and the recursive tree-walk suspends for free at any
    depth. Interpreter positional state (cur_path/cur_line/call_stack) is
    swapped around each handoff so suspension never leaks frames into the
    caller's stack traces."""

    def __init__(self, interp, fn, scope):
        self.interp = interp
        self.fn = fn
        self.scope = scope
        self.done = False
        self._started = False
        self._to_gen = queue.Queue(1)
        self._from_gen = queue.Queue(1)
        self._thread = None
        self._stack = []
        self._pos = (fn.path, 0)

    # ---- body side (generator thread) ----

    def _body(self):
        it = self.interp
        it._gen_tl.gen = self
        try:
            cmd, val = self._to_gen.get()
            if cmd == "return":
                self._from_gen.put(("return", val))
                return
            if cmd == "throw":
                self._from_gen.put(("throw", val))
                return
            ret = it._run_body(self.fn, self.scope)
            self._from_gen.put(("return", ret))
        except ReturnEx as r:
            self._from_gen.put(("return", r.value))
        except JSThrow as t:
            self._from_gen.put(("throw", t))
        except BaseException as e:      # interpreter bug — surface it
            self._from_gen.put(("pyerr", e))

    def _yield(self, value):
        self._from_gen.put(("yield", value))
        cmd, val = self._to_gen.get()
        if cmd == "throw":
            raise val if isinstance(val, JSThrow) else JSThrow(val)
        if cmd == "return":
            raise ReturnEx(val)         # unwinds through JS finally blocks
        return val

    # ---- caller side ----

    def _resume(self, cmd, val):
        it = self.interp
        if self.done:
            if cmd == "throw":
                raise val if isinstance(val, JSThrow) else JSThrow(val)
            return ("return", val if cmd == "return" else UNDEF)
        if self._thread is not None \
                and threading.current_thread() is self._thread:
            raise JSThrow.type_error("generator is already running")
        if not self._started:
            self._started = True
            if cmd == "return":         # closing an unstarted generator
                self.done = True
                return ("return", val)
            self._thread = threading.Thread(
                target=self._body, daemon=True,
                name=f"jsgen-{self.fn.name}")
            self._thread.start()
        saved = (it.cur_path, it.cur_line, it.call_stack)
        it.cur_path, it.cur_line = self._pos
        it.call_stack = self._stack
        try:
            self._to_gen.put((cmd, val))
            kind, out = self._from_gen.get()
        finally:
            self._pos = (it.cur_path, it.cur_line)
            self._stack = it.call_stack
            it.cur_path, it.cur_line, it.call_stack = saved
        if kind == "pyerr":
            self.done = True
            raise out
        if kind == "throw":
            self.done = True
            raise out
        if kind == "return":
            self.done = True
        return (kind, out)

    def js_next(self, value=UNDEF):
        kind, out = self._resume("next", value)
        o = JSObject()
        o.props["value"] = out
        o.props["done"] = kind == "return"
        return o

    def js_return(self, value=UNDEF):
        kind, out = self._resume("return", value)
        o = JSObject()
        o.props["value"] = out
        o.props["done"] = True
        return o

    def js_throw(self, value):
        kind, out = self._resume(
            "throw", value if isinstance(value, JSThrow) else JSThrow(value))
        o = JSObject()
        o.props["value"] = out
        o.props["done"] = kind == "return"
        return o


class JSAsyncGenerator:
    """An `async function*` instance. Wraps the thread-suspended
    JSGenerator; next/return/throw hand back ALREADY-SETTLED promises.
    That is sound here because this interpreter's `await` drives the job
    queue synchronously (await_value): the body may await between yields
    — running microtasks/timers on the generator thread while the caller
    is parked on the handoff queue — and has always produced (or thrown)
    its step result by the time control returns to the caller."""

    __slots__ = ("gen",)

    def __init__(self, gen):
        self.gen = gen


class Scope:
    __slots__ = ("vars", "parent", "is_function", "consts")

    def __init__(self, parent=None, is_function=False):
        self.vars = {}
        self.parent = parent
        self.is_function = is_function
        self.consts = None                # names declared const (lazy)

    def declare(self, name, value=UNDEF, const=False):
        self.vars[name] = value
        if const:
            if self.consts is None:
                self.consts = set()
            self.consts.add(name)
        elif self.consts is not None:
            self.consts.discard(name)

    def declare_var(self, name):
        s = self
        while not s.is_function and s.parent is not None:
            s = s.parent
        if name not in s.vars:
            s.vars[name] = UNDEF

    def lookup(self, name):
        s = self
        while s is not None:
            if name in s.vars:
                return s
            s = s.parent
        return None

    def get(self, name):
        s = self.lookup(name)
        if s is None:
            raise JSThrow.error(None, "ReferenceError",
                                f"{name} is not defined")
        return s.vars[name]

    def set(self, name, value):
        s = self.lookup(name)
        if s is None:
            # sloppy-mode global write; keep it an error — the SPA is
            # module code where this would be a ReferenceError
            raise JSThrow.error(None, "ReferenceError",
                                f"{name} is not defined")
        if s.consts is not None and name in s.consts:
            raise JSThrow.type_error(
                f"assignment to constant variable '{name}'")
        s.vars[name] = value


class Interp:
    def __init__(self, global_scope: Scope | None = None):
        import sys

        from . import builtins as _b
        # each JS frame costs ~15 Python frames: the 400-frame JS guard
        # in call() needs ~6k Python frames of headroom or Python's own
        # RecursionError escapes as a raw crash before the JS RangeError
        if sys.getrecursionlimit() < 20_000:
            sys.setrecursionlimit(20_000)
        self.globals = global_scope or Scope(is_function=True)
        self.microtasks = []              # list of (fn,) thunks
        self.timers = {}                  # id -> (due, fn, interval_ms|None)
        self._timer_seq = 0
        self._vclock = 0.0
        self.call_stack = []              # (fn_name, path, line)
        self.cur_line = 0
        self.cur_path = "<js>"
        self.console_errors = []          # harness asserts this is empty
        self.rejected = []                # (promise, value) unhandled so far
        self._gen_tl = threading.local()  # generator owning this thread
        self._b = _b
        _b.install_globals(self)

    # ========================================================== job queue

    def enqueue_micro(self, fn):
        self.microtasks.append(fn)

    def set_timer(self, fn, delay_ms, interval=False):
        self._timer_seq += 1
        tid = self._timer_seq
        self.timers[tid] = [self._vclock + max(0.0, float(delay_ms)), fn,
                            float(delay_ms) if interval else None]
        return tid

    def clear_timer(self, tid):
        self.timers.pop(tid, None)

    LOOP_BUDGET = 2_000_000   # per single loop execution

    def _loop_tick(self, iters):
        """Iteration budget for while/for/dowhile: an accidental infinite
        loop in a view must fail the always-on CI gate with a
        DeadlockError, not hang it (advisor r4). The budget is per loop
        execution, mirroring run_microtasks' queue limit."""
        iters += 1
        if iters > self.LOOP_BUDGET:
            raise DeadlockError(
                f"loop at {self.cur_path}:{self.cur_line} exceeded "
                f"{self.LOOP_BUDGET} iterations")
        return iters

    def run_microtasks(self, limit=100_000):
        n = 0
        while self.microtasks:
            fn = self.microtasks.pop(0)
            fn()
            n += 1
            if n > limit:
                raise DeadlockError("microtask queue never drained")
        return n

    def fire_next_timer(self):
        """Advance virtual time to the next timer and fire it."""
        if not self.timers:
            return False
        tid = min(self.timers, key=lambda t: (self.timers[t][0], t))
        due, fn, interval = self.timers[tid]
        self._vclock = max(self._vclock, due)
        if interval is None:
            del self.timers[tid]
        else:
            self.timers[tid][0] = self._vclock + interval
        fn()
        return True

    def drain_jobs(self, max_timer_fires=8, settle_ms=1000.0):
        """Post-render settle: microtasks to exhaustion, then a bounded
        number of timer fires (intervals would otherwise run forever).

        Only timers due within `settle_ms` of virtual time fire — a real
        browser does not run a 4 s toast-removal timeout in the immediate
        aftermath of a click, and neither should the harness.  An `await`
        inside a handler still drives long timers through await_value's
        own loop, so sleeps longer than the horizon cannot deadlock."""
        self.run_microtasks()
        horizon = self._vclock + settle_ms
        fires = 0
        while self.timers and fires < max_timer_fires:
            tid = min(self.timers, key=lambda t: (self.timers[t][0], t))
            if self.timers[tid][0] > horizon:
                break
            if not self.fire_next_timer():
                break
            self.run_microtasks()
            fires += 1

    # ========================================================== promises

    def promise(self):
        return JSPromise()

    def resolve_promise(self, p: JSPromise, value):
        if p.state != "pending":
            return
        if isinstance(value, JSPromise):
            self._adopt(p, value)
            return
        p.state = "fulfilled"
        p.value = value
        self._flush_promise(p)

    def reject_promise(self, p: JSPromise, value):
        if p.state != "pending":
            return
        p.state = "rejected"
        p.value = value
        if not getattr(p, "_handled", False) and not p.callbacks:
            self.rejected.append((p, value))
        self._flush_promise(p)

    def _adopt(self, outer, inner):
        def on_f(v):
            self.resolve_promise(outer, v)

        def on_r(v):
            self.reject_promise(outer, v)

        self.promise_then(inner, on_f, on_r)

    def _flush_promise(self, p):
        cbs, p.callbacks = p.callbacks, []
        for on_f, on_r in cbs:
            if p.state == "fulfilled":
                self.enqueue_micro(lambda v=p.value, f=on_f: f(v))
            else:
                self.enqueue_micro(lambda v=p.value, r=on_r: r(v))

    def promise_then(self, p: JSPromise, on_f, on_r):
        """Register python callbacks; returns nothing."""
        p._handled = True
        self.rejected = [(q, v) for q, v in self.rejected if q is not p]
        if p.state == "pending":
            p.callbacks.append((on_f, on_r))
        elif p.state == "fulfilled":
            self.enqueue_micro(lambda v=p.value: on_f(v))
        else:
            self.enqueue_micro(lambda v=p.value: on_r(v))

    def await_value(self, value):
        """`await expr` — drive the job queue until the promise settles."""
        if isinstance(value, JSPromise):
            value._handled = True
            self.rejected = [(q, v) for q, v in self.rejected
                             if q is not value]
        if not isinstance(value, JSPromise):
            self.run_microtasks()
            return value
        while value.state == "pending":
            if self.microtasks:
                self.run_microtasks()
                continue
            if self.timers and self.fire_next_timer():
                continue
            raise DeadlockError(
                f"await at {self.cur_path}:{self.cur_line} can never "
                "settle (no pending jobs)")
        if value.state == "rejected":
            raise JSThrow(value.value)
        return value.value

    # ======================================================== module exec

    def exec_program(self, ast, scope, module=None):
        assert ast[0] == "program"
        body = ast[1]
        self.hoist(body, scope)
        for stmt in body:
            self.exec_stmt(stmt, scope, module)

    def hoist(self, stmts, scope):
        for s in stmts:
            node = s[2] if s[0] == "stmt" else s
            if node[0] == "func":
                scope.declare(node[1], self.make_function(node, scope))
            elif node[0] == "export" and node[1][2][0] == "func":
                inner = node[1][2]
                scope.declare(inner[1], self.make_function(inner, scope))
            elif node[0] == "var" and node[1] == "var":
                for pat, _ in node[2]:
                    for n in pattern_names(pat):
                        scope.declare_var(n)

    def make_function(self, node, scope, is_arrow=False, this_val=None):
        if is_arrow:
            _, params, body, is_async, expr_body = node
            name = None
            is_gen = False
        else:
            _, name, params, body, is_async = node[:5]
            is_gen = len(node) > 5 and node[5]
        plist, rest = params
        fn = JSFunction(name, plist, rest, body, scope,
                        is_async=is_async, is_arrow=is_arrow,
                        expr_body=(node[4] if is_arrow else False),
                        this_val=this_val, path=self.cur_path)
        fn.is_gen = is_gen
        return fn

    def make_class(self, node, scope):
        _, name, parent_node, members = node
        parent = None
        if parent_node is not None:
            parent = self.eval(parent_node, scope)
            if not isinstance(parent, JSClass):
                raise JSThrow.type_error(
                    f"class {name or ''} extends a non-class "
                    f"({js_typeof(parent)}) at "
                    f"{self.cur_path}:{self.cur_line}")
        klass = JSClass(name, parent)
        if name:
            # the class binding is visible inside static blocks/fields
            # that run before the declaration statement completes
            scope = Scope(scope)
            scope.declare(name, klass)
        for kind, key, computed, is_static, value in members:
            if kind == "staticblock":
                # static {} runs once, here, in member order, with
                # `this` bound to the class itself
                s2 = Scope(scope, is_function=True)
                s2.declare("this", klass)
                s2.declare("__home__", klass)
                self.exec_stmt(value, s2)
                continue
            k = prop_key(self.eval(key, scope)) if computed else key[1]
            if kind == "field":
                if is_static:
                    s2 = Scope(scope, is_function=True)
                    s2.declare("this", klass)
                    klass.statics[k] = (self.eval(value, s2)
                                        if value is not None else UNDEF)
                else:
                    # instance fields evaluate per-construct, base-first,
                    # in the class's definition env with this bound
                    klass.fields.append((k, value, scope))
                continue
            fn = self.eval(value, scope)
            fn.name = k
            fn.home_class = klass
            if kind == "get":
                (klass.static_getters if is_static else klass.getters)[k] = fn
            elif kind == "set":
                (klass.static_setters if is_static else klass.setters)[k] = fn
            elif k == "constructor" and not is_static:
                klass.ctor = fn
            else:
                (klass.statics if is_static else klass.methods)[k] = fn
        return klass

    def _init_fields(self, klass, obj):
        chain = []
        c = klass
        while c is not None:
            chain.append(c)
            c = c.parent
        for c in reversed(chain):                      # base-first
            for k, expr, env in c.fields:
                s = Scope(env, is_function=True)
                s.declare("this", obj)
                s.declare("__home__", c)
                v = self.eval(expr, s) if expr is not None else UNDEF
                if k.startswith("#"):
                    if obj.privs is None:
                        obj.privs = {}
                    obj.privs[k] = v
                else:
                    obj.props[k] = v

    def _run_ctor_chain(self, klass, this, args):
        """Nearest constructor up the chain runs (an implicit derived
        constructor forwards its arguments to the parent — which is
        exactly what skipping ctor-less classes does)."""
        c = klass
        while c is not None and c.ctor is None:
            c = c.parent
        if c is not None:
            self.call(c.ctor, this, args)

    def _super_home(self, scope):
        s = scope.lookup("__home__")
        home = s.vars["__home__"] if s else None
        if home is None or home.parent is None:
            raise JSThrow.error(
                None, "SyntaxError",
                f"'super' outside a derived-class method at "
                f"{self.cur_path}:{self.cur_line}")
        return home

    def _super_get(self, parent, this, name):
        c = parent
        while c is not None:
            if name in c.getters:
                return self.call(c.getters[name], this, [])
            if name in c.methods:
                return c.methods[name]
            c = c.parent
        return UNDEF

    # ======================================================== statements

    def exec_stmt(self, s, scope, module=None, labels=()):
        typ = s[0]
        if typ == "stmt":
            self.cur_line = s[1]
            return self.exec_stmt(s[2], scope, module, labels)
        if typ == "expr":
            self.eval(s[1], scope)
            return
        if typ == "var":
            is_const = s[1] == "const"
            for pat, init in s[2]:
                val = self.eval(init, scope) if init is not None else UNDEF
                self.bind_pattern(pat, val, scope, declare=True,
                                  const=is_const)
            return
        if typ == "func":
            # already hoisted; re-binding keeps later textual defs correct
            scope.declare(s[1], self.make_function(s, scope))
            return
        if typ == "classdecl":
            scope.declare(s[1], self.make_class(s, scope))
            return
        if typ == "return":
            raise ReturnEx(self.eval(s[1], scope) if s[1] is not None
                           else UNDEF)
        if typ == "if":
            if js_truthy(self.eval(s[1], scope)):
                self.exec_stmt(s[2], scope, module)
            elif s[3] is not None:
                self.exec_stmt(s[3], scope, module)
            return
        if typ == "block":
            inner = Scope(scope)
            self.hoist(s[1], inner)
            for st in s[1]:
                self.exec_stmt(st, inner, module)
            return
        if typ == "while":
            iters = 0
            while js_truthy(self.eval(s[1], scope)):
                iters = self._loop_tick(iters)
                try:
                    self.exec_stmt(s[2], scope, module)
                except BreakEx as e:
                    if e.label is not None and e.label not in labels:
                        raise
                    break
                except ContinueEx as e:
                    if e.label is not None and e.label not in labels:
                        raise
                    continue
            return
        if typ == "dowhile":
            iters = 0
            while True:
                iters = self._loop_tick(iters)
                try:
                    self.exec_stmt(s[1], scope, module)
                except BreakEx as e:
                    if e.label is not None and e.label not in labels:
                        raise
                    break
                except ContinueEx as e:
                    if e.label is not None and e.label not in labels:
                        raise
                if not js_truthy(self.eval(s[2], scope)):
                    break
            return
        if typ == "for":
            _, init, test, update, body = s
            fscope = Scope(scope)
            if init is not None:
                self.exec_stmt(init, fscope, module)
            iters = 0
            while test is None or js_truthy(self.eval(test, fscope)):
                iters = self._loop_tick(iters)
                # per-iteration binding: copy loop vars so closures in the
                # body capture this iteration's values (let semantics)
                iscope = Scope(scope)
                iscope.vars.update(fscope.vars)
                try:
                    self.exec_stmt(body, iscope, module)
                except BreakEx as e:
                    fscope.vars.update(
                        {k: v for k, v in iscope.vars.items()
                         if k in fscope.vars})
                    if e.label is not None and e.label not in labels:
                        raise
                    break
                except ContinueEx as e:
                    if e.label is not None and e.label not in labels:
                        fscope.vars.update(
                            {k: v for k, v in iscope.vars.items()
                             if k in fscope.vars})
                        raise
                fscope.vars.update({k: v for k, v in iscope.vars.items()
                                    if k in fscope.vars})
                if update is not None:
                    self.eval(update, fscope)
            return
        if typ in ("forof", "forin", "forawait"):
            _, kind, pat, obj_node, body = s
            obj = self.eval(obj_node, scope)
            seq = (self.js_iterate(obj) if typ == "forof"
                   else self.js_keys(obj) if typ == "forin"
                   else self._async_iterate(obj))
            for item in seq:
                iscope = Scope(scope)
                if kind is None:
                    self.assign_pattern(pat, item, scope)
                else:
                    self.bind_pattern(pat, item, iscope, declare=True,
                                      const=kind == "const")
                try:
                    self.exec_stmt(body, iscope, module)
                except BreakEx as e:
                    if e.label is not None and e.label not in labels:
                        raise
                    break
                except ContinueEx as e:
                    if e.label is not None and e.label not in labels:
                        raise
                    continue
            return
        if typ == "break":
            raise BreakEx(s[1] if len(s) > 1 else None)
        if typ == "continue":
            raise ContinueEx(s[1] if len(s) > 1 else None)
        if typ == "label":
            # labeled statement: the label chain accumulates through
            # stmt wrappers into the directly-labeled loop/switch, which
            # absorbs matching labeled break/continue itself; a labeled
            # BREAK out of a non-loop statement is absorbed here
            try:
                self.exec_stmt(s[2], scope, module, labels + (s[1],))
            except BreakEx as e:
                if e.label != s[1]:
                    raise
            return
        if typ == "throw":
            raise JSThrow(self.eval(s[1], scope),
                          stack=[(self.cur_path, self.cur_line)])
        if typ == "try":
            _, block, param, catch, fin = s
            try:
                try:
                    self.exec_stmt(block, scope, module)
                except JSThrow as t:
                    if catch is None:
                        raise
                    cscope = Scope(scope)
                    if param is not None:
                        self.bind_pattern(param, t.value, cscope,
                                          declare=True)
                    self.exec_stmt(catch, cscope, module)
            finally:
                if fin is not None:
                    self.exec_stmt(fin, scope, module)
            return
        if typ == "switch":
            disc = self.eval(s[1], scope)
            sscope = Scope(scope)
            matched = False
            try:
                for test, body in s[2]:
                    if not matched and test is not None \
                            and js_strict_eq(disc, self.eval(test, sscope)):
                        matched = True
                    if matched:
                        for st in body:
                            self.exec_stmt(st, sscope, module)
                if not matched:
                    run = False
                    for test, body in s[2]:
                        if test is None:
                            run = True
                        if run:
                            for st in body:
                                self.exec_stmt(st, sscope, module)
            except BreakEx as e:
                if e.label is not None and e.label not in labels:
                    raise
            return
        if typ == "empty":
            return
        if typ == "import":
            if module is None:
                raise JSThrow.type_error("import outside a module")
            ns = module.loader.load(s[2], referrer=module.path)
            for imported, local in s[1]:
                if imported not in ns.exports:
                    raise JSThrow.type_error(
                        f"{s[2]} has no export named '{imported}' "
                        f"(imported by {module.path})")
                # ES import bindings are immutable
                scope.declare(local, ns.exports[imported], const=True)
            return
        if typ == "export":
            inner = s[1]
            node = inner[2] if inner[0] == "stmt" else inner
            self.exec_stmt(inner, scope, module)
            if module is not None:
                if node[0] in ("func", "classdecl"):
                    module.exports[node[1]] = scope.get(node[1])
                elif node[0] == "var":
                    for pat, _ in node[2]:
                        for n in pattern_names(pat):
                            module.exports[n] = scope.get(n)
                            module.live_exports.append((n, scope))
            return
        if typ == "exportnames":
            if module is not None:
                for local, exported in s[1]:
                    module.exports[exported] = scope.get(local)
            return
        if typ == "exportdefault":
            if module is not None:
                module.exports["default"] = self.eval(s[1], scope)
            return
        raise JSThrow.type_error(f"unknown statement {typ}")

    # ======================================================= expressions

    def eval(self, node, scope):
        v = self.eval_chain(node, scope)
        return UNDEF if v is _SC else v

    def eval_chain(self, node, scope):
        typ = node[0]
        if typ == "num" or typ == "str":
            return node[1]
        if typ == "ident":
            return scope.get(node[1])
        if typ == "lit":
            return {"null": None, "true": True, "false": False,
                    "undefined": UNDEF}[node[1]]
        if typ == "this":
            s = scope.lookup("this")
            return s.vars["this"] if s else UNDEF
        if typ == "tpl":
            quasis, exprs = node[1], node[2]
            out = [quasis[0]]
            for q, e in zip(quasis[1:], exprs):
                out.append(js_str(self.eval(e, scope)))
                out.append(q)
            return "".join(out)
        if typ == "regex":
            return self._b.make_regex(node[1], node[2])
        if typ == "array":
            items = []
            for el in node[1]:
                if el is None:
                    items.append(UNDEF)
                elif el[0] == "spread":
                    items.extend(self.js_iterate(self.eval(el[1], scope)))
                else:
                    items.append(self.eval(el, scope))
            return JSArray(items)
        if typ == "object":
            props = {}
            for p in node[1]:
                if p[0] == "spread":
                    src = self.eval(p[1], scope)
                    for k in self.js_keys(src):
                        props[k] = self.get_member(src, k)
                    continue
                _, key, value, computed = p
                k = prop_key(self.eval(key, scope)) if computed else key[1]
                props[k] = self.eval(value, scope)
            return JSObject(props)
        if typ == "arrow":
            this_s = scope.lookup("this")
            this_val = this_s.vars["this"] if this_s else UNDEF
            return self.make_function(node, scope, is_arrow=True,
                                      this_val=this_val)
        if typ == "funcexpr":
            fn = JSFunction(node[1], node[2][0], node[2][1], node[3], scope,
                            is_async=node[4], path=self.cur_path)
            fn.is_gen = len(node) > 5 and bool(node[5])
            return fn
        if typ == "classexpr":
            return self.make_class(node, scope)
        if typ == "super":
            raise JSThrow.error(
                None, "SyntaxError",
                "'super' is only valid as super(...) or super.member")
        if typ == "yield":
            gen = getattr(self._gen_tl, "gen", None)
            if gen is None:
                raise JSThrow.error(
                    None, "SyntaxError",
                    f"yield outside a generator at "
                    f"{self.cur_path}:{self.cur_line}")
            if node[2]:                            # yield* delegation
                last = UNDEF
                for item in self.js_iterate(self.eval(node[1], scope)):
                    last = gen._yield(item)
                return last
            return gen._yield(self.eval(node[1], scope)
                              if node[1] is not None else UNDEF)
        if typ == "member":
            _, obj_node, prop, computed, optional = node
            if obj_node[0] == "super":
                home = self._super_home(scope)
                this_s = scope.lookup("this")
                this = this_s.vars["this"] if this_s else UNDEF
                name = (js_str(self.eval(prop, scope)) if computed
                        else prop)
                return self._super_get(home.parent, this, name)
            obj = self.eval_chain(obj_node, scope)
            if obj is _SC:
                return _SC
            if optional and (obj is None or obj is UNDEF):
                return _SC
            name = prop_key(self.eval(prop, scope)) if computed else prop
            return self.get_member(obj, name)
        if typ == "call":
            _, callee, args, optional = node
            if callee[0] == "super":
                # super(...): run the parent constructor chain on this
                home = self._super_home(scope)
                this_s = scope.lookup("this")
                this = this_s.vars["this"] if this_s else UNDEF
                argv = self.eval_args(args, scope)
                self._run_ctor_chain(home.parent, this, argv)
                return UNDEF
            if callee[0] == "member" and callee[1][0] == "super":
                _, _sup, prop, computed, _copt = callee
                home = self._super_home(scope)
                this_s = scope.lookup("this")
                this = this_s.vars["this"] if this_s else UNDEF
                name = (js_str(self.eval(prop, scope)) if computed
                        else prop)
                fn = self._super_get(home.parent, this, name)
                argv = self.eval_args(args, scope)
                if not is_callable(fn):
                    raise JSThrow.type_error(
                        f"super.{name} is not a function at "
                        f"{self.cur_path}:{self.cur_line}")
                return self.call(fn, this, argv)
            if callee[0] == "member":
                _, obj_node, prop, computed, copt = callee
                obj = self.eval_chain(obj_node, scope)
                if obj is _SC:
                    return _SC
                if copt and (obj is None or obj is UNDEF):
                    return _SC
                name = (prop_key(self.eval(prop, scope)) if computed else prop)
                fn = self.get_member(obj, name)
                this = obj
            else:
                fn = self.eval_chain(callee, scope)
                if fn is _SC:
                    return _SC
                this = UNDEF
                name = getattr(fn, "name", "<fn>")
            if optional and (fn is None or fn is UNDEF):
                return _SC
            argv = self.eval_args(args, scope)
            if not is_callable(fn):
                raise JSThrow.type_error(
                    f"{describe_callee(callee)} is not a function "
                    f"(got {js_typeof(fn)}) at {self.cur_path}:{self.cur_line}")
            return self.call(fn, this, argv)
        if typ == "new":
            ctor = self.eval(node[1], scope)
            argv = self.eval_args(node[2], scope)
            return self.construct(ctor, argv)
        if typ == "assign":
            _, op, target, value_node = node
            if op == "=":
                val = self.eval(value_node, scope)
                self.assign_target(target, val, scope)
                return val
            if op in ("&&=", "||=", "??="):
                cur = self.eval(target, scope)
                need = ((op == "&&=" and js_truthy(cur))
                        or (op == "||=" and not js_truthy(cur))
                        or (op == "??=" and (cur is None or cur is UNDEF)))
                if not need:
                    return cur
                val = self.eval(value_node, scope)
                self.assign_target(target, val, scope)
                return val
            cur = self.eval(target, scope)
            rhs = self.eval(value_node, scope)
            val = binary_op(op[:-1], cur, rhs)
            self.assign_target(target, val, scope)
            return val
        if typ == "passign":
            val = self.eval(node[2], scope)
            self.assign_pattern(node[1], val, scope)
            return val
        if typ == "cond":
            return (self.eval(node[2], scope)
                    if js_truthy(self.eval(node[1], scope))
                    else self.eval(node[3], scope))
        if typ == "logical":
            op = node[1]
            left = self.eval(node[2], scope)
            if op == "&&":
                return self.eval(node[3], scope) if js_truthy(left) else left
            if op == "||":
                return left if js_truthy(left) else self.eval(node[3], scope)
            return (self.eval(node[3], scope)
                    if left is None or left is UNDEF else left)
        if typ == "binary":
            op = node[1]
            left = self.eval(node[2], scope)
            right = self.eval(node[3], scope)
            if op == "in":
                return self.js_has(right, prop_key(left))
            if op == "instanceof":
                return self._b.js_instanceof(left, right)
            return binary_op(op, left, right)
        if typ == "unary":
            op = node[1]
            if op == "typeof":
                operand = node[2]
                if operand[0] == "ident" and scope.lookup(operand[1]) is None:
                    return "undefined"
                return js_typeof(self.eval(operand, scope))
            if op == "delete":
                operand = node[2]
                if operand[0] == "member":
                    obj = self.eval(operand[1], scope)
                    name = (prop_key(self.eval(operand[2], scope))
                            if operand[3] else operand[2])
                    self.delete_member(obj, name)
                return True
            v = self.eval(node[2], scope)
            if op == "!":
                return not js_truthy(v)
            if op == "-":
                return js_neg(to_number(v))
            if op == "+":
                return to_number(v)
            if op == "~":
                return float(~to_int32(v))
            if op == "void":
                return UNDEF
        if typ == "update":
            _, op, prefix, target = node
            delta = 1 if op == "++" else -1
            if target[0] == "member":
                # evaluate the object expression ONCE — obj().n++ must
                # not call obj() twice
                obj = self.eval(target[1], scope)
                name = (prop_key(self.eval(target[2], scope)) if target[3]
                        else target[2])
                cur = to_number(self.get_member(obj, name))
                new = js_num_add(cur, delta)
                self.set_member(obj, name, new)
                return new if prefix else cur
            cur = to_number(self.eval(target, scope))
            new = js_num_add(cur, delta)
            self.assign_target(target, new, scope)
            return new if prefix else cur
        if typ == "seq":
            v = UNDEF
            for e in node[1]:
                v = self.eval(e, scope)
            return v
        if typ == "await":
            return self.await_value(self.eval(node[1], scope))
        if typ == "spread":
            raise JSThrow.type_error("unexpected spread")
        if typ == "tagged":
            # tag`a${x}b` — call tag(strings, x) with strings.raw kept
            # escape-unprocessed; member tags bind `this` like any call
            _, callee, quasis, exprs, raws = node
            if callee[0] == "member":
                obj = self.eval(callee[1], scope)
                name = (prop_key(self.eval(callee[2], scope))
                        if callee[3] else callee[2])
                fn = self.get_member(obj, name)
                this = obj
            else:
                fn = self.eval(callee, scope)
                this = UNDEF
            if not is_callable(fn):
                raise JSThrow.type_error(
                    f"template tag is not a function at "
                    f"{self.cur_path}:{self.cur_line}")
            strings = JSArray(list(quasis))
            strings.props = {"raw": JSArray(list(raws))}
            return self.call(fn, this,
                             [strings] + [self.eval(e, scope)
                                          for e in exprs])
        if typ == "shortdefault":
            raise JSThrow.type_error("invalid shorthand default outside "
                                     "destructuring")
        raise JSThrow.type_error(f"unknown expression {typ}")

    def eval_args(self, args, scope):
        argv = []
        for a in args:
            if a[0] == "spread":
                argv.extend(self.js_iterate(self.eval(a[1], scope)))
            else:
                argv.append(self.eval(a, scope))
        return argv

    # ===================================================== call machinery

    def call(self, fn, this, args):
        if isinstance(fn, JSProxy):
            trap = fn.handler.props.get("apply")
            if trap is not None and is_callable(trap):
                return self.call(trap, fn.handler,
                                 [fn.target, this, JSArray(list(args))])
            return self.call(fn.target, this, args)
        if isinstance(fn, BoundFunction):
            return self.call(fn.target, fn.this_val, fn.args + args)
        if isinstance(fn, NativeFunction) or (
                isinstance(fn, HostObject)
                and callable(getattr(fn, "fn", None))):
            return fn.fn(self, this, args)
        assert isinstance(fn, JSFunction)
        if len(self.call_stack) > 400:
            raise JSThrow.error(None, "RangeError",
                                "maximum call stack size exceeded")
        scope = Scope(fn.env, is_function=True)
        if fn.is_arrow:
            scope.declare("this", fn.this_val)
        else:
            scope.declare("this", this)
        if fn.home_class is not None:      # super resolution for methods
            scope.declare("__home__", fn.home_class)
        for idx, (pat, default) in enumerate(fn.params):
            val = args[idx] if idx < len(args) else UNDEF
            if val is UNDEF and default is not None:
                val = self.eval(default, scope)
            self.bind_pattern(pat, val, scope, declare=True)
        if fn.rest is not None:
            scope.declare(fn.rest, JSArray(list(args[len(fn.params):])))
        if getattr(fn, "is_gen", False):
            # calling a function* runs NO body code: it returns the
            # suspended generator object (async-wrapped for async gens —
            # their body awaits run on the generator thread)
            gen = JSGenerator(self, fn, scope)
            return JSAsyncGenerator(gen) if fn.is_async else gen
        self.call_stack.append((fn.name, fn.path, self.cur_line))
        prev_path = self.cur_path
        self.cur_path = fn.path
        try:
            if fn.is_async:
                p = self.promise()
                try:
                    result = self._run_body(fn, scope)
                    self.resolve_promise(p, result)
                except JSThrow as t:
                    self.reject_promise(p, t.value)
                return p
            return self._run_body(fn, scope)
        finally:
            self.call_stack.pop()
            self.cur_path = prev_path

    def _run_body(self, fn, scope):
        if fn.is_arrow and fn.expr_body:
            return self.eval(fn.body, scope)
        try:
            assert fn.body[0] == "block"
            self.hoist(fn.body[1], scope)
            for st in fn.body[1]:
                self.exec_stmt(st, scope)
        except ReturnEx as r:
            return r.value
        return UNDEF

    def construct(self, ctor, args):
        if isinstance(ctor, JSProxy):
            trap = ctor.handler.props.get("construct")
            if trap is not None and is_callable(trap):
                return self.call(trap, ctor.handler,
                                 [ctor.target, JSArray(list(args)),
                                  ctor.target])
            return self.construct(ctor.target, args)
        if isinstance(ctor, JSClass):
            obj = JSObject(klass=ctor)
            self._init_fields(ctor, obj)
            self._run_ctor_chain(ctor, obj, args)
            return obj
        if isinstance(ctor, NativeFunction) or (
                isinstance(ctor, HostObject) and hasattr(ctor, "ctor")):
            if getattr(ctor, "ctor", None) is None:
                raise JSThrow.type_error(
                    f"{getattr(ctor, 'name', '?')} is not a constructor")
            return ctor.ctor(self, args)
        if isinstance(ctor, JSFunction):
            obj = JSObject()
            result = self.call(ctor, obj, args)
            return result if isinstance(result, (JSObject, JSArray)) else obj
        raise JSThrow.type_error("not a constructor")

    # ================================================== member protocol

    def get_member(self, obj, name):
        if obj is None or obj is UNDEF:
            raise JSThrow.type_error(
                f"cannot read properties of {js_str(obj)} (reading "
                f"'{name}') at {self.cur_path}:{self.cur_line}")
        if isinstance(obj, JSProxy):
            trap = obj.handler.props.get("get")
            if trap is not None:
                return self.call(trap, obj.handler,
                                 [obj.target, name, obj])
            return self.get_member(obj.target, name)
        if isinstance(obj, HostObject):
            return obj.js_get(name)
        if isinstance(obj, str):
            return self._b.string_member(self, obj, name)
        if isinstance(obj, JSArray):
            if name == "length":
                return len(obj.items)
            if isinstance(name, str) and name.lstrip("-").isdigit():
                i = int(name)
                return (obj.items[i] if 0 <= i < len(obj.items) else UNDEF)
            if obj.props and name in obj.props:
                return obj.props[name]
            return self._b.array_member(self, obj, name)
        if isinstance(obj, JSObject):
            if _is_priv_name(name) and (obj.klass is not None
                                        or obj.privs is not None):
                # private members never fall through to plain props or
                # builtins: declared-or-TypeError (brand-check semantics).
                # Guarded to class instances + #ident-shaped names so
                # plain objects keyed by '#'-strings (e.g. route hashes)
                # keep ordinary property semantics.
                if obj.privs is not None and name in obj.privs:
                    return obj.privs[name]
                c = obj.klass
                while c is not None:
                    if name in c.getters:
                        return self.call(c.getters[name], obj, [])
                    if name in c.methods:
                        return c.methods[name]
                    c = c.parent
                raise JSThrow.type_error(
                    f"cannot read private member {name} from an object "
                    f"whose class did not declare it at "
                    f"{self.cur_path}:{self.cur_line}")
            if name in obj.props:
                return obj.props[name]
            c = obj.klass
            while c is not None:               # class instance protocol
                if name in c.getters:
                    return self.call(c.getters[name], obj, [])
                if name in c.methods:
                    return c.methods[name]
                c = c.parent
            return self._b.object_member(self, obj, name)
        if isinstance(obj, JSClass):
            c = obj
            while c is not None:               # statics are inherited
                if name in c.static_getters:
                    return self.call(c.static_getters[name], obj, [])
                if name in c.statics:
                    return c.statics[name]
                c = c.parent
            if name == "name":
                return obj.name
            return UNDEF
        if isinstance(obj, JSSymbol):
            if name == "description":
                return obj.desc
            if name == "toString":
                return NativeFunction(
                    "toString", lambda i, t, a, o=obj: f"Symbol({o.desc})")
            return UNDEF
        if isinstance(obj, bool):
            if name == "toString":
                return NativeFunction("toString",
                                      lambda i, t, a, o=obj: js_str(o))
            return UNDEF
        if isinstance(obj, (int, float)):
            return self._b.number_member(self, obj, name)
        if isinstance(obj, (JSFunction, NativeFunction, BoundFunction)):
            return self._b.function_member(self, obj, name)
        if isinstance(obj, JSPromise):
            return self._b.promise_member(self, obj, name)
        if isinstance(obj, JSMap):
            return self._b.map_member(self, obj, name)
        if isinstance(obj, JSSet):
            return self._b.set_member(self, obj, name)
        if isinstance(obj, JSRegExp):
            return self._b.regex_member(self, obj, name)
        if isinstance(obj, JSGenerator):
            if name == "next":
                return NativeFunction(
                    "next", lambda i, t, a: obj.js_next(
                        a[0] if a else UNDEF))
            if name == "return":
                return NativeFunction(
                    "return", lambda i, t, a: obj.js_return(
                        a[0] if a else UNDEF))
            if name == "throw":
                return NativeFunction(
                    "throw", lambda i, t, a: obj.js_throw(
                        a[0] if a else UNDEF))
            return UNDEF
        if isinstance(obj, JSAsyncGenerator):
            op = {"next": obj.gen.js_next, "return": obj.gen.js_return,
                  "throw": obj.gen.js_throw}.get(name)
            if op is None:
                return UNDEF

            def _step(i, t, a, op=op):
                p = i.promise()
                try:
                    i.resolve_promise(p, op(a[0] if a else UNDEF))
                except JSThrow as th:
                    i.reject_promise(p, th.value)
                return p
            return NativeFunction(name, _step)
        raise JSThrow.type_error(
            f"cannot read '{name}' of {type(obj).__name__}")

    def set_member(self, obj, name, value):
        if isinstance(obj, JSProxy):
            trap = obj.handler.props.get("set")
            if trap is not None:
                self.call(trap, obj.handler,
                          [obj.target, name, value, obj])
                return
            self.set_member(obj.target, name, value)
            return
        if isinstance(obj, HostObject):
            obj.js_set(name, value)
            return
        if isinstance(obj, JSObject):
            if _is_priv_name(name) and (obj.klass is not None
                                        or obj.privs is not None):
                c = obj.klass
                while c is not None:
                    if name in c.setters:
                        self.call(c.setters[name], obj, [value])
                        return
                    c = c.parent
                if obj.privs is not None and name in obj.privs:
                    obj.privs[name] = value
                    return
                raise JSThrow.type_error(
                    f"cannot write private member {name} to an object "
                    f"whose class did not declare it at "
                    f"{self.cur_path}:{self.cur_line}")
            c = obj.klass
            while c is not None:               # setter accessors first
                if name in c.setters:
                    self.call(c.setters[name], obj, [value])
                    return
                c = c.parent
            obj.props[name] = value
            return
        if isinstance(obj, JSClass):
            c = obj
            while c is not None:
                if name in c.static_setters:
                    self.call(c.static_setters[name], obj, [value])
                    return
                c = c.parent
            obj.statics[name] = value
            return
        if isinstance(obj, JSArray):
            if name == "length":
                n = int(to_number(value))
                del obj.items[n:]
                while len(obj.items) < n:
                    obj.items.append(UNDEF)
                return
            if isinstance(name, str) and name.isdigit():
                i = int(name)
                while len(obj.items) <= i:
                    obj.items.append(UNDEF)
                obj.items[i] = value
                return
            # expando property on an array — legal JS (a.total = 5)
            if obj.props is None:
                obj.props = {}
            obj.props[name] = value
            return
        if isinstance(obj, JSRegExp) and name == "lastIndex":
            obj.last_index = int(to_number(value))
            return
        raise JSThrow.type_error(
            f"cannot set '{name}' on {js_typeof(obj)} "
            f"at {self.cur_path}:{self.cur_line}")

    def delete_member(self, obj, name):
        if isinstance(obj, JSProxy):
            trap = obj.handler.props.get("deleteProperty")
            if trap is not None:
                self.call(trap, obj.handler, [obj.target, name])
            else:
                self.delete_member(obj.target, name)
        elif isinstance(obj, JSObject):
            obj.props.pop(name, None)
        elif isinstance(obj, HostObject):
            obj.js_delete(name)
        elif isinstance(obj, JSArray) and name.isdigit():
            i = int(name)
            if 0 <= i < len(obj.items):
                obj.items[i] = UNDEF

    def js_has(self, obj, name):
        if isinstance(obj, JSProxy):
            trap = obj.handler.props.get("has")
            if trap is not None:
                return js_truthy(self.call(trap, obj.handler,
                                           [obj.target, name]))
            return self.js_has(obj.target, name)
        if isinstance(obj, JSObject):
            return name in obj.props
        if isinstance(obj, HostObject):
            return obj.js_has(name)
        if isinstance(obj, JSArray):
            return name.isdigit() and int(name) < len(obj.items)
        if isinstance(obj, JSMap):
            return map_key(name) in obj.entries
        return False

    def js_keys(self, obj):
        if isinstance(obj, JSProxy):
            trap = obj.handler.props.get("ownKeys")
            if trap is not None:
                return [js_str(k) for k in self.js_iterate(
                    self.call(trap, obj.handler, [obj.target]))]
            return self.js_keys(obj.target)
        if isinstance(obj, JSObject):
            # symbol-keyed props are non-enumerable through every
            # reflection path (Object.keys / for-in / spread / assign)
            return [k for k in obj.props.keys()
                    if not k.startswith(SYM_INTERNAL_PREFIX)]
        if isinstance(obj, JSArray):
            return [str(i) for i in range(len(obj.items))]
        if isinstance(obj, HostObject):
            return list(obj.js_keys())
        if obj is None or obj is UNDEF:
            return []
        return []

    def _async_iterate(self, obj):
        """`for await (… of obj)`: async generators step through their
        promise-wrapped next(); any other iterable yields its items with
        each element awaited (the spec's CreateAsyncFromSyncIterator)."""
        if isinstance(obj, JSAsyncGenerator):
            budget = 200_000             # same bound as sync generators
            n = 0
            while True:
                n += 1
                if n > budget:
                    raise DeadlockError(
                        f"async generator iteration at {self.cur_path}:"
                        f"{self.cur_line} exceeded {budget}")
                res = self.await_value(self.call(
                    self.get_member(obj, "next"), obj, []))
                if js_truthy(self.get_member(res, "done")):
                    return
                yield self.get_member(res, "value")
        else:
            for item in self.js_iterate(obj):
                yield self.await_value(item)

    def js_iterate(self, obj):
        if isinstance(obj, JSProxy):
            return self.js_iterate(obj.target)
        if isinstance(obj, JSGenerator):
            def _drain():
                # tighter than LOOP_BUDGET: each step is a thread handoff
                # (~tens of µs), so 2M would hang the gate for minutes
                budget = 200_000
                n = 0
                while True:
                    n += 1
                    if n > budget:
                        raise DeadlockError(
                            f"generator iteration at {self.cur_path}:"
                            f"{self.cur_line} exceeded {budget}")
                    res = obj.js_next()
                    if res.props["done"]:
                        return
                    yield res.props["value"]
            return _drain()
        if isinstance(obj, JSArray):
            return list(obj.items)
        if isinstance(obj, str):
            return list(obj)
        if isinstance(obj, JSMap):
            return [JSArray([k, v]) for k, v in obj.entries.values()]
        if isinstance(obj, JSSet):
            return list(obj.entries.values())
        if isinstance(obj, HostObject):
            it = obj.js_get("__iterate__")
            if it is not UNDEF:
                return it(self)
        if isinstance(obj, JSObject):
            # Symbol.iterator protocol: own prop or class method (the
            # get_member walk covers both)
            fn = self.get_member(obj, SYM_ITERATOR_KEY)
            if fn is not UNDEF and is_callable(fn):
                it = self.call(fn, obj, [])

                def _drive():
                    budget = 200_000
                    n = 0
                    while True:
                        n += 1
                        if n > budget:
                            raise DeadlockError(
                                f"custom iterator at {self.cur_path}:"
                                f"{self.cur_line} exceeded {budget}")
                        res = self.call(
                            self.get_member(it, "next"), it, [])
                        if js_truthy(self.get_member(res, "done")):
                            return
                        yield self.get_member(res, "value")
                return _drive()
            ent = obj.props.get("__entries__")
            if isinstance(ent, JSArray):
                return list(ent.items)
        raise JSThrow.type_error(
            f"{js_typeof(obj)} is not iterable at "
            f"{self.cur_path}:{self.cur_line}")

    # ====================================================== destructuring

    def bind_pattern(self, pat, value, scope, declare=False, const=False):
        self._pattern(pat, value, scope, declare, const)

    def assign_pattern(self, pat, value, scope):
        self._pattern(pat, value, scope, False)

    def assign_target(self, target, value, scope):
        if target[0] == "ident":
            scope.set(target[1], value)
        elif target[0] == "member":
            obj = self.eval(target[1], scope)
            name = (prop_key(self.eval(target[2], scope)) if target[3]
                    else target[2])
            self.set_member(obj, name, value)
        else:
            raise JSThrow.type_error(
                f"invalid assignment target {target[0]}")

    def _pattern(self, pat, value, scope, declare, const=False):
        typ = pat[0]
        if typ == "pid":
            if declare:
                scope.declare(pat[1], value, const=const)
            else:
                scope.set(pat[1], value)
            return
        if typ == "pmember":
            self.assign_target(pat[1], value, scope)
            return
        if typ == "pdefault":
            if value is UNDEF:
                value = self.eval(pat[2], scope)
            self._pattern(pat[1], value, scope, declare, const)
            return
        if typ == "parr":
            items = self.js_iterate(value)
            for i, el in enumerate(pat[1]):
                if el is None:
                    continue
                sub, default = el
                v = items[i] if i < len(items) else UNDEF
                if v is UNDEF and default is not None:
                    v = self.eval(default, scope)
                self._pattern(sub, v, scope, declare, const)
            if pat[2] is not None:
                rest = JSArray(list(items[len(pat[1]):]))
                if declare:
                    scope.declare(pat[2], rest, const=const)
                else:
                    scope.set(pat[2], rest)
            return
        if typ == "pobj":
            if value is None or value is UNDEF:
                raise JSThrow.type_error(
                    f"cannot destructure {js_str(value)} at "
                    f"{self.cur_path}:{self.cur_line}")
            used = set()
            for key, computed, sub, default in pat[1]:
                k = prop_key(self.eval(key, scope)) if computed else key[1]
                used.add(k)
                v = self.get_member(value, k)
                if v is UNDEF and default is not None:
                    v = self.eval(default, scope)
                self._pattern(sub, v, scope, declare, const)
            if pat[2] is not None:
                rest = JSObject({k: self.get_member(value, k)
                                 for k in self.js_keys(value)
                                 if k not in used})
                if declare:
                    scope.declare(pat[2], rest, const=const)
                else:
                    scope.set(pat[2], rest)
            return
        raise JSThrow.type_error(f"unknown pattern {typ}")


def pattern_names(pat):
    typ = pat[0]
    if typ == "pid":
        return [pat[1]]
    if typ == "pdefault":
        return pattern_names(pat[1])
    if typ == "parr":
        out = []
        for el in pat[1]:
            if el is not None:
                out.extend(pattern_names(el[0]))
        if pat[2]:
            out.append(pat[2])
        return out
    if typ == "pobj":
        out = []
        for _, _, sub, _ in pat[1]:
            out.extend(pattern_names(sub))
        if pat[2]:
            out.append(pat[2])
        return out
    return []


def describe_callee(node):
    if node[0] == "ident":
        return node[1]
    if node[0] == "member" and not node[3]:
        return f"….{node[2]}"
    return "<expression>"


# ============================================================ coercions

def js_truthy(v):
    if v is UNDEF or v is None:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if isinstance(v, str):
        return len(v) > 0
    return True


def js_typeof(v):
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "object"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, (int, float)):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, JSSymbol):
        return "symbol"
    if is_callable(v) or isinstance(v, JSClass):
        return "function"
    return "object"


def js_str(v):
    if isinstance(v, str):
        return v
    if v is UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return format_number(v)
    if isinstance(v, JSSymbol):
        # lenient vs spec (implicit string conversion throws there);
        # String(sym)/template output both read "Symbol(desc)"
        return f"Symbol({v.desc})"
    if isinstance(v, JSArray):
        return ",".join("" if (x is None or x is UNDEF) else js_str(x)
                        for x in v.items)
    if isinstance(v, JSObject):
        if "message" in v.props and "name" in v.props:
            return f"{js_str(v.props['name'])}: {js_str(v.props['message'])}"
        return "[object Object]"
    if isinstance(v, (JSFunction, NativeFunction, BoundFunction)):
        name = getattr(v, "name", "")
        return f"function {name}() {{ [native code] }}"
    if isinstance(v, JSRegExp):
        return f"/{v.source}/{v.flags}"
    if isinstance(v, HostObject):
        s = v.js_get("__str__")
        if isinstance(s, str):
            return s
        return f"[object {type(v).__name__}]"
    if isinstance(v, JSProxy):
        return js_str(v.target)
    return str(v)


def format_number(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        return str(int(v))
    return repr(v)


def to_number(v):
    if isinstance(v, bool):
        return 1 if v else 0
    if isinstance(v, (int, float)):
        return v
    if v is None:
        return 0
    if v is UNDEF:
        return float("nan")
    if isinstance(v, str):
        s = v.strip()
        if s == "":
            return 0
        try:
            if s.startswith(("0x", "0X")):
                return int(s, 16)
            f = float(s)
            return int(f) if f.is_integer() and "e" not in s.lower() \
                and "." not in s else f
        except ValueError:
            return float("nan")
    if isinstance(v, JSArray):
        if not v.items:
            return 0
        if len(v.items) == 1:
            return to_number(v.items[0])
    if isinstance(v, HostObject):
        n = v.js_get("__num__")           # valueOf hook (Date)
        if isinstance(n, (int, float)) and not isinstance(n, bool):
            return n
    return float("nan")


def to_int32(v):
    n = to_number(v)
    if isinstance(n, float) and (math.isnan(n) or math.isinf(n)):
        return 0
    n = int(n)
    n &= 0xFFFFFFFF
    return n - 0x100000000 if n >= 0x80000000 else n


def js_num_add(a, b):
    r = a + b
    return r


def js_neg(n):
    if n == 0:
        return -float(n)                  # preserve signed zero
    return -n


def binary_op(op, left, right):
    if op == "+":
        if isinstance(left, str) or isinstance(right, str) \
                or isinstance(left, (JSArray, JSObject)) \
                or isinstance(right, (JSArray, JSObject)):
            return js_str(left) + js_str(right)
        return to_number(left) + to_number(right)
    if op == "-":
        return to_number(left) - to_number(right)
    if op == "*":
        return to_number(left) * to_number(right)
    if op == "/":
        ln, rn = to_number(left), to_number(right)
        if rn == 0:
            if (isinstance(ln, float) and math.isnan(ln)) or ln == 0:
                return float("nan")
            # signed zero: 1/-0 is -Infinity
            rpos = math.copysign(1.0, float(rn)) > 0
            return float("inf") if (ln > 0) == rpos else float("-inf")
        return ln / rn
    if op == "%":
        ln, rn = to_number(left), to_number(right)
        if rn == 0:
            return float("nan")
        return math.fmod(ln, rn)
    if op == "**":
        return to_number(left) ** to_number(right)
    if op in ("<", ">", "<=", ">="):
        if isinstance(left, str) and isinstance(right, str):
            a, b = left, right
        else:
            a, b = to_number(left), to_number(right)
            if (isinstance(a, float) and math.isnan(a)) or \
                    (isinstance(b, float) and math.isnan(b)):
                return False
        return {"<": a < b, ">": a > b, "<=": a <= b, ">=": a >= b}[op]
    if op == "===":
        return js_strict_eq(left, right)
    if op == "!==":
        return not js_strict_eq(left, right)
    if op == "==":
        return js_loose_eq(left, right)
    if op == "!=":
        return not js_loose_eq(left, right)
    if op == "&":
        return float(to_int32(left) & to_int32(right))
    if op == "|":
        return float(to_int32(left) | to_int32(right))
    if op == "^":
        return float(to_int32(left) ^ to_int32(right))
    if op == "<<":
        return float(to_int32(to_int32(left) << (to_int32(right) & 31)))
    if op == ">>":
        return float(to_int32(left) >> (to_int32(right) & 31))
    if op == ">>>":
        return float((to_int32(left) & 0xFFFFFFFF) >> (to_int32(right) & 31))
    raise JSThrow.type_error(f"unknown operator {op}")


def js_strict_eq(a, b):
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if math.isnan(float(a)) or math.isnan(float(b)):
            return False
        return float(a) == float(b)
    if type(a) is not type(b):
        if a is UNDEF or b is UNDEF or a is None or b is None:
            return a is b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if a is None and b is None:
        return True
    if a is UNDEF and b is UNDEF:
        return True
    return a is b


def js_loose_eq(a, b):
    nullish_a = a is None or a is UNDEF
    nullish_b = b is None or b is UNDEF
    if nullish_a or nullish_b:
        return nullish_a and nullish_b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    if isinstance(a, (int, float, bool)) or isinstance(b, (int, float, bool)):
        na, nb = to_number(a if not isinstance(a, (JSArray,)) else js_str(a)), \
                 to_number(b if not isinstance(b, (JSArray,)) else js_str(b))
        if isinstance(na, float) and math.isnan(na):
            return False
        if isinstance(nb, float) and math.isnan(nb):
            return False
        return float(na) == float(nb)
    return a is b
