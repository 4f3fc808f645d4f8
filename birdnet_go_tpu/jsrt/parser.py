"""Pratt parser for jsrt.

Builds a tuple AST from the lexer's token stream.  Covers the ES2020
subset the SPA uses (see package docstring); anything outside it is a
clean SyntaxError naming file:line, which is itself a CI signal.

AST nodes are plain tuples: (type, ...fields).  See _PREC for the
operator grammar.
"""

from __future__ import annotations

from .lexer import Tok, tokenize

UNARY_OPS = {"!", "-", "+", "~", "typeof", "void", "delete"}

_PREC = {
    "??": 1, "||": 2, "&&": 3, "|": 4, "^": 5, "&": 6,
    "==": 7, "!=": 7, "===": 7, "!==": 7,
    "<": 8, ">": 8, "<=": 8, ">=": 8, "instanceof": 8, "in": 8,
    "<<": 9, ">>": 9, ">>>": 9,
    "+": 10, "-": 10,
    "*": 11, "/": 11, "%": 11,
    "**": 12,
}

ASSIGN_OPS = {"=", "+=", "-=", "*=", "/=", "%=", "&&=", "||=", "??=",
              "&=", "|=", "^=", "<<=", ">>=", ">>>=", "**="}


class JSSyntaxError(SyntaxError):
    pass


class Parser:
    def __init__(self, toks: list[Tok], path: str = "<js>"):
        self.toks = toks
        self.i = 0
        self.path = path

    # ------------------------------------------------------------ plumbing

    def peek(self, k=0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        if t.type != "eof":
            self.i += 1
        return t

    def at(self, type_, value=None) -> bool:
        t = self.peek()
        return t.type == type_ and (value is None or t.value == value)

    def at_any(self, type_, values) -> bool:
        t = self.peek()
        return t.type == type_ and t.value in values

    def eat(self, type_, value=None) -> bool:
        if self.at(type_, value):
            self.next()
            return True
        return False

    def expect(self, type_, value=None) -> Tok:
        t = self.peek()
        if not self.at(type_, value):
            raise JSSyntaxError(
                f"{self.path}:{t.line}: expected {value or type_}, got "
                f"{t.value!r}")
        return self.next()

    def semi(self):
        """Pragmatic ASI: `;`, or newline / `}` / EOF terminates."""
        if self.eat("punct", ";"):
            return
        t = self.peek()
        if t.nl_before or t.type == "eof" or (t.type == "punct" and t.value == "}"):
            return
        raise JSSyntaxError(
            f"{self.path}:{t.line}: expected ';' before {t.value!r}")

    # ----------------------------------------------------------- programs

    def parse_program(self):
        stmts = []
        while not self.at("eof"):
            stmts.append(self.statement())
        return ("program", stmts)

    # ---------------------------------------------------------- statements

    def statement(self):
        line = self.peek().line
        node = self._statement_inner()
        # wrap for diagnostics: the interpreter tracks file:line of the
        # innermost executing statement so uncaught errors are locatable
        return ("stmt", line, node)

    def _statement_inner(self):
        t = self.peek()
        if t.type == "ident" and self.peek(1).type == "punct" \
                and self.peek(1).value == ":":
            self.next()
            self.next()
            return ("label", t.value, self.statement())
        if t.type == "punct" and t.value == "{":
            return self.block()
        if t.type == "punct" and t.value == ";":
            self.next()
            return ("empty",)
        if t.type == "kw":
            kw = t.value
            if kw in ("var", "let", "const"):
                # `let` used as identifier is not supported; fine here.
                node = self.var_decl()
                self.semi()
                return node
            if kw == "function":
                return self.func_decl(is_async=False)
            if kw == "async" and self.peek(1).type == "kw" \
                    and self.peek(1).value == "function":
                self.next()
                return self.func_decl(is_async=True)
            if kw == "if":
                return self.if_stmt()
            if kw == "for":
                return self.for_stmt()
            if kw == "while":
                self.next()
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                return ("while", cond, self.statement())
            if kw == "do":
                self.next()
                body = self.statement()
                self.expect("kw", "while")
                self.expect("punct", "(")
                cond = self.expression()
                self.expect("punct", ")")
                self.eat("punct", ";")
                return ("dowhile", body, cond)
            if kw == "return":
                self.next()
                nxt = self.peek()
                if nxt.nl_before or self.at("punct", ";") \
                        or self.at("punct", "}") or nxt.type == "eof":
                    self.semi()
                    return ("return", None)
                e = self.expression()
                self.semi()
                return ("return", e)
            if kw == "break":
                self.next()
                label = None
                if self.at("ident") and not self.peek().nl_before:
                    label = self.next().value
                self.semi()
                return ("break", label)
            if kw == "continue":
                self.next()
                label = None
                if self.at("ident") and not self.peek().nl_before:
                    label = self.next().value
                self.semi()
                return ("continue", label)
            if kw == "throw":
                self.next()
                e = self.expression()
                self.semi()
                return ("throw", e)
            if kw == "try":
                return self.try_stmt()
            if kw == "switch":
                return self.switch_stmt()
            if kw == "import":
                return self.import_stmt()
            if kw == "export":
                return self.export_stmt()
            if kw == "class":
                return self.class_decl()
        e = self.expression()
        self.semi()
        return ("expr", e)

    def block(self):
        self.expect("punct", "{")
        stmts = []
        while not self.at("punct", "}"):
            stmts.append(self.statement())
        self.expect("punct", "}")
        return ("block", stmts)

    def var_decl(self):
        kind = self.next().value
        decls = []
        while True:
            pat = self.binding_pattern()
            init = None
            if self.eat("punct", "="):
                init = self.assignment()
            decls.append((pat, init))
            if not self.eat("punct", ","):
                break
        return ("var", kind, decls)

    _CONTEXTUAL = ("get", "set", "of", "from", "async", "static")

    def func_decl(self, is_async):
        self.expect("kw", "function")
        is_gen = bool(self.eat("punct", "*"))
        if self.at_any("kw", self._CONTEXTUAL):
            name = self.next().value          # contextual keyword as name
        else:
            name = self.expect("ident").value
        params = self.param_list()
        body = self.block()
        return ("func", name, params, body, is_async, is_gen)

    def param_list(self):
        self.expect("punct", "(")
        params = []
        rest = None
        while not self.at("punct", ")"):
            if self.eat("punct", "..."):
                rest = self.expect("ident").value
                break
            pat = self.binding_pattern()
            default = self.assignment() if self.eat("punct", "=") else None
            params.append((pat, default))
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        return (params, rest)

    def class_decl(self, as_expr=False):
        """ES class: methods (incl. generator/async-generator), get/set
        accessors, static members, instance and static fields, private
        #fields/#methods/#accessors, extends + super, and `static {}`
        initialization blocks."""
        self.expect("kw", "class")
        name = None
        if self.at("ident") or self.at_any("kw", self._CONTEXTUAL):
            name = self.next().value
        parent = None
        if self.eat("kw", "extends"):
            parent = self.call_member(self.primary())
        members = self.class_body()
        return ("classexpr" if as_expr else "classdecl", name, parent,
                members)

    def _kw_is_member_name(self, k=0) -> bool:
        """At position k sits a kw (static/async/get/set); is it being
        used as the MEMBER NAME rather than a modifier? True when the
        next token starts a method/field continuation."""
        nxt = self.peek(k + 1)
        return nxt.type == "punct" and nxt.value in ("(", "=", ";", "}")

    def class_body(self):
        self.expect("punct", "{")
        members = []   # (kind, key_node, computed, is_static, value_node)
        while not self.at("punct", "}"):
            if self.eat("punct", ";"):
                continue
            line = self.peek().line
            is_static = False
            if self.at("kw", "static") and not self._kw_is_member_name():
                self.next()
                is_static = True
            # `static { … }` initialization block: runs once at class
            # definition with `this` bound to the class, interleaved in
            # member order with static field initializers
            if is_static and self.at("punct", "{"):
                members.append(("staticblock", None, False, True,
                                self.block()))
                continue
            is_async = False
            if self.at("kw", "async") and not self._kw_is_member_name() \
                    and not self.peek(1).nl_before:
                self.next()
                is_async = True
            # `*` directly before the member name marks a generator
            # method (`*seq()`, `async *pages()`, `static *twice()`);
            # get/set accessors can never be generators, so the
            # accessor scan only runs when no `*` was consumed.
            is_gen = bool(self.eat("punct", "*"))
            kind = "method"
            if not is_gen:
                for acc in ("get", "set"):
                    if self.at("kw", acc) and not self._kw_is_member_name():
                        self.next()
                        kind = acc
                        break
            computed = False
            if self.eat("punct", "["):
                key = self.assignment()
                self.expect("punct", "]")
                computed = True
            else:
                kt = self.next()
                if kt.type in ("ident", "kw", "str", "privid"):
                    key = ("str", kt.value)
                elif kt.type == "num":
                    key = ("str", _num_key(kt.value))
                else:
                    raise JSSyntaxError(
                        f"{self.path}:{kt.line}: bad class member name "
                        f"{kt.value!r}")
            if self.at("punct", "("):
                params = self.param_list()
                body = self.block()
                members.append((kind, key, computed, is_static,
                                ("funcexpr", None, params, body, is_async,
                                 is_gen)))
                continue
            if kind in ("get", "set"):
                raise JSSyntaxError(
                    f"{self.path}:{line}: accessor needs a body")
            if is_gen:
                raise JSSyntaxError(
                    f"{self.path}:{line}: '*' marks a generator method, "
                    "which needs a parameter list and body")
            init = self.assignment() if self.eat("punct", "=") else None
            self.semi()
            members.append(("field", key, computed, is_static, init))
        self.expect("punct", "}")
        return members

    def if_stmt(self):
        self.expect("kw", "if")
        self.expect("punct", "(")
        cond = self.expression()
        self.expect("punct", ")")
        then = self.statement()
        alt = self.statement() if self.eat("kw", "else") else None
        return ("if", cond, then, alt)

    def for_stmt(self):
        self.expect("kw", "for")
        # `for await (… of …)` — only the of-form may carry await
        is_await = bool(self.eat("kw", "await"))
        self.expect("punct", "(")
        init = None
        if self.at("punct", ";"):
            self.next()
        elif self.at_any("kw", ("var", "let", "const")):
            kind = self.peek().value
            save = self.i
            self.next()
            pat = self.binding_pattern()
            if self.at("kw", "of") or self.at("kw", "in"):
                which = self.next().value
                obj = self.assignment()
                self.expect("punct", ")")
                return (self._for_kind(which, is_await), kind, pat, obj,
                        self.statement())
            self.i = save
            init = self.var_decl()
            self.expect("punct", ";")
        else:
            save = self.i
            e = self.expression()
            if self.at("kw", "of") or self.at("kw", "in"):
                which = self.next().value
                obj = self.assignment()
                self.expect("punct", ")")
                pat = self.expr_to_pattern(e)
                return (self._for_kind(which, is_await), None, pat, obj,
                        self.statement())
            init = ("expr", e)
            self.expect("punct", ";")
        if is_await:
            raise JSSyntaxError(
                f"{self.path}:{self.peek().line}: 'for await' is only "
                "valid with for…of")
        test = None if self.at("punct", ";") else self.expression()
        self.expect("punct", ";")
        update = None if self.at("punct", ")") else self.expression()
        self.expect("punct", ")")
        return ("for", init, test, update, self.statement())

    def _for_kind(self, which, is_await):
        if not is_await:
            return "for" + which
        if which != "of":
            raise JSSyntaxError(
                f"{self.path}:{self.peek().line}: 'for await' is only "
                "valid with for…of")
        return "forawait"

    def try_stmt(self):
        self.expect("kw", "try")
        block = self.block()
        param = catch = fin = None
        if self.eat("kw", "catch"):
            if self.eat("punct", "("):
                param = self.binding_pattern()
                self.expect("punct", ")")
            catch = self.block()
        if self.eat("kw", "finally"):
            fin = self.block()
        return ("try", block, param, catch, fin)

    def switch_stmt(self):
        self.expect("kw", "switch")
        self.expect("punct", "(")
        disc = self.expression()
        self.expect("punct", ")")
        self.expect("punct", "{")
        cases = []
        while not self.at("punct", "}"):
            if self.eat("kw", "case"):
                test = self.expression()
            else:
                self.expect("kw", "default")
                test = None
            self.expect("punct", ":")
            body = []
            while not (self.at("kw", "case") or self.at("kw", "default")
                       or self.at("punct", "}")):
                body.append(self.statement())
            cases.append((test, body))
        self.expect("punct", "}")
        return ("switch", disc, cases)

    def import_stmt(self):
        self.expect("kw", "import")
        specs = []
        if self.at("str"):                       # bare `import "x"`
            src = self.next().value
            self.semi()
            return ("import", [], src)
        if self.at("ident"):                     # default import
            specs.append(("default", self.next().value))
            self.eat("punct", ",")
        if self.eat("punct", "{"):
            while not self.at("punct", "}"):
                tok = self.next()
                if tok.type not in ("ident", "kw"):
                    raise JSSyntaxError(
                        f"{self.path}:{tok.line}: bad import specifier")
                imported = tok.value
                local = imported
                if self.eat("ident", "as"):
                    local = self.expect("ident").value
                specs.append((imported, local))
                if not self.eat("punct", ","):
                    break
            self.expect("punct", "}")
        self.expect("kw", "from")
        src = self.expect("str").value
        self.semi()
        return ("import", specs, src)

    def export_stmt(self):
        self.expect("kw", "export")
        if self.eat("punct", "{"):
            names = []
            while not self.at("punct", "}"):
                local = self.expect("ident").value
                exported = local
                if self.eat("ident", "as"):
                    exported = self.expect("ident").value
                names.append((local, exported))
                if not self.eat("punct", ","):
                    break
            self.expect("punct", "}")
            self.semi()
            return ("exportnames", names)
        if self.at("kw", "default"):
            self.next()
            e = self.assignment()
            self.semi()
            return ("exportdefault", e)
        decl = self.statement()
        return ("export", decl)

    # --------------------------------------------------------- expressions

    def expression(self):
        e = self.assignment()
        if self.at("punct", ","):
            exprs = [e]
            while self.eat("punct", ","):
                exprs.append(self.assignment())
            return ("seq", exprs)
        return e

    def assignment(self):
        if self.at("kw", "yield"):
            self.next()
            deleg = bool(self.eat("punct", "*"))
            t = self.peek()
            if not deleg and (t.nl_before or t.type == "eof"
                              or (t.type == "punct"
                                  and t.value in (")", "]", "}",
                                                  ",", ";", ":"))):
                return ("yield", None, False)
            return ("yield", self.assignment(), deleg)
        if self.is_arrow_ahead():
            return self.arrow()
        left = self.conditional()
        t = self.peek()
        if t.type == "punct" and t.value in ASSIGN_OPS:
            op = self.next().value
            right = self.assignment()
            if op == "=" and left[0] in ("array", "object"):
                left = self.expr_to_pattern(left)
                return ("passign", left, right)
            return ("assign", op, left, right)
        return left

    def is_arrow_ahead(self) -> bool:
        """Lookahead: `ident =>`, `async ident =>`, `( … ) =>`,
        `async ( … ) =>`."""
        j = self.i
        toks = self.toks
        if toks[j].type == "kw" and toks[j].value == "async" \
                and not toks[j + 1].nl_before:
            j += 1
        t = toks[j]
        if t.type == "ident" and toks[j + 1].type == "punct" \
                and toks[j + 1].value == "=>":
            return True
        if t.type == "punct" and t.value == "(":
            depth = 0
            while j < len(toks):
                tv = toks[j]
                if tv.type == "punct" and tv.value == "(":
                    depth += 1
                elif tv.type == "punct" and tv.value == ")":
                    depth -= 1
                    if depth == 0:
                        nxt = toks[j + 1]
                        return nxt.type == "punct" and nxt.value == "=>"
                elif tv.type == "eof":
                    return False
                j += 1
        return False

    def arrow(self):
        is_async = False
        if self.at("kw", "async"):
            self.next()
            is_async = True
        if self.at("ident"):
            params = ([(("pid", self.next().value), None)], None)
        else:
            params = self.param_list()
        self.expect("punct", "=>")
        if self.at("punct", "{"):
            body = self.block()
            return ("arrow", params, body, is_async, False)
        body = self.assignment()
        return ("arrow", params, body, is_async, True)

    def conditional(self):
        cond = self.binary(0)
        if self.eat("punct", "?"):
            cons = self.assignment()
            self.expect("punct", ":")
            alt = self.assignment()
            return ("cond", cond, cons, alt)
        return cond

    def binary(self, min_prec):
        left = self.unary()
        while True:
            t = self.peek()
            op = None
            if t.type == "punct" and t.value in _PREC:
                op = t.value
            elif t.type == "kw" and t.value in ("instanceof", "in"):
                op = t.value
            if op is None:
                return left
            prec = _PREC[op]
            if prec < min_prec:
                return left
            self.next()
            # ** is right-assoc; all others left
            right = self.binary(prec if op == "**" else prec + 1)
            kind = "logical" if op in ("&&", "||", "??") else "binary"
            left = (kind, op, left, right)

    def unary(self):
        t = self.peek()
        if t.type == "punct" and t.value in ("!", "-", "+", "~"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.type == "kw" and t.value in ("typeof", "void", "delete"):
            self.next()
            return ("unary", t.value, self.unary())
        if t.type == "punct" and t.value in ("++", "--"):
            self.next()
            return ("update", t.value, True, self.unary())
        if t.type == "kw" and t.value == "await":
            self.next()
            return ("await", self.unary())
        return self.postfix()

    def postfix(self):
        e = self.call_member(self.primary())
        t = self.peek()
        if t.type == "punct" and t.value in ("++", "--") and not t.nl_before:
            self.next()
            return ("update", t.value, False, e)
        return e

    def call_member(self, e, no_call=False):
        while True:
            t = self.peek()
            if t.type == "punct" and t.value == ".":
                self.next()
                name = self.next()
                if name.type not in ("ident", "kw", "privid"):
                    raise JSSyntaxError(
                        f"{self.path}:{name.line}: bad member name")
                e = ("member", e, name.value, False, False)
            elif t.type == "punct" and t.value == "?.":
                self.next()
                if self.at("punct", "("):
                    e = ("call", e, self.arguments(), True)
                elif self.at("punct", "["):
                    self.next()
                    prop = self.expression()
                    self.expect("punct", "]")
                    e = ("member", e, prop, True, True)
                else:
                    name = self.next()
                    e = ("member", e, name.value, False, True)
            elif t.type == "punct" and t.value == "[":
                self.next()
                prop = self.expression()
                self.expect("punct", "]")
                e = ("member", e, prop, True, False)
            elif t.type == "punct" and t.value == "(" and not no_call:
                e = ("call", e, self.arguments(), False)
            elif t.type == "tpl":
                quasis, exprs, raws = self.next().value
                parsed = [Parser(sub + [Tok("eof", None, t.line, True)],
                                 self.path).expression() for sub in exprs]
                e = ("tagged", e, quasis, parsed, raws)
            else:
                return e

    def arguments(self):
        self.expect("punct", "(")
        args = []
        while not self.at("punct", ")"):
            if self.eat("punct", "..."):
                args.append(("spread", self.assignment()))
            else:
                args.append(self.assignment())
            if not self.eat("punct", ","):
                break
        self.expect("punct", ")")
        return args

    def primary(self):
        t = self.next()
        if t.type == "num":
            return ("num", t.value)
        if t.type == "str":
            return ("str", t.value)
        if t.type == "regex":
            return ("regex", t.value[0], t.value[1])
        if t.type == "tpl":
            quasis, exprs, _raws = t.value
            parsed = [Parser(sub + [Tok("eof", None, t.line, True)],
                             self.path).expression() for sub in exprs]
            return ("tpl", quasis, parsed)
        if t.type == "ident":
            return ("ident", t.value)
        if t.type == "kw":
            kw = t.value
            if kw == "this":
                return ("this",)
            if kw in ("null", "true", "false", "undefined"):
                return ("lit", kw)
            if kw == "function":
                is_gen = bool(self.eat("punct", "*"))
                name = self.next().value if self.at("ident") else None
                params = self.param_list()
                body = self.block()
                return ("funcexpr", name, params, body, False, is_gen)
            if kw == "async" and self.at("kw", "function"):
                self.next()
                is_gen = bool(self.eat("punct", "*"))
                name = self.next().value if self.at("ident") else None
                params = self.param_list()
                body = self.block()
                return ("funcexpr", name, params, body, True, is_gen)
            if kw == "new":
                callee = self.call_member(self.primary(), no_call=True)
                args = self.arguments() if self.at("punct", "(") else []
                return ("new", callee, args)
            if kw == "class":
                self.i -= 1
                return self.class_decl(as_expr=True)
            if kw == "super":
                return ("super",)
            if kw in ("get", "set", "of", "from", "static", "await", "async"):
                # contextual keywords in identifier position
                return ("ident", kw)
            raise JSSyntaxError(
                f"{self.path}:{t.line}: unexpected keyword {kw!r}")
        if t.type == "punct":
            if t.value == "(":
                e = self.expression()
                self.expect("punct", ")")
                return e
            if t.value == "[":
                elems = []
                while not self.at("punct", "]"):
                    if self.at("punct", ","):
                        self.next()
                        elems.append(None)
                        continue
                    if self.eat("punct", "..."):
                        elems.append(("spread", self.assignment()))
                    else:
                        elems.append(self.assignment())
                    if not self.at("punct", "]"):
                        self.expect("punct", ",")
                self.expect("punct", "]")
                return ("array", elems)
            if t.value == "{":
                return self.object_literal()
        raise JSSyntaxError(
            f"{self.path}:{t.line}: unexpected token {t.value!r}")

    def object_literal(self):
        props = []
        while not self.at("punct", "}"):
            if self.eat("punct", "..."):
                props.append(("spread", self.assignment()))
                if not self.eat("punct", ","):
                    break
                continue
            is_async = False
            if self.at("kw", "async"):
                nxt = self.peek(1)
                # `async` is a modifier when a member name (or `*` /
                # computed `[`) follows; otherwise it IS the key
                if nxt.type in ("ident", "kw", "str", "num") \
                        or (nxt.type == "punct" and nxt.value in ("*", "[")):
                    self.next()
                    is_async = True
            is_gen = bool(self.eat("punct", "*"))    # {*m(){}} / {async *m(){}}
            computed = False
            if self.eat("punct", "["):
                key = self.assignment()
                self.expect("punct", "]")
                computed = True
            else:
                kt = self.next()
                if kt.type in ("ident", "kw"):
                    key = ("str", kt.value)
                elif kt.type == "str":
                    key = ("str", kt.value)
                elif kt.type == "num":
                    key = ("str", _num_key(kt.value))
                else:
                    raise JSSyntaxError(
                        f"{self.path}:{kt.line}: bad object key")
            if is_gen and not self.at("punct", "("):
                raise JSSyntaxError(
                    f"{self.path}:{self.peek().line}: '*' marks a "
                    "generator method, which needs a parameter list "
                    "and body")
            if self.at("punct", "("):               # method shorthand
                params = self.param_list()
                body = self.block()
                props.append(("prop", key, ("funcexpr", None, params, body,
                                            is_async, is_gen), computed))
            elif self.eat("punct", ":"):
                props.append(("prop", key, self.assignment(), computed))
            else:                                    # shorthand {a} / {a = 1}
                name = key[1]
                if self.eat("punct", "="):
                    props.append(("prop", key,
                                  ("shortdefault", name, self.assignment()),
                                  False))
                else:
                    props.append(("prop", key, ("ident", name), computed))
            if not self.eat("punct", ","):
                break
        self.expect("punct", "}")
        return ("object", props)

    # ----------------------------------------------------------- patterns

    def binding_pattern(self):
        if self.at("ident") or self.at_any("kw", ("get", "set", "of", "from",
                                                  "async", "static")):
            return ("pid", self.next().value)
        if self.eat("punct", "["):
            elems = []
            rest = None
            while not self.at("punct", "]"):
                if self.at("punct", ","):
                    self.next()
                    elems.append(None)
                    continue
                if self.eat("punct", "..."):
                    rest = self.expect("ident").value
                    break
                pat = self.binding_pattern()
                default = self.assignment() if self.eat("punct", "=") else None
                elems.append((pat, default))
                if not self.at("punct", "]"):
                    self.expect("punct", ",")
            self.expect("punct", "]")
            return ("parr", elems, rest)
        if self.eat("punct", "{"):
            props = []
            rest = None
            while not self.at("punct", "}"):
                if self.eat("punct", "..."):
                    rest = self.expect("ident").value
                    break
                computed = False
                if self.eat("punct", "["):
                    key = self.assignment()
                    self.expect("punct", "]")
                    computed = True
                else:
                    kt = self.next()
                    if kt.type in ("ident", "kw", "str"):
                        key = ("str", kt.value)
                    elif kt.type == "num":
                        key = ("str", _num_key(kt.value))
                    else:
                        raise JSSyntaxError(
                            f"{self.path}:{kt.line}: bad pattern key")
                if self.eat("punct", ":"):
                    pat = self.binding_pattern()
                else:
                    pat = ("pid", key[1])
                default = self.assignment() if self.eat("punct", "=") else None
                props.append((key, computed, pat, default))
                if not self.eat("punct", ","):
                    break
            self.expect("punct", "}")
            return ("pobj", props, rest)
        t = self.peek()
        raise JSSyntaxError(
            f"{self.path}:{t.line}: expected binding pattern, got {t.value!r}")

    def expr_to_pattern(self, e):
        """Convert an expression AST to a pattern (for `[a, b] = x`)."""
        kind = e[0]
        if kind == "ident":
            return ("pid", e[1])
        if kind == "member":
            return ("pmember", e)
        if kind == "array":
            elems = []
            rest = None
            for el in e[1]:
                if el is None:
                    elems.append(None)
                elif el[0] == "spread":
                    rest = el[1][1] if el[1][0] == "ident" else None
                else:
                    elems.append((self.expr_to_pattern(el), None))
            return ("parr", elems, rest)
        if kind == "object":
            props = []
            rest = None
            for p in e[1]:
                if p[0] == "spread":
                    rest = p[1][1]
                    continue
                _, key, value, computed = p
                if value[0] == "shortdefault":
                    props.append((key, computed, ("pid", value[1]), value[2]))
                else:
                    props.append((key, computed,
                                  self.expr_to_pattern(value), None))
            return ("pobj", props, rest)
        if kind == "assign" and e[1] == "=":
            inner = self.expr_to_pattern(e[2])
            if inner[0] == "pid":
                # `a = 1` inside a destructuring target
                return ("pdefault", inner, e[3])
        raise JSSyntaxError(f"{self.path}: invalid assignment target {kind}")


def _num_key(v):
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def parse(src: str, path: str = "<js>"):
    return Parser(tokenize(src, path), path).parse_program()
