"""ECMAScript lexer for jsrt.

Produces a flat token list with newline flags (for pragmatic ASI) and
handles the regex-vs-divide ambiguity by looking at the previous
significant token, the same way real engines' scanners do.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "var", "let", "const", "function", "return", "if", "else", "for",
    "while", "do", "break", "continue", "new", "delete", "typeof",
    "instanceof", "in", "of", "this", "null", "true", "false",
    "undefined", "throw", "try", "catch", "finally", "switch", "case",
    "default", "async", "await", "class", "extends", "super", "import",
    "export", "from", "void", "yield", "static", "get", "set",
}

PUNCT = [
    ">>>=", "...", "===", "!==", "**=", "<<=", ">>=", ">>>", "&&=",
    "||=", "??=", "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.",
    "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "**",
    "<<", ">>", "{", "}", "(", ")", "[", "]", ";", ",", "<", ">", "+",
    "-", "*", "/", "%", "&", "|", "^", "!", "~", "?", ":", "=", ".",
]

# token types: num str tpl regex ident kw punct eof
@dataclass
class Tok:
    type: str
    value: object
    line: int
    nl_before: bool          # a line terminator precedes this token

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Tok({self.type},{self.value!r},L{self.line})"


class LexError(SyntaxError):
    pass


# Tokens after which a `/` must begin a regex literal, not division.
_REGEX_PRECEDERS_PUNCT = {
    "(", "[", "{", ";", ",", "=", "==", "===", "!=", "!==", "<", ">",
    "<=", ">=", "+", "-", "*", "/", "%", "&&", "||", "??", "!", "~",
    "?", ":", "=>", "+=", "-=", "*=", "/=", "%=", "&&=", "||=", "??=",
    "&", "|", "^", "<<", ">>", ">>>", "...", "**",
}
_REGEX_PRECEDERS_KW = {
    "return", "typeof", "instanceof", "in", "of", "new", "delete",
    "throw", "case", "do", "else", "void", "await", "yield",
}


def tokenize(src: str, path: str = "<js>") -> list[Tok]:
    toks: list[Tok] = []
    i, n, line = 0, len(src), 1
    nl = False

    def err(msg):
        raise LexError(f"{path}:{line}: {msg}")

    def prev_significant():
        return toks[-1] if toks else None

    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            nl = True
            i += 1
            continue
        if c in " \t\r\f\v ﻿":
            i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "/":
            while i < n and src[i] != "\n":
                i += 1
            continue
        if c == "/" and i + 1 < n and src[i + 1] == "*":
            j = src.find("*/", i + 2)
            if j < 0:
                err("unterminated block comment")
            seg = src[i:j]
            if "\n" in seg:
                line += seg.count("\n")
                nl = True
            i = j + 2
            continue

        start_line = line

        # regex literal?
        if c == "/":
            p = prev_significant()
            is_regex = (
                p is None
                or (p.type == "punct" and p.value in _REGEX_PRECEDERS_PUNCT)
                or (p.type == "kw" and p.value in _REGEX_PRECEDERS_KW)
            )
            if is_regex:
                j = i + 1
                in_class = False
                while j < n:
                    ch = src[j]
                    if ch == "\\":
                        j += 2
                        continue
                    if ch == "\n":
                        err("unterminated regex literal")
                    if ch == "[":
                        in_class = True
                    elif ch == "]":
                        in_class = False
                    elif ch == "/" and not in_class:
                        break
                    j += 1
                if j >= n:
                    err("unterminated regex literal")
                body = src[i + 1:j]
                j += 1
                fstart = j
                while j < n and (src[j].isalpha()):
                    j += 1
                flags = src[fstart:j]
                toks.append(Tok("regex", (body, flags), start_line, nl))
                nl = False
                i = j
                continue

        # string
        if c in "'\"":
            j = i + 1
            out = []
            while j < n and src[j] != c:
                ch = src[j]
                if ch == "\n":
                    err("unterminated string")
                if ch == "\\":
                    j += 1
                    if j >= n:
                        err("bad escape")
                    out.append(_escape(src, j))
                    j += _escape_len(src, j)
                    continue
                out.append(ch)
                j += 1
            if j >= n:
                err("unterminated string")
            toks.append(Tok("str", "".join(out), start_line, nl))
            nl = False
            i = j + 1
            continue

        # template literal: tokenized into a single structured token.
        # value = (quasis:[str], exprs:[token-sublists], raws:[str]) where
        # each expr sublist is re-fed to the parser; raws keep the quasi
        # text with escape sequences unprocessed (tagged templates' .raw)
        if c == "`":
            quasis: list[str] = []
            raws: list[str] = []
            exprs: list[list[Tok]] = []
            cur: list[str] = []
            cur_raw: list[str] = []
            j = i + 1
            while True:
                if j >= n:
                    err("unterminated template literal")
                ch = src[j]
                if ch == "\\":
                    j += 1
                    cur.append(_escape(src, j))
                    esc_n = _escape_len(src, j)
                    cur_raw.append("\\" + src[j:j + esc_n])
                    j += esc_n
                    continue
                if ch == "`":
                    quasis.append("".join(cur))
                    raws.append("".join(cur_raw))
                    j += 1
                    break
                if ch == "$" and j + 1 < n and src[j + 1] == "{":
                    quasis.append("".join(cur))
                    raws.append("".join(cur_raw))
                    cur = []
                    cur_raw = []
                    # find matching close brace, respecting nesting and
                    # nested strings/templates
                    depth = 1
                    k = j + 2
                    estart = k
                    while k < n and depth:
                        ck = src[k]
                        if ck == "{":
                            depth += 1
                        elif ck == "}":
                            depth -= 1
                            if depth == 0:
                                break
                        elif ck in "'\"":
                            q = ck
                            k += 1
                            while k < n and src[k] != q:
                                if src[k] == "\\":
                                    k += 1
                                k += 1
                        elif ck == "`":
                            # nested template: skip it wholesale
                            tdepth = 1
                            k += 1
                            while k < n and tdepth:
                                if src[k] == "\\":
                                    k += 1
                                elif src[k] == "`":
                                    tdepth -= 1
                                elif src[k] == "$" and k + 1 < n and src[k + 1] == "{":
                                    # rough: rely on balanced braces
                                    pass
                                k += 1
                            k -= 1
                        k += 1
                    if depth:
                        err("unterminated ${} in template")
                    sub = tokenize(src[estart:k], path)
                    line += src[estart:k].count("\n")
                    exprs.append(sub)
                    j = k + 1
                    continue
                if ch == "\n":
                    line += 1
                cur.append(ch)
                cur_raw.append(ch)
                j += 1
            toks.append(Tok("tpl", (quasis, exprs, raws), start_line, nl))
            nl = False
            i = j
            continue

        # number
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            if c == "0" and i + 1 < n and src[i + 1] in "xX":
                j = i + 2
                while j < n and (src[j] in "0123456789abcdefABCDEF_"):
                    j += 1
                val = int(src[i + 2:j].replace("_", ""), 16)
            elif c == "0" and i + 1 < n and src[i + 1] in "bB":
                j = i + 2
                while j < n and src[j] in "01_":
                    j += 1
                val = int(src[i + 2:j].replace("_", ""), 2)
            elif c == "0" and i + 1 < n and src[i + 1] in "oO":
                j = i + 2
                while j < n and src[j] in "01234567_":
                    j += 1
                val = int(src[i + 2:j].replace("_", ""), 8)
            else:
                seen_dot = seen_exp = False
                while j < n:
                    ch = src[j]
                    if ch.isdigit() or ch == "_":
                        j += 1
                    elif ch == "." and not seen_dot and not seen_exp:
                        seen_dot = True
                        j += 1
                    elif ch in "eE" and not seen_exp:
                        seen_exp = True
                        j += 1
                        if j < n and src[j] in "+-":
                            j += 1
                    else:
                        break
                text = src[i:j].replace("_", "")
                val = float(text) if (seen_dot or seen_exp) else int(text)
            toks.append(Tok("num", val, start_line, nl))
            nl = False
            i = j
            continue

        # identifier / keyword
        if c.isalpha() or c in "_$" or ord(c) > 127:
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] in "_$" or ord(src[j]) > 127):
                j += 1
            word = src[i:j]
            if word in KEYWORDS:
                toks.append(Tok("kw", word, start_line, nl))
            else:
                toks.append(Tok("ident", word, start_line, nl))
            nl = False
            i = j
            continue

        # private member name: #ident (class fields/methods)
        if c == "#" and i + 1 < n and (src[i + 1].isalpha()
                                       or src[i + 1] in "_$"):
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] in "_$"):
                j += 1
            toks.append(Tok("privid", src[i:j], start_line, nl))
            nl = False
            i = j
            continue

        # punctuation (longest match)
        for p in PUNCT:
            if src.startswith(p, i):
                # `?.` followed by a digit is `? .5 :` — not optional
                # chaining (not used by the SPA, but cheap to be right)
                if p == "?." and i + 2 < n and src[i + 2].isdigit():
                    continue
                toks.append(Tok("punct", p, start_line, nl))
                nl = False
                i += len(p)
                break
        else:
            err(f"unexpected character {c!r}")

    toks.append(Tok("eof", None, line, True))
    return toks


def _escape(src: str, j: int) -> str:
    ch = src[j]
    simple = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
              "v": "\v", "0": "\0", "\n": ""}
    if ch in simple:
        return simple[ch]
    if ch == "x":
        return chr(int(src[j + 1:j + 3], 16))
    if ch == "u":
        if src[j + 1] == "{":
            end = src.index("}", j)
            return chr(int(src[j + 2:end], 16))
        return chr(int(src[j + 1:j + 5], 16))
    return ch


def _escape_len(src: str, j: int) -> int:
    ch = src[j]
    if ch == "x":
        return 3
    if ch == "u":
        if src[j + 1] == "{":
            return src.index("}", j) - j + 1
        return 5
    return 1
