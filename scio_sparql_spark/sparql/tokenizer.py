"""SPARQL / Turtle tokenizer.

The reference delegates parsing to rdf4j's SPARQL parser
(reference: Interpreter.scala:196-203); no rdf4j exists here, so we
tokenize/parse ourselves. Grammar follows the public W3C SPARQL 1.1 /
Turtle specs (EBNF in spec §19.8).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Tok:
    kind: str
    value: str
    pos: int


_TOKEN_RES = [
    ("WS", re.compile(r"[ \t\r\n]+")),
    ("COMMENT", re.compile(r"#[^\n]*")),
    ("IRIREF", re.compile(r"<([^<>\"{}|^`\\\x00-\x20]*)>")),
    ("STRING", re.compile(
        r'"""((?:[^"\\]|\\.|"(?!""))*)"""'
        r"|'''((?:[^'\\]|\\.|'(?!''))*)'''"
        r'|"((?:[^"\\\n]|\\.)*)"'
        r"|'((?:[^'\\\n]|\\.)*)'"
    )),
    ("BLANK", re.compile(r"_:([A-Za-z0-9_][A-Za-z0-9_.-]*)")),
    ("VAR", re.compile(r"[?$]([A-Za-z0-9_]+)")),
    ("LANGTAG", re.compile(r"@([A-Za-z]+(?:-[A-Za-z0-9]+)*)")),
    # DECIMAL requires digits after the dot (spec [79]): '1.' must stay
    # NUMBER '1' + OP '.' so Turtle statements ending "... 1 ." parse.
    ("NUMBER", re.compile(r"(?:\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?")),
    # PNAME: optional prefix part, ':', optional local part.  Local names may
    # contain dots but not end with one (spec PN_LOCAL).
    ("PNAME", re.compile(
        r"([A-Za-z_][A-Za-z0-9_.-]*)?:"
        r"((?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])"
        r"(?:[A-Za-z0-9_.\-]|%[0-9A-Fa-f]{2}|\\[_~.\-!$&'()*+,;=/?#@%])*)?"
    )),
    ("KEYWORD", re.compile(r"[A-Za-z_][A-Za-z0-9_]*")),
    ("OP", re.compile(r"\^\^|&&|\|\||!=|<=|>=|[{}()\[\];,.=<>!+\-*/|^?@]")),
]

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def unescape_string(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n == "u" and i + 5 < len(s) + 1:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if n == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(n, n))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def unescape_local(s: str) -> str:
    return re.sub(r"\\([_~.\-!$&'()*+,;=/?#@%])", r"\1", s)


def tokenize(text: str) -> list[Tok]:
    toks: list[Tok] = []
    i, n = 0, len(text)
    while i < n:
        for kind, rx in _TOKEN_RES:
            m = rx.match(text, i)
            if not m:
                continue
            if kind == "IRIREF":
                toks.append(Tok("IRIREF", m.group(1), i))
            elif kind == "STRING":
                raw = next(g for g in m.groups() if g is not None)
                toks.append(Tok("STRING", unescape_string(raw), i))
            elif kind == "BLANK":
                toks.append(Tok("BLANK", m.group(1), i))
            elif kind == "VAR":
                toks.append(Tok("VAR", m.group(1), i))
            elif kind == "LANGTAG":
                toks.append(Tok("LANGTAG", m.group(1), i))
            elif kind == "PNAME":
                toks.append(
                    Tok("PNAME", (m.group(1) or "") + ":" + unescape_local(m.group(2) or ""), i)
                )
            elif kind == "KEYWORD":
                toks.append(Tok("KEYWORD", m.group(0), i))
            elif kind == "NUMBER":
                toks.append(Tok("NUMBER", m.group(0), i))
            elif kind == "OP":
                toks.append(Tok("OP", m.group(0), i))
            i = m.end()
            break
        else:
            raise SyntaxError(f"cannot tokenize at offset {i}: {text[i:i+30]!r}")
    toks.append(Tok("EOF", "", n))
    return toks
