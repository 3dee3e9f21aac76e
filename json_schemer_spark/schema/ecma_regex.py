"""ECMA-262 regex semantics → Python ``re`` / Java ``rlike`` translation.

JSON Schema ``pattern``/``patternProperties``/``format:regex`` use ECMA-262
semantics (SURVEY.md §2.2; the reference translates ECMA→Ruby in
lib/json_schemer/ecma_regexp.rb:38-49 — we translate ECMA→Python and
ECMA→Java instead, from the ECMA-262 spec, not from that code):

- ``\\d \\D \\w \\W`` are ASCII-only in ECMA (Python defaults to Unicode)
- ``\\s`` is ECMA WhiteSpace ∪ LineTerminator (includes U+00A0, U+FEFF,
  general-category Zs — NOT the same as either Python's or Java's ``\\s``)
- ``$`` anchors the very end (Python/Java ``$`` also match before a
  trailing newline) → ``\\Z`` (py) / ``\\z`` (java)
- ``.`` excludes \\n \\r U+2028 U+2029 (Python excludes only \\n)
- ``\\cX`` control escapes (Python has no ``\\c``)
- ``\\p{...}`` property classes (Python ``re`` has none → approximate;
  Java has its own spellings)
- surrogate pairs ``\\uD8xx\\uDCxx`` → the astral code point
"""

from __future__ import annotations

import re

# ECMA WhiteSpace + LineTerminator (space chars per Unicode Zs included)
ECMA_WS = (
    "\\t\\n\\x0b\\f\\r \\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
)

_P_PROPS_PY = {
    # python re has no \p{..}: approximate with class algebra (unicode mode)
    "letter": r"[^\W\d_]",
    "l": r"[^\W\d_]",
    "digit": r"\d",
    "nd": r"\d",
    "number": r"\d",
    "n": r"\d",
}
_P_PROPS_JAVA = {
    "letter": r"\p{L}",
    "l": r"\p{L}",
    "digit": r"\p{Nd}",
    "nd": r"\p{Nd}",
    "number": r"\p{N}",
    "n": r"\p{N}",
}


class EcmaRegexError(ValueError):
    pass


def translate(pattern: str, flavor: str = "python") -> str:
    """Translate an ECMA-262 pattern to the target flavor."""
    java = flavor == "java"
    out: list[str] = []
    in_class = False
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt == "c" and i + 2 < n and pattern[i + 2].isalpha():
                code = ord(pattern[i + 2].upper()) - 64
                out.append(f"\\x{code:02x}")
                i += 3
                continue
            if nxt in "dD" :
                if in_class:
                    out.append("0-9" if nxt == "d" else "\\D")
                else:
                    out.append("[0-9]" if nxt == "d" else "[^0-9]")
                i += 2
                continue
            if nxt in "wW":
                if in_class:
                    out.append("A-Za-z0-9_" if nxt == "w" else "\\W")
                else:
                    out.append("[A-Za-z0-9_]" if nxt == "w" else "[^A-Za-z0-9_]")
                i += 2
                continue
            if nxt in "sS":
                if in_class:
                    out.append(ECMA_WS if nxt == "s" else "\\S")
                else:
                    out.append(f"[{ECMA_WS}]" if nxt == "s" else f"[^{ECMA_WS}]")
                i += 2
                continue
            if nxt in "pP":
                m = re.match(r"\\[pP]\{([A-Za-z_]+)\}", pattern[i:])
                if not m:
                    raise EcmaRegexError(f"malformed \\p at {i} in {pattern!r}")
                name = m.group(1).lower()
                table = _P_PROPS_JAVA if java else _P_PROPS_PY
                repl = table.get(name)
                if repl is None:
                    if java:
                        repl = "\\" + nxt + "{" + m.group(1) + "}"  # Java native
                    else:
                        raise EcmaRegexError(f"unsupported \\p{{{m.group(1)}}}")
                if nxt == "P" and not java:
                    raise EcmaRegexError("\\P unsupported in python flavor")
                out.append(repl)
                i += m.end()
                continue
            if nxt == "u" and i + 5 < n and re.match(r"[0-9A-Fa-f]{4}", pattern[i + 2 : i + 6]):
                cp = int(pattern[i + 2 : i + 6], 16)
                i += 6
                # combine a surrogate pair into one astral code point
                if 0xD800 <= cp <= 0xDBFF and pattern[i : i + 2] == "\\u":
                    m2 = re.match(r"[0-9A-Fa-f]{4}", pattern[i + 2 : i + 6] or "")
                    if m2:
                        lo = int(pattern[i + 2 : i + 6], 16)
                        if 0xDC00 <= lo <= 0xDFFF:
                            cp = 0x10000 + ((cp - 0xD800) << 10) + (lo - 0xDC00)
                            i += 6
                if java:
                    out.append(f"\\x{{{cp:x}}}")
                else:
                    out.append(f"\\U{cp:08x}" if cp > 0xFFFF else f"\\u{cp:04x}")
                continue
            # any other escape passes through untouched
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if ch == "[" and not in_class:
            in_class = True
            out.append(ch)
            # ECMA allows []...] and [^] — python needs tweaks for '[]'
            if pattern[i + 1 : i + 2] == "^" and pattern[i + 2 : i + 3] == "]":
                out.append("^\\]")
                i += 3
                in_class = True
                continue
            i += 1
            continue
        if ch == "]" and in_class:
            in_class = False
            out.append(ch)
            i += 1
            continue
        if not in_class and ch == "$":
            out.append("\\z" if java else "\\Z")
            i += 1
            continue
        if not in_class and ch == ".":
            out.append("[^\\n\\r\\u2028\\u2029]")
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def compile_ecma(pattern: str):
    """ECMA pattern → compiled Python regex (raises EcmaRegexError)."""
    translated = translate(pattern, flavor="python")
    try:
        return re.compile(translated)
    except re.error as exc:
        raise EcmaRegexError(f"{pattern!r} → {translated!r}: {exc}") from exc
