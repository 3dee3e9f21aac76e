"""idn-hostname validation: IDNA-2008 label rules (RFC 5890-5893 subset).

From-scratch implementation of the rules the JSON-Schema suite exercises
(the reference drives the same checks through two ~1000-char regexes in
lib/json_schemer/format/hostname.rb — we use unicodedata instead):

- label separators: '.', U+3002, U+FF0E, U+FF61
- LDH + no leading/trailing hyphen; '--' in 3rd/4th position reserved for
  A-labels; A-labels (xn--) must punycode round-trip and their U-label
  must itself be valid; encoded length <= 63 octets
- general PVALID approximation: letters/digits/marks, with RFC 5892 §2.6
  exception lists (PVALID and DISALLOWED code points)
- no leading combining mark
- CONTEXTO: MIDDLE DOT (l·l), GREEK KERAIA (followed by Greek), HEBREW
  GERESH/GERSHAYIM (preceded by Hebrew), KATAKANA MIDDLE DOT (label has
  Hiragana/Katakana/Han), Arabic-Indic vs Extended Arabic-Indic digits
- CONTEXTJ: ZWJ (preceded by Virama), ZWNJ (Virama, or the joining-type
  regexp approximated by cursive-script neighbours)
"""

from __future__ import annotations

import unicodedata

SEPARATORS = ".。．｡"

# RFC 5892 §2.6 exceptions
_PVALID_EXCEPTIONS = {
    "ß",  # LATIN SMALL LETTER SHARP S
    "ς",  # GREEK SMALL LETTER FINAL SIGMA
    "۽", "۾",  # ARABIC SIGN SINDHI AMPERSAND / POSTPOSITION MEN
    "་",  # TIBETAN MARK INTERSYLLABIC TSHEG
    "〇",  # IDEOGRAPHIC NUMBER ZERO
}
_DISALLOWED_EXCEPTIONS = {
    "ـ",  # ARABIC TATWEEL
    "ߺ",  # NKO LAJANYALAN
    "〮", "〯",  # HANGUL TONE MARKS
    "〱", "〲", "〳", "〴", "〵",  # vertical kana repeats
    "〻",  # VERTICAL IDEOGRAPHIC ITERATION MARK
}
_CONTEXT = {"·", "͵", "׳", "״", "・", "‌", "‍"}
_ARABIC_INDIC = set("٠١٢٣٤٥٦٧٨٩")
_EXT_ARABIC_INDIC = set("۰۱۲۳۴۵۶۷۸۹")


def _name(ch: str) -> str:
    try:
        return unicodedata.name(ch)
    except ValueError:
        return ""


def _is_greek(ch: str) -> bool:
    return _name(ch).startswith("GREEK")


def _is_hebrew(ch: str) -> bool:
    return _name(ch).startswith("HEBREW")


def _is_hkh(ch: str) -> bool:  # Hiragana / Katakana / Han
    n = _name(ch)
    return n.startswith(("HIRAGANA", "KATAKANA", "CJK")) and ch != "・"


def _is_virama(ch: str) -> bool:
    return unicodedata.combining(ch) == 9


def _is_cursive_letter(ch: str) -> bool:
    """Approximation of Joining_Type in {L, D, R} for the ZWNJ regexp rule
    (Arabic/Syriac/Mongolian/N'Ko ranges)."""
    cp = ord(ch)
    return (
        0x0600 <= cp <= 0x06FF
        or 0x0700 <= cp <= 0x074F
        or 0x0750 <= cp <= 0x077F
        or 0x07C0 <= cp <= 0x07FF
        or 0x1800 <= cp <= 0x18AF
        or 0x08A0 <= cp <= 0x08FF
    )


def _char_allowed(ch: str) -> bool:
    if ch == "-" or ch in _CONTEXT:
        return True
    if ch in _PVALID_EXCEPTIONS:
        return True
    if ch in _DISALLOWED_EXCEPTIONS:
        return False
    cat = unicodedata.category(ch)
    return cat in ("Ll", "Lu", "Lo", "Lm", "Nd", "Mn", "Mc", "Me")


def _valid_u_label(label: str) -> bool:
    if not label:
        return False
    # NFC requirement
    if unicodedata.normalize("NFC", label) != label:
        return False
    if label.startswith("-") or label.endswith("-"):
        return False
    if len(label) >= 4 and label[2] == "-" and label[3] == "-":
        return False  # '--' in 3rd/4th reserved for A-labels
    if unicodedata.category(label[0]) in ("Mn", "Mc", "Me"):
        return False
    if not all(_char_allowed(ch) for ch in label):
        return False

    # A-label encoded length limit
    try:
        if label.isascii():
            if len(label) > 63:
                return False
        elif len(label.encode("punycode")) + 4 > 63:
            return False
    except UnicodeError:
        return False

    # CONTEXTO / CONTEXTJ
    has_ai = any(ch in _ARABIC_INDIC for ch in label)
    has_eai = any(ch in _EXT_ARABIC_INDIC for ch in label)
    if has_ai and has_eai:
        return False
    for i, ch in enumerate(label):
        prev = label[i - 1] if i > 0 else ""
        nxt = label[i + 1] if i + 1 < len(label) else ""
        if ch == "·":  # MIDDLE DOT: between two 'l'
            if prev != "l" or nxt != "l":
                return False
        elif ch == "͵":  # GREEK KERAIA: followed by Greek
            if not nxt or not _is_greek(nxt):
                return False
        elif ch in ("׳", "״"):  # GERESH / GERSHAYIM: after Hebrew
            if not prev or not _is_hebrew(prev):
                return False
        elif ch == "‍":  # ZWJ: preceded by Virama
            if not prev or not _is_virama(prev):
                return False
        elif ch == "‌":  # ZWNJ: Virama, or cursive-join context
            if prev and _is_virama(prev):
                continue
            if not (prev and nxt and _is_cursive_letter(prev) and _is_cursive_letter(nxt)):
                return False
    if "・" in label and not any(_is_hkh(ch) for ch in label):
        return False
    return True


def _valid_label(label: str) -> bool:
    if not label:
        return False
    lower = label.lower()
    if lower.startswith("xn--"):
        encoded = lower[4:]
        if not encoded:
            return False
        try:
            decoded = encoded.encode("ascii").decode("punycode")
            # round-trip canonicality
            if decoded.encode("punycode").decode("ascii").lower() != encoded:
                return False
        except (UnicodeError, ValueError):
            return False
        if decoded.isascii():
            return False  # A-label must encode non-ASCII
        if len(label) > 63:
            return False
        return _valid_u_label(decoded)
    return _valid_u_label(label)


def check_idn_hostname(value: str) -> bool:
    if not value:
        return False
    for sep in SEPARATORS[1:]:
        value = value.replace(sep, ".")
    labels = value.split(".")
    if labels and labels[-1] == "" and len(labels) > 1:
        labels = labels[:-1]  # single trailing root dot
    if not labels or any(not l for l in labels):
        return False
    return all(_valid_label(l) for l in labels)
