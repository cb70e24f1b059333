"""Text canonicalization shared by the Spark normalizer and the pandas
oracle — the transcript-domain analog of the reference's enrich/clean
UDF chain (SURVEY.md §2.9 U1-U4): NFC unicode normalization, CRLF -> LF,
control-character strip (tabs/newlines kept), trailing-whitespace trim
per line.

Keeping this a tiny pure function means "per-turn text equality vs
oracle" is a strict check: engine and oracle share the definition, and
both are exercised against raw payloads containing decomposed unicode
and CRLF seeded by the generator.
"""

from __future__ import annotations

import re
import unicodedata

_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_TRAIL = re.compile(r"[ \t]+(\n|$)")


def canonical_text(s: str | None) -> str | None:
    if s is None:
        return None
    s = unicodedata.normalize("NFC", s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _CTRL.sub("", s)
    s = _TRAIL.sub(r"\1", s)
    return s
