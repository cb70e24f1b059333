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

import pandas as pd

_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
# trailing whitespace before a newline or end — MULTILINE $ instead of a
# captured backreference: the \1 template forced expand_template per
# match and was the single hottest call in the apply profile
_TRAIL = re.compile(r"[ \t]+$", re.MULTILINE)
# any character that forces the slow path
_DIRTY = re.compile(r"[\r\x00-\x08\x0b\x0c\x0e-\x1f\x7f]|[ \t]+(?=\n|$)")


def canonical_text(s: str | None) -> str | None:
    if s is None:
        return None
    # fast path: already-canonical text (most real-world rows) costs one
    # scan + the NFC quick check
    if unicodedata.is_normalized("NFC", s) and _DIRTY.search(s) is None:
        return s
    s = unicodedata.normalize("NFC", s)
    s = s.replace("\r\n", "\n").replace("\r", "\n")
    s = _CTRL.sub("", s)
    s = _TRAIL.sub("", s)
    return s


def canonical_text_col(c):
    """``canonical_text`` as an Arrow-batched single-column pandas UDF —
    the ONLY Python on the apply hot path (unicode NFC normalization has
    no Catalyst expression). Everything else in the normalizer is
    JVM-side; this ships one string column per batch over Arrow."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _canon(s: pd.Series) -> pd.Series:
        return s.map(canonical_text, na_action="ignore")

    return _canon(c)
