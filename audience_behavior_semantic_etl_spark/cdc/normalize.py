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
    no Catalyst expression).

    JVM fast path: text that is tab/LF/printable-ASCII only with no
    trailing whitespace is canonical BY DEFINITION (ASCII is always NFC;
    the dirty classes are CR/control chars/trailing blanks) — that is
    the overwhelming majority of real transcript rows. Spark pulls
    Python UDFs out of CASE branches and evaluates them for EVERY row,
    so conditional invocation alone would not skip the Arrow round-trip;
    instead the UDF input is MASKED to null for clean rows (nulls are
    ~free to ship and `map` skips them) and ``coalesce`` restores the
    original text. Python now touches only the rows that can actually
    change."""
    from pyspark.sql import functions as F

    dirty = c.rlike(r"[^\x09\x0A\x20-\x7E]") | c.rlike(r"[ \t]+(\n|$)")

    @F.pandas_udf("string")
    def _canon(s: pd.Series) -> pd.Series:
        return s.map(canonical_text, na_action="ignore")

    return F.coalesce(_canon(F.when(dirty, c)), c)
