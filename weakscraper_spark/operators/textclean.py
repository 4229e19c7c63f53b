"""Unicode hygiene + script profiling — the char-level corpus
cleaning that sits between charset decode and tokenization:

- ``clean_unicode``: strip the characters that poison training text
  while surviving every upstream filter — C0/C1 controls (except
  tab/newline), zero-width characters (ZWSP/ZWNJ/ZWJ/LRM/RLM,
  word-joiner, BOM), bidi embedding/override/isolate controls (the
  Trojan-Source family), soft hyphens; NBSP-family spaces normalize
  to plain space. Removal COUNTS ride the rows for auditability.
- ``script_profile``: per-doc counts of major Unicode script ranges
  (Latin, Cyrillic, Greek, Arabic, Hebrew, CJK ideographs, Kana,
  Hangul, Devanagari) + the dominant script — the cheap router ahead
  of the n-gram language guesser (textstats.lang_id), and the
  mixed-script spam signal (Cyrillic-in-Latin homoglyph abuse).

Both are pure JVM regexp/length expressions (BMP ranges only —
documented; astral-plane scripts count under 'other'), mirrored in
DuckDB twins. Narrow maps, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: stripped outright: C0 controls minus \t\n, DEL+C1 controls,
#: zero-widths (ZWSP/ZWNJ/ZWJ + LRM/RLM), word-joiner, BOM, bidi
#: embeddings/overrides (the Trojan-Source family) + isolates, soft
#: hyphen. Explicit escapes only — raw control characters in source
#: are invisible and editor-hostile.
_STRIP_CLASS = ("[\u0000-\u0008\u000b-\u001f\u007f-\u009f"
                "\u200b-\u200f\u2060\ufeff\u202a-\u202e"
                "\u2066-\u2069\u00ad]")

#: normalized to a plain space: NBSP, ogham space mark, en/em/thin/
#: etc. spaces, line/para separators, narrow NBSP, math space,
#: ideographic space
_SPACE_CLASS = ("[\u00a0\u1680\u2000-\u200a\u2028\u2029"
                "\u202f\u205f\u3000]")

SCRIPT_RANGES: dict[str, str] = {
    "latin": "A-Za-z\u00c0-\u024f",
    "cyrillic": "\u0400-\u04ff",
    "greek": "\u0370-\u03ff",
    "arabic": "\u0600-\u06ff",
    "hebrew": "\u0590-\u05ff",
    "cjk": "\u4e00-\u9fff",
    "kana": "\u3040-\u30ff",
    "hangul": "\uac00-\ud7af",
    "devanagari": "\u0900-\u097f",
}

#: deterministic tie-break order for the dominant script (ties are
#: real: a 50/50 homoglyph string) — fixed priority, mirrored in SQL
SCRIPT_ORDER = tuple(SCRIPT_RANGES)


def _count(col: Column, char_class: str) -> Column:
    return (F.length(col) -
            F.length(F.regexp_replace(col, f"[{char_class}]", "")))


def clean_unicode(df: DataFrame, id_col: str = "doc_id",
                  col: str = "text") -> DataFrame:
    """(id, text_clean, n_stripped, n_spaces_fixed) — the scrub plus
    its audit counts. NULL text stays NULL with zero counts (visible,
    not dropped)."""
    t = F.col(col)
    stripped = F.regexp_replace(t, _STRIP_CLASS, "")
    cleaned = F.regexp_replace(stripped, _SPACE_CLASS, " ")
    return df.select(
        F.col(id_col),
        cleaned.alias("text_clean"),
        F.coalesce(F.length(t) - F.length(stripped), F.lit(0))
         .cast("long").alias("n_stripped"),
        F.coalesce(
            F.length(stripped) -
            F.length(F.regexp_replace(stripped, _SPACE_CLASS, "")),
            F.lit(0)).cast("long").alias("n_spaces_fixed"))


def script_profile(df: DataFrame, id_col: str = "doc_id",
                   col: str = "text") -> DataFrame:
    """(id, n_chars, <one count per script>, n_other, dominant) —
    ``dominant`` is the highest-count script (ties → SCRIPT_ORDER
    priority, 'none' for empty/NULL text or when every char is
    'other'). Whitespace and digits count as 'other' by design:
    the router cares about letters."""
    t = F.col(col)
    counts = {name: _count(t, rng)
              for name, rng in SCRIPT_RANGES.items()}
    n_chars = F.coalesce(F.length(t), F.lit(0))
    known = None
    for c in counts.values():
        known = c if known is None else known + c
    # argmax with fixed priority: array of (count, neg-priority)
    # structs, reversed sort → max count, earliest SCRIPT_ORDER wins
    scored = F.array(*[
        F.struct(F.coalesce(counts[n], F.lit(0)).alias("c"),
                 F.lit(-i).alias("p"), F.lit(n).alias("s"))
        for i, n in enumerate(SCRIPT_ORDER)])
    best = F.reverse(F.array_sort(scored))[0]
    dominant = F.when((best["c"] > 0), best["s"]).otherwise("none")
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        *[F.coalesce(counts[n], F.lit(0)).cast("long").alias(n)
          for n in SCRIPT_ORDER],
        (n_chars - F.coalesce(known, F.lit(0))).cast("long")
        .alias("n_other"),
        dominant.alias("dominant"))
