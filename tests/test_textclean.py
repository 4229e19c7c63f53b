"""Unicode hygiene + script profiling (operators/textclean.py).
Planted characters are built from codepoints so the test source
stays visible ASCII."""

from weakscraper_spark.operators.textclean import (
    clean_unicode, script_profile)

ZWSP, RLO, LRI = "\u200b", "\u202e", "\u2066"
NBSP, IDEO = "\u00a0", "\u3000"
BOM, SHY, BELL = "\ufeff", "\u00ad", "\u0007"


def test_clean_unicode_strips_and_counts(spark):
    rows = [
        (1, f"a{ZWSP}b{RLO}c{LRI}d"),
        (2, f"x{NBSP}y{IDEO}z"),
        (3, "tab\tand\nnewline stay"),
        (4, None),
        (5, f"bom{BOM} soft{SHY} bell{BELL}"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean_unicode(df).collect()}
    assert got[1].text_clean == "abcd"
    assert got[1].n_stripped == 3
    assert got[2].text_clean == "x y z"
    assert got[2].n_spaces_fixed == 2 and got[2].n_stripped == 0
    assert got[3].text_clean == "tab\tand\nnewline stay"
    assert got[3].n_stripped == 0
    assert got[4].text_clean is None
    assert (got[4].n_stripped, got[4].n_spaces_fixed) == (0, 0)
    assert got[5].text_clean == "bom soft bell"
    assert got[5].n_stripped == 3


def test_script_profile_counts_and_dominant(spark):
    cyr = "привет"        # privet
    cjk2_kana3 = "漢字とかな"       # 2 cjk, 3 kana
    tie = "abcабв"                       # 3 vs 3
    hebrew = "שלום עולם"
    rows = [
        (1, "hello"), (2, cyr), (3, cjk2_kana3), (4, tie),
        (5, ""), (6, None), (7, "1234 !?"), (8, hebrew),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in script_profile(df).collect()}
    assert got[1].dominant == "latin" and got[1].latin == 5
    assert got[2].dominant == "cyrillic" and got[2].cyrillic == 6
    assert got[3].dominant == "kana"
    assert (got[3].cjk, got[3].kana) == (2, 3)
    assert got[4].dominant == "latin"  # fixed priority on ties
    assert got[5].dominant == "none" and got[5].n_chars == 0
    assert got[6].dominant == "none"
    assert got[7].dominant == "none" and got[7].n_other == 7
    assert got[8].dominant == "hebrew"
    # counts partition: known + other == n_chars everywhere
    for r in got.values():
        known = (r.latin + r.cyrillic + r.greek + r.arabic +
                 r.hebrew + r.cjk + r.kana + r.hangul + r.devanagari)
        assert known + r.n_other == r.n_chars


def test_textclean_plans_are_narrow(spark):
    import contextlib
    import io
    import re
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for plan_df in (clean_unicode(df), script_profile(df)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan_df.explain("formatted")
        names = [m.group(1) for m in
                 re.finditer(r"^\s*[*+-]*\s*\(\d+\)\s+(\w+)",
                             buf.getvalue(), re.M)]
        assert "Exchange" not in names
        assert "BatchEvalPython" not in names
        assert "ArrowEvalPython" not in names


def test_script_profile_astral_probe_ring(spark):
    """r07 adversarial probes, pinned (documented limitation made
    contractual): SCRIPT_RANGES are 9 BMP ranges, so astral-plane
    text (emoji, math alphanumerics, CJK extension B) counts as
    'other' and an all-astral doc gets dominant='none' — never a
    crash, and n_chars/n_other stay codepoint-consistent (Spark
    length() counts code points, matching DuckDB). clean_unicode
    passes astral chars through untouched (they are not in the strip
    classes). Lone surrogates are unrepresentable in Spark's UTF-8
    strings, so no case exists for them by construction."""
    from weakscraper_spark.operators.textclean import (clean_unicode,
                                                       script_profile)
    rows = [
        (1, "\U0001D518\U0001D52B\U0001D526 math bold"),
        (2, "\U0001F600\U0001F680 emoji only"),
        (3, "\U00020000\U0002A6D6"),        # CJK ext B: astral han
        (4, "\U0001D7D8\U0001D7D9"),        # astral digits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    prof = {r.doc_id: r for r in script_profile(df).collect()}
    assert (prof[1].n_chars, prof[1].n_other,
            prof[1].dominant) == (13, 5, "latin")
    assert (prof[2].n_chars, prof[2].n_other,
            prof[2].dominant) == (13, 4, "latin")
    assert (prof[3].n_chars, prof[3].n_other,
            prof[3].dominant) == (2, 2, "none")
    assert (prof[4].n_chars, prof[4].n_other,
            prof[4].dominant) == (2, 2, "none")
    clean = {r.doc_id: r for r in clean_unicode(df).collect()}
    for i, text in rows:
        assert clean[i].text_clean == text, i
        assert clean[i].n_stripped == 0
