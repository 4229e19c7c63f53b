"""Text normalization (SURVEY.md §3C C7).

One function defines the byte-identical-text contract for every
captured value and for text-node comparison: collapse each maximal
whitespace run to a single space and strip the ends. This mirrors the
reference's whitespace normalization in its text compare (SURVEY A5;
reference: weakscraper/htmlparser.py ≈60).

Applied consistently in FOUR places so golden fixtures stay stable:
1. literal template text at compile time (spec.py),
2. page text at compare time (match.py A5),
3. captured values before storing (match.py A7/A10),
4. ground-truth text rendered by the synthesizer (sources/synth.py).
"""

from __future__ import annotations


def normalize_text(s: str) -> str:
    """Collapse whitespace runs to single spaces and strip ends.

    >>> normalize_text('  a\\n\\t b  ')
    'a b'
    """
    return " ".join(s.split())
