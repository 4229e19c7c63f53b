"""Deterministic synthesis of a structured-HTML corpus WITH
markdown ground truth — the fixture source for the HTML→Markdown
conversion stage (enginelib/markdown.py, operators/markdown.py).

Same determinism contract as ``synth_pages`` (sources/synth.py):
every row is a pure function of its index via keyed BLAKE2 hashes —
distributed generation through ``spark.range(n).mapInPandas``, no
RNG state, partition-count-independent, reproducible at any scale.

The ground-truth ``md`` column is constructed INDEPENDENTLY of the
converter: each block generator emits an (html, markdown) pair from
the same abstract content, so ``to_markdown(html) == md`` is a real
round-trip check on the converter's rules, not a tautology. Pages
also interleave dropped noise (script/style/template subtrees,
comments) that must NOT appear in the markdown.

Reference parity note (SURVEY §0): the reference implements template
extraction only; markdown conversion is a brief-mandated
training-pipeline extension pinned by this generator + fixtures.
"""

from __future__ import annotations

import datetime as dt
from hashlib import blake2b

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu amber birch cedar dune"
).split()

_EPOCH = dt.datetime(2026, 2, 1)


def _h(key: str, mod: int = 1 << 32) -> int:
    return int.from_bytes(blake2b(key.encode(), digest_size=8).digest(),
                          "big") % mod


def _words(key: str, n: int) -> str:
    return " ".join(_WORDS[_h(f"{key}:{j}", len(_WORDS))]
                    for j in range(n))


# ---------------------------------------------------------------------------
# Block generators — each returns (html, markdown) built independently
# from the same hashed content.
# ---------------------------------------------------------------------------

def _seg(key: str) -> tuple[str, str]:
    """One inline segment (plain / bold / em / code / link / img)."""
    kind = _h(f"{key}:k", 6)
    if kind == 0:
        w = _words(f"{key}:w", 2)
        return f"<b>{w}</b>", f"**{w}**"
    if kind == 1:
        w = _words(f"{key}:w", 1)
        return f"<em>{w}</em>", f"*{w}*"
    if kind == 2:
        w = _words(f"{key}:w", 1)
        return f"<code>{w}</code>", f"`{w}`"
    if kind == 3:
        w = _words(f"{key}:w", 2)
        href = f"https://ex.org/{_h(f'{key}:u', 1000)}"
        return f'<a href="{href}">{w}</a>', f"[{w}]({href})"
    if kind == 4:
        w = _words(f"{key}:w", 1)
        src = f"/img/{_h(f'{key}:s', 1000)}.png"
        return f'<img src="{src}" alt="{w}">', f"![{w}]({src})"
    return (w := _words(f"{key}:w", 2 + _h(f"{key}:n", 4))), w


def _inline_run(key: str, n_min: int = 2, n_rng: int = 4) -> tuple[str, str]:
    n = n_min + _h(f"{key}:n", n_rng)
    segs = [_seg(f"{key}:{j}") for j in range(n)]
    return (" ".join(h for h, _ in segs), " ".join(m for _, m in segs))


def _b_heading(key: str) -> tuple[str, str]:
    lvl = 1 + _h(f"{key}:l", 3)
    t = _words(f"{key}:t", 3 + _h(f"{key}:tn", 3))
    return f"<h{lvl}>{t}</h{lvl}>", "#" * lvl + " " + t


def _b_para(key: str) -> tuple[str, str]:
    h, m = _inline_run(key)
    return f"<p>{h}</p>", m


def _b_ul(key: str) -> tuple[str, str]:
    n = 2 + _h(f"{key}:n", 3)
    hs, ms = [], []
    for j in range(n):
        w = _words(f"{key}:{j}", 2 + _h(f"{key}:{j}:n", 3))
        if j == n - 1 and _h(f"{key}:nest", 3) == 0:
            # nested sublist inside the last item (tight join, padded)
            subs = [_words(f"{key}:{j}:s{s}", 2) for s in range(2)]
            hs.append(f"<li>{w}<ul>"
                      + "".join(f"<li>{s}</li>" for s in subs)
                      + "</ul></li>")
            ms.append(f"- {w}\n"
                      + "\n".join(f"  - {s}" for s in subs))
        else:
            hs.append(f"<li>{w}</li>")
            ms.append(f"- {w}")
    return "<ul>" + "".join(hs) + "</ul>", "\n".join(ms)


def _b_ol(key: str) -> tuple[str, str]:
    n = 2 + _h(f"{key}:n", 3)
    items = [_words(f"{key}:{j}", 2 + _h(f"{key}:{j}:n", 3))
             for j in range(n)]
    html = "<ol>" + "".join(f"<li>{w}</li>" for w in items) + "</ol>"
    md = "\n".join(f"{j + 1}. {w}" for j, w in enumerate(items))
    return html, md


def _b_table(key: str) -> tuple[str, str]:
    nc = 2 + _h(f"{key}:c", 2)
    nr = 1 + _h(f"{key}:r", 3)
    hdr = [_words(f"{key}:h{c}", 1) for c in range(nc)]
    body = [[_words(f"{key}:b{r}:{c}", 1 + _h(f"{key}:b{r}:{c}:n", 2))
             for c in range(nc)] for r in range(nr)]
    html = ("<table><thead><tr>"
            + "".join(f"<th>{h}</th>" for h in hdr)
            + "</tr></thead><tbody>"
            + "".join("<tr>" + "".join(f"<td>{c}</td>" for c in row)
                      + "</tr>" for row in body)
            + "</tbody></table>")
    lines = ["| " + " | ".join(hdr) + " |",
             "| " + " | ".join("---" for _ in hdr) + " |"]
    lines += ["| " + " | ".join(row) + " |" for row in body]
    return html, "\n".join(lines)


def _b_pre(key: str) -> tuple[str, str]:
    n = 2 + _h(f"{key}:n", 3)
    lines = []
    for j in range(n):
        pad = "    " * _h(f"{key}:{j}:i", 2)
        w = _words(f"{key}:{j}", 2 + _h(f"{key}:{j}:n", 3))
        if _h(f"{key}:{j}:e", 4) == 0:
            # entity in code: html carries &lt;, markdown the decoded <
            lines.append((pad + "x &lt; " + w, pad + "x < " + w))
        else:
            lines.append((pad + w, pad + w))
    code_h = "\n".join(h for h, _ in lines)
    code_m = "\n".join(m for _, m in lines)
    return f"<pre>\n{code_h}\n</pre>", f"```\n{code_m}\n```"


def _b_quote(key: str) -> tuple[str, str]:
    p1 = _words(f"{key}:p1", 4 + _h(f"{key}:n1", 4))
    if _h(f"{key}:two", 3) == 0:
        p2 = _words(f"{key}:p2", 4 + _h(f"{key}:n2", 4))
        return (f"<blockquote><p>{p1}</p><p>{p2}</p></blockquote>",
                f"> {p1}\n>\n> {p2}")
    return f"<blockquote><p>{p1}</p></blockquote>", f"> {p1}"


def _b_hr(key: str) -> tuple[str, str]:
    return "<hr>", "---"


def _b_nav(key: str) -> tuple[str, str]:
    """Block container with bare inline links — renders as an
    implicit paragraph (nav is a transparent block container)."""
    n = 2 + _h(f"{key}:n", 2)
    segs = []
    for j in range(n):
        w = _words(f"{key}:{j}", 1)
        segs.append((f'<a href="/{w}">{w}</a>', f"[{w}](/{w})"))
    return ("<nav>" + " ".join(h for h, _ in segs) + "</nav>",
            " ".join(m for _, m in segs))


_BLOCKS = [_b_heading, _b_para, _b_para, _b_ul, _b_ol, _b_table,
           _b_pre, _b_quote, _b_hr, _b_nav]

#: dropped-noise snippets interleaved between blocks (never in md)
_NOISE = [
    "<script>var x = {a: 1};</script>",
    "<style>p { margin: 0 }</style>",
    "<template><p>template junk</p></template>",
    "<!-- comment junk -->",
    '<svg viewBox="0 0 1 1"><text>svg junk</text></svg>',
]


def render_md_page(key: str, n_min: int = 4,
                   n_rng: int = 6) -> tuple[str, str]:
    """One (html, markdown) document pair for a hash key."""
    n = n_min + _h(f"{key}:nb", n_rng)
    # lead with a heading so every page has a stable anchor block
    parts = [_b_heading(f"{key}:b0")]
    for j in range(1, n):
        gen = _BLOCKS[_h(f"{key}:b{j}:t", len(_BLOCKS))]
        parts.append(gen(f"{key}:b{j}"))
    body = []
    for j, (h, _) in enumerate(parts):
        body.append(h)
        if _h(f"{key}:z{j}", 3) == 0:
            body.append(_NOISE[_h(f"{key}:zz{j}", len(_NOISE))])
    html = ("<html><head><title>junk title</title>"
            "<style>body{}</style></head><body>\n"
            + "\n".join(body) + "\n</body></html>")
    md = "\n\n".join(m for _, m in parts)
    # block count staged AT THE SOURCE (len(parts)), not re-derived
    # from the joined text — a fenced code block containing a blank
    # line would make any '\n\n'-count reconstruction wrong (r05
    # review removed exactly that assumption from the converter; the
    # oracle reads this column back instead of repeating it)
    return html, md, len(parts)


# ---------------------------------------------------------------------------
# Spark-side generation
# ---------------------------------------------------------------------------

MD_PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                   "md string, n_blocks int, lang string")

_LANGS = ["en", "es", "de", "zh", "fr"]


def synth_md_pages(spark: SparkSession, n_pages: int, seed: int = 11,
                   partitions: int | None = None) -> DataFrame:
    """Distributed deterministic (url, warc_ts, html, md, lang) table;
    ``md`` is the generator-side markdown ground truth for ``html``."""
    partitions = partitions or max(
        8, spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                key = f"{seed}:{i}"
                html, md, n_blocks = render_md_page(key)
                host = f"md{_h(f'{key}:h', 20):02d}.example.org"
                rows.append((
                    f"https://{host}/a/{i}",
                    _EPOCH + dt.timedelta(seconds=i * 13),
                    html.encode("utf-8"),
                    md,
                    n_blocks,
                    _LANGS[_h(f"{key}:lang", len(_LANGS))],
                ))
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "md",
                               "n_blocks", "lang"])

    return (spark.range(0, n_pages, numPartitions=partitions)
            .mapInPandas(gen, MD_PAGES_SCHEMA))
