"""WARC ingestion — the wire format Common Crawl actually ships
(ISO 28500 / WARC 1.0; cites the public weakscraper's assumed input
per SURVEY §2.1: Document = one crawled page). This closes the gap
between "a parquet pages table exists" and "raw crawl archives on
object storage": ``warc_records``/``warc_pages`` turn whole ``.warc``
/ ``.warc.gz`` files into the repo's standard pages rows
(url, warc_ts, html binary, ...), ready for ``prepare_pages``.

Parser shape (pure stdlib, total — same taxonomy discipline as the
HTML/PDF parsers: malformed records become status rows, never
exceptions):

- gzip handling: CC archives are MULTI-MEMBER gzip (one member per
  record, so byte-range fetches work). ``_iter_member_chunks`` walks
  members LAZILY with zlib ``unused_data`` — stdlib
  ``gzip.decompress`` would inflate the whole archive up front
  (~1 GB compressed → ~4 GB in one task); streaming member-at-a-time
  caps peak memory at one record and lets a corrupt TAIL degrade to
  the records already decoded instead of losing the file.
- record framing: ``WARC/<ver>\\r\\n`` header block to the first
  blank line, then exactly ``Content-Length`` payload bytes, then
  ``\\r\\n\\r\\n``. Length-first slicing (no delimiter scanning over
  payloads — same lesson as the PDF stream cutter), framed
  INCREMENTALLY from a rolling buffer so records may span members.
- HTTP unwrap: ``response`` records carry an HTTP/1.x message;
  ``_split_http`` peels status + headers and returns the body bytes
  untouched (bytes, not str — charset decoding is a separate,
  explicit stage: operators/charset.py).

Spark shape: one task per archive (an archive is one independent
byte stream — the natural parallel unit; CC ships ~64k files per
crawl, far more than executor slots, so file-level parallelism
saturates any cluster). ``mapInPandas`` flat-maps (path, content)
rows to per-record rows; no shuffle.

``build_warc`` is the test-fixture construction path (header
serialization, per-record gzip members) and shares no code with the
parser.
"""

from __future__ import annotations

import zlib
from email.utils import parsedate_to_datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_PAGES_SCHEMA = (
    "src string, record_no int, status string, record_type string, "
    "url string, warc_ts timestamp, http_status int, mime string, "
    "html binary, n_bytes int"
)

# binaryFile holds the WHOLE compressed archive in task memory as one
# row and hard-fails above Int.MaxValue bytes; the parse inflates one
# record at a time on top of it, so budget ~archive + one inflated
# record (+ Arrow copy) of task memory per file. Archives above this
# cap become an error:Oversize status row (warc_records) and are
# pruned from the scan itself via the pushed-down `length` metadata
# filter (raw_pipeline) — the repo's taxonomy discipline: degrade
# with a visible row, never die mid-scan (VERDICT r04 #2). Oversized
# archives need a pre-chunking pass or a byte-range member-offset
# reader upstream of this module.
DEFAULT_MAX_ARCHIVE_BYTES = 2_000_000_000


def _iter_member_chunks(raw: bytes, chunk_size: int = 1 << 20):
    """Yield inflated bytes across gzip members IN TURN (generator —
    peak memory is one ~chunk_size slice, not the whole archive: CC
    archives are ~1 GB compressed / ~4 GB inflated). The compressed
    input is fed as fixed-size MEMORYVIEW slices and the consumed
    offset tracked manually — the naive ``data = d.unused_data`` loop
    copies the entire remaining archive once PER MEMBER, i.e.
    O(members × size) memcpy ≈ tens of TB on a real 50k-member CC
    file (r04 review). A corrupt/truncated tail yields what decoded
    so far and stops."""
    mv = memoryview(raw)
    n = len(raw)
    pos = 0
    while pos < n and raw[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        while True:
            piece = mv[pos:pos + chunk_size]
            if len(piece) == 0:
                return  # input exhausted mid-member: truncated
            try:
                out = d.decompress(piece)
            except zlib.error:
                return
            if out:
                yield out
            if d.eof:
                # only the tail of THIS piece is unconsumed (≤ one
                # chunk) — pos advances past the member boundary
                pos += len(piece) - len(d.unused_data)
                break
            pos += len(piece)


def _iter_member_spans(raw: bytes, chunk_size: int = 1 << 20):
    """Like ``_iter_member_chunks`` but per MEMBER: yields
    (member_start, member_compressed_len, inflated_bytes). This is
    the CDX write path's unit — Common Crawl writes one record per
    gzip member precisely so an index entry's (offset, length) names
    one member and a reader can byte-range-fetch + inflate it alone.
    Peak memory is one member's inflated record (bounded for the CC
    layout), not the archive. A corrupt/truncated tail stops after
    the members already decoded, same contract as the chunk walker."""
    mv = memoryview(raw)
    n = len(raw)
    pos = 0
    while pos < n and raw[pos:pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(31)
        start = pos
        parts: list[bytes] = []
        while True:
            piece = mv[pos:pos + chunk_size]
            if len(piece) == 0:
                return  # input exhausted mid-member: truncated
            try:
                out = d.decompress(piece)
            except zlib.error:
                return
            if out:
                parts.append(out)
            if d.eof:
                pos += len(piece) - len(d.unused_data)
                break
            pos += len(piece)
        yield start, pos - start, b"".join(parts)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Lenient header block → lowercase-keyed dict (folded lines and
    malformed entries skipped, not fatal)."""
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        headers[k.strip().decode("latin-1").lower()] = \
            v.strip().decode("latin-1")
    return headers


def _split_http(payload: bytes) -> tuple[int | None, dict[str, str],
                                         bytes]:
    """HTTP/1.x message → (status, headers, body). Non-HTTP payloads
    come back as (None, {}, payload) — caller decides."""
    if not payload.startswith(b"HTTP/"):
        return None, {}, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        return None, {}, payload
    first, _, rest = head.partition(b"\r\n")
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, payload
    return status, _parse_headers(rest), body


_NEED_MORE = object()


def _next_frame(buf: bytes, pos: int, final: bool):
    """One framing step over ``buf[pos:]``. Returns (record|None,
    new_pos) — record None with unchanged meaning "clean end of
    input"; the sentinel ``_NEED_MORE`` as the record means the
    buffer ends mid-frame and the caller should append more inflated
    bytes first (only when not ``final``). Error records carry a
    status and end the stream (frame sync is gone past a malformed
    region — honest truncation, never a raise)."""
    n = len(buf)
    while buf[pos:pos + 2] == b"\r\n":  # inter-record padding
        pos += 2
    if pos >= n:
        return None, pos
    if not buf.startswith(b"WARC/", pos):
        if not final and n - pos < 5:
            return _NEED_MORE, pos
        return {"status": "error:FrameSync", "record_type": None,
                "url": None, "date": None, "http_status": None,
                "mime": None, "body": b""}, n
    head_end = buf.find(b"\r\n\r\n", pos)
    if head_end < 0:
        if not final:
            return _NEED_MORE, pos
        return {"status": "error:TruncatedHeader", "record_type": None,
                "url": None, "date": None, "http_status": None,
                "mime": None, "body": b""}, n
    headers = _parse_headers(buf[pos:head_end])
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return {"status": "error:NoLength", "record_type":
                headers.get("warc-type"), "url":
                headers.get("warc-target-uri"), "date": None,
                "http_status": None, "mime": None, "body": b""}, n
    body_start = head_end + 4
    if body_start + length > n and not final:
        return _NEED_MORE, pos
    payload = buf[body_start:body_start + length]
    truncated = len(payload) < length
    rtype = headers.get("warc-type")
    mime = headers.get("content-type")
    http_status, http_headers, body = (None, {}, payload)
    if rtype == "response":
        http_status, http_headers, body = _split_http(payload)
        mime = http_headers.get("content-type", mime)
    rec = {"status": ("error:TruncatedBody" if truncated else "ok"),
           "record_type": rtype, "url": headers.get("warc-target-uri"),
           "date": headers.get("warc-date"),
           "http_status": http_status, "mime": mime,
           # the redirect target of a 3xx response — the index
           # carries it so chains resolve WITHOUT touching payloads
           "location": http_headers.get("location"), "body": body}
    return rec, (n if truncated else body_start + length)


def iter_warc_records(raw: bytes) -> Iterator[dict]:
    """Total parse of one archive's bytes (gzip'd or plain) into
    record dicts: {record_type, url, date, http_status, mime, body,
    status}. STREAMING over gzip members — records are framed
    incrementally from a rolling buffer, so peak memory is the input
    bytes plus roughly one inflated member (records may span members;
    the buffer is compacted after every yielded record), never the
    whole inflated archive. Malformed regions emit one error record
    and stop — honest truncation, never a raise."""
    if raw[:2] == b"\x1f\x8b":
        chunks = _iter_member_chunks(raw)
    else:
        chunks = iter((raw,))
    buf = b""
    pos = 0
    for chunk in chunks:
        buf = buf[pos:] + chunk
        pos = 0
        while True:
            rec, pos = _next_frame(buf, pos, final=False)
            if rec is _NEED_MORE or rec is None:
                break
            yield rec
            if rec["status"].startswith("error:"):
                return
    # end of input: flush whatever is left as final
    while True:
        rec, pos = _next_frame(buf, pos, final=True)
        if rec is None:
            return
        yield rec
        if rec["status"].startswith("error:"):
            return


def _warc_date(date: str | None):
    """WARC-Date (ISO 8601 Zulu) or HTTP date → naive UTC datetime,
    None when unparseable (the column is typed, errors stay visible
    in `status`)."""
    if not date:
        return None
    try:
        from datetime import datetime
        return datetime.fromisoformat(date.replace("Z", "+00:00")) \
            .replace(tzinfo=None)
    except ValueError:
        try:
            return parsedate_to_datetime(date).replace(tzinfo=None)
        except Exception:
            return None


def warc_records(files: DataFrame, path_col: str = "path",
                 content_col: str = "content",
                 max_archive_bytes: int = DEFAULT_MAX_ARCHIVE_BYTES
                 ) -> DataFrame:
    """(path, content-bytes) rows → one row PER WARC RECORD (all
    types — response/request/warcinfo/metadata; callers filter).
    Narrow flat map; html = the unwrapped HTTP body for responses,
    the raw block otherwise. An archive above ``max_archive_bytes``
    (see ``DEFAULT_MAX_ARCHIVE_BYTES`` for the memory envelope) yields
    ONE error:Oversize status row instead of being parsed."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("src", "record_no", "status",
                                   "record_type", "url", "warc_ts",
                                   "http_status", "mime", "html",
                                   "n_bytes")}

            def status_row(path, status, n_bytes):
                out["src"].append(path)
                out["record_no"].append(-1)
                out["status"].append(status)
                for k in ("record_type", "url", "warc_ts",
                          "http_status", "mime", "html"):
                    out[k].append(None)
                out["n_bytes"].append(n_bytes)

            for path, raw in zip(pdf[path_col], pdf[content_col]):
                raw = bytes(raw) if raw is not None else b""
                if len(raw) > max_archive_bytes:
                    status_row(path, "error:Oversize", len(raw))
                    continue
                n = 0
                for rec in iter_warc_records(raw):
                    out["src"].append(path)
                    out["record_no"].append(n)
                    out["status"].append(rec["status"])
                    out["record_type"].append(rec["record_type"])
                    out["url"].append(rec["url"])
                    out["warc_ts"].append(_warc_date(rec["date"]))
                    out["http_status"].append(rec["http_status"])
                    out["mime"].append(rec["mime"])
                    out["html"].append(rec["body"])
                    out["n_bytes"].append(len(rec["body"]))
                    n += 1
                if n == 0:  # empty/garbage file: visible, not vanished
                    status_row(path, "error:Empty", 0)
            yield pd.DataFrame(out)

    return (files.select(path_col, content_col)
            .mapInPandas(run, WARC_PAGES_SCHEMA))


def warc_pages(files: DataFrame, path_col: str = "path",
               content_col: str = "content") -> DataFrame:
    """The pages-table view of an archive set: HTML 200-response
    records only, columns aligned with the standard pages schema
    (url, warc_ts, html) so `prepare_pages` composes directly."""
    from pyspark.sql import functions as F
    recs = warc_records(files, path_col, content_col)
    return (recs.filter((F.col("status") == "ok") &
                        (F.col("record_type") == "response") &
                        (F.col("http_status") == 200) &
                        F.col("mime").startswith("text/html"))
            .select("url", "warc_ts", "html", "src", "n_bytes"))


def payload_digest(body: bytes) -> str:
    """CDX digest convention (WARC-Payload-Digest shape): sha-1 of
    the unwrapped payload body, Base32-encoded — ``sha1:<BASE32>``."""
    import base64
    import hashlib
    return "sha1:" + base64.b32encode(
        hashlib.sha1(body).digest()).decode("ascii")


def iter_warc_index(raw: bytes) -> Iterator[dict]:
    """Index view of one archive's bytes: record dicts PLUS the
    (offset, length) byte span a reader needs to fetch the record
    without scanning the file.

    - gzip archives: spans are COMPRESSED MEMBER spans (the CC
      convention — one record per member, so offset/length support
      range requests). If a member holds several records they share
      its span (degraded but honest; the member is still the fetch
      unit).
    - plain archives: spans are raw byte spans of the record frame.

    Same taxonomy as ``iter_warc_records``: malformed regions become
    one error record (offset = where sync was lost) and stop."""
    if raw[:2] == b"\x1f\x8b":
        for start, comp_len, inflated in _iter_member_spans(raw):
            pos = 0
            while True:
                rec, pos = _next_frame(inflated, pos, final=True)
                if rec is None:
                    break
                rec["offset"], rec["length"] = start, comp_len
                yield rec
                if rec["status"].startswith("error:"):
                    return
        return
    pos = 0
    while True:
        while raw[pos:pos + 2] == b"\r\n":  # skip padding OUTSIDE the
            pos += 2                        # frame so spans are tight
        rec, new_pos = _next_frame(raw, pos, final=True)
        if rec is None:
            return
        rec["offset"], rec["length"] = pos, new_pos - pos
        yield rec
        if rec["status"].startswith("error:"):
            return
        pos = new_pos


WARC_INDEX_SCHEMA = (
    "src string, record_no int, status string, record_type string, "
    "url string, warc_ts timestamp, http_status int, mime string, "
    "location string, digest string, offset long, length long, "
    "n_bytes int"
)


def warc_record_index(files: DataFrame, path_col: str = "path",
                      content_col: str = "content",
                      max_archive_bytes: int =
                      DEFAULT_MAX_ARCHIVE_BYTES) -> DataFrame:
    """The CDX WRITE side: (path, content-bytes) archives → ~200-byte
    index rows (no payload column — the html bytes never leave the
    task), one per record, carrying the payload sha-1 digest and the
    member/frame byte span. Feed the ok/response subset to
    ``operators.cdx.format_cdxj`` to render the CDXJ lines a crawl
    tier ships next to its WARCs; round-trips through ``parse_cdxj``
    / ``cdx_digest_dedup``. Narrow flat map, one task per archive —
    the same scale shape as ``warc_records``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("src", "record_no", "status", "record_type", "url",
                "warc_ts", "http_status", "mime", "location",
                "digest", "offset", "length", "n_bytes")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}

            def status_row(path, status, n_bytes):
                out["src"].append(path)
                out["record_no"].append(-1)
                out["status"].append(status)
                for k in ("record_type", "url", "warc_ts",
                          "http_status", "mime", "location",
                          "digest", "offset", "length"):
                    out[k].append(None)
                out["n_bytes"].append(n_bytes)

            for path, raw in zip(pdf[path_col], pdf[content_col]):
                raw = bytes(raw) if raw is not None else b""
                if len(raw) > max_archive_bytes:
                    status_row(path, "error:Oversize", len(raw))
                    continue
                n = 0
                for rec in iter_warc_index(raw):
                    body = rec["body"]
                    out["src"].append(path)
                    out["record_no"].append(n)
                    out["status"].append(rec["status"])
                    out["record_type"].append(rec["record_type"])
                    out["url"].append(rec["url"])
                    out["warc_ts"].append(_warc_date(rec["date"]))
                    out["http_status"].append(rec["http_status"])
                    out["mime"].append(rec["mime"])
                    out["location"].append(rec.get("location"))
                    # digest EVERY well-framed record, empty bodies
                    # included (the CC/CDX convention is the sha-1 of
                    # the empty payload; 3xx/204 records typically
                    # have one) — `if body` made the index diverge
                    # from the builder's accounting and, worse, made
                    # cdx_digest_dedup's countDistinct see 0 digests
                    # for an all-redirect urlkey (r07 review). Error
                    # frames keep NULL: a truncated body's digest
                    # would be a lie.
                    out["digest"].append(
                        payload_digest(body)
                        if rec["status"] == "ok" else None)
                    out["offset"].append(rec["offset"])
                    out["length"].append(rec["length"])
                    out["n_bytes"].append(len(body))
                    n += 1
                if n == 0:
                    status_row(path, "error:Empty", 0)
            yield pd.DataFrame(out)

    return (files.select(path_col, content_col)
            .mapInPandas(run, WARC_INDEX_SCHEMA))


def assign_archives(df: DataFrame, n_archives: int,
                    url_col: str = "url", seed: int = 42) -> DataFrame:
    """Deterministic archive sharding for ``pages_to_warc``: append
    ``archive_id`` = md5-uniform bucket of the url (the repo's
    ``hash_sample`` draw — no RNG state, resume-stable, identical
    across partitionings and engines). Size ``n_archives`` so one
    archive ≈ 1 GB compressed (the CC convention); url-keyed
    bucketing keeps a url's revisits in ONE archive, so per-archive
    CDX slices stay urlkey-contiguous. A NULL url buckets as ''
    (md5 of NULL is NULL → NULL archive_id → int(NaN) killed the
    whole pages_to_warc job on one bad row — r07 review; the A13
    discipline is degrade-visibly, never task failure)."""
    from pyspark.sql import functions as F
    b = (F.conv(F.substring(
            F.md5(F.encode(F.concat(F.lit(f"{seed}:arc:"),
                                    F.coalesce(F.col(url_col),
                                               F.lit(""))), "UTF-8")),
            1, 15), 16, 10)
         .cast("long") % n_archives)
    return df.withColumn("archive_id", b)


WARC_ARCHIVE_SCHEMA = (
    "filename string, content binary, n_records int, "
    "cdx array<struct<url: string, warc_ts: timestamp, "
    "offset: bigint, length: bigint, digest: string, "
    "mime: string, http_status: int>>"
)


def pages_to_warc(pages: DataFrame, archive_col: str = "archive_id",
                  url_col: str = "url", ts_col: str = "warc_ts",
                  html_col: str = "html",
                  prefix: str = "crawl") -> DataFrame:
    """The DISTRIBUTED archive write side: pages rows → one row per
    archive (filename, content-bytes, n_records, cdx), where ``cdx``
    carries the builder's own byte accounting (offset/length/digest
    per record) ready for ``operators.cdx.format_cdxj`` after an
    explode — so a crawl tier writes its WARCs and its index in ONE
    pass, the layout Common Crawl ships (one gzip member per record;
    ``warc_record_index`` round-trips the bytes).

    Determinism contract: the caller assigns ``archive_col`` (a real
    pipeline already shards by crawl segment); rows are sorted by
    ``url_col`` INSIDE the kernel, so archive bytes are a pure
    function of the row set — applyInPandas group arrival order is
    partition-dependent (the induction lesson, r06) and must never
    reach the serializer. Scale shape: one task per archive, no
    shuffle beyond the groupBy; peak memory one archive's records."""
    import pyarrow  # noqa: F401  (arrow path required)

    def build(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (aid,) = key
        # TOTAL order, not url alone: two captures of one url in one
        # archive group (the revisit case) tie under a url sort, and
        # stable mergesort would then preserve partition-arrival
        # order — archive bytes/offsets/digests flapping across runs
        # (r07 review; the r06 'silent hash flap' class). Tie-break
        # by timestamp then body hash; rows identical in all three
        # serialize identical bytes in either order.
        import hashlib
        pdf = pdf.assign(_tb=[
            hashlib.md5(bytes(b) if b is not None else b"")
            .hexdigest() for b in pdf[html_col]])
        pdf = pdf.sort_values([url_col, ts_col, "_tb"],
                              kind="mergesort", na_position="last")
        recs = []
        stamps = []
        for url, ts, body in zip(pdf[url_col], pdf[ts_col],
                                 pdf[html_col]):
            body = bytes(body) if body is not None else b""
            ts = None if pd.isna(ts) else ts       # NaT → no date
            date = (ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                    if ts is not None else None)
            stamps.append(ts)
            recs.append({"type": "response", "url": url,
                         "date": date, "body": body,
                         "http_status": 200, "mime": "text/html"})
        idx: list[dict] = []
        raw = build_warc(recs, gzip_members=True, index=idx)
        # mime/http_status ride the cdx struct from the SAME record
        # dicts the serializer consumed — one source of truth, so an
        # index consumer can never assert metadata the archive bytes
        # don't carry (r07 review)
        cdx = [{"url": r["url"], "warc_ts": t,
                "offset": i["offset"], "length": i["length"],
                "digest": i["digest"], "mime": r["mime"],
                "http_status": r["http_status"]}
               for r, i, t in zip(recs, idx, stamps)]
        return pd.DataFrame(
            {"filename": [f"{prefix}-{int(aid):05d}.warc.gz"],
             "content": [raw], "n_records": [len(recs)],
             "cdx": [cdx]})

    return (pages.select(archive_col, url_col, ts_col, html_col)
            .groupBy(archive_col).applyInPandas(
                build, WARC_ARCHIVE_SCHEMA))


FETCH_SCHEMA = (
    "filename string, url string, status string, record_type string, "
    "http_status int, mime string, html binary, n_bytes int"
)


def fetch_by_index(archives: DataFrame, index: DataFrame,
                   filename_col: str = "filename",
                   content_col: str = "content") -> DataFrame:
    """The index READ path — random access into archives by
    (offset, length), the reason the CDX format exists: ``index``
    rows (filename, url, offset, length — ``parse_cdxj`` output or
    the ``pages_to_warc`` cdx column) are fetched from ``archives``
    (filename, content-bytes) by slicing the member span and
    inflating ONLY it; the rest of the archive is never parsed.

    On object storage this slice is a ranged GET per record; here the
    archive bytes arrive as one column and the slice happens in the
    kernel — the join shape (index rows grouped per archive, one
    task per archive) is the same either way. A span that fails to
    frame (corrupt offset, truncated slice) yields an
    ``error:BadSpan`` status row — A13 taxonomy, never a task
    failure."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("filename", "url", "status", "record_type",
                "http_status", "mime", "html", "n_bytes")
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in cols}
            for fname, raw, wants in zip(pdf["_fn"], pdf["_raw"],
                                         pdf["_wants"]):
                raw = bytes(raw) if raw is not None else b""
                for w in wants:
                    url, off, ln = (w["url"], w["offset"],
                                    w["length"])
                    out["filename"].append(fname)
                    out["url"].append(url)
                    rec = None
                    # a NULL span (parse_cdxj's BadLine/BadJson or
                    # junk-numeric rows are documented input) must
                    # degrade to BadSpan, never kill the task
                    if off is not None and ln is not None and \
                            not pd.isna(off) and not pd.isna(ln):
                        span = raw[int(off):int(off) + int(ln)]
                        try:
                            member = (zlib.decompress(span, 31)
                                      if span[:2] == b"\x1f\x8b"
                                      else span)
                            for r in iter_warc_records(
                                    member + b"\r\n\r\n"):
                                if not r["status"].startswith(
                                        "error:"):
                                    rec = r
                                break
                        except zlib.error:
                            rec = None
                    if rec is None:
                        out["status"].append("error:BadSpan")
                        for k in ("record_type", "http_status",
                                  "mime", "html"):
                            out[k].append(None)
                        out["n_bytes"].append(0)
                    else:
                        out["status"].append(rec["status"])
                        out["record_type"].append(rec["record_type"])
                        out["http_status"].append(rec["http_status"])
                        out["mime"].append(rec["mime"])
                        out["html"].append(rec["body"])
                        out["n_bytes"].append(len(rec["body"]))
            yield pd.DataFrame(out)

    from pyspark.sql import functions as F
    # pack the index rows per archive BEFORE the join: joining the
    # raw index against the content column replicates the WHOLE
    # archive's bytes once per fetched record (1 GB archive × 50k
    # records ≈ 50 TB through the join — r07 review); this shape
    # moves each archive's bytes exactly once and keeps one task per
    # archive, the docstring's contract
    wants = (index.groupBy(F.col(filename_col).alias("_fn"))
             .agg(F.collect_list(F.struct(
                 F.col("url").alias("url"),
                 F.col("offset").alias("offset"),
                 F.col("length").alias("length"))).alias("_wants")))
    joined = wants.join(
        archives.select(F.col(filename_col).alias("_fn"),
                        F.col(content_col).alias("_raw")), "_fn")
    return joined.mapInPandas(run, FETCH_SCHEMA)


def build_warc(records: list[dict], gzip_members: bool = True,
               index: list[dict] | None = None) -> bytes:
    """Fixture construction path (disjoint from the parser): each
    record dict carries {type, url, date, body, http_status, mime};
    response bodies are wrapped in an HTTP/1.1 message. One gzip
    member per record when ``gzip_members`` (the CC layout).

    When ``index`` is a list, the builder appends one
    {url, offset, length, digest} dict per record from its OWN byte
    accounting as it writes — the independent truth the CDX write
    side (``warc_record_index``) is value-checked against."""
    out = []
    written = 0
    for r in records:
        body = r.get("body", b"")
        if isinstance(body, str):
            body = body.encode("utf-8")
        if r.get("type") == "response":
            # assemble by concatenation, never by %-formatting a
            # string that embeds header VALUES: a Location like
            # '/a%2Fb' (percent-encoding is the norm in real 3xx
            # targets) would crash the format — or, with '%s' in the
            # value, silently consume the other args and corrupt the
            # archive bytes (r07 review)
            loc = (b"Location: " + r["location"].encode("latin-1") +
                   b"\r\n") if r.get("location") else b""
            http = (b"HTTP/1.1 %d OK\r\n" % r.get("http_status", 200)
                    + b"Content-Type: "
                    + r.get("mime", "text/html").encode("latin-1")
                    + b"\r\n" + loc
                    + b"Content-Length: %d\r\n\r\n" % len(body))
            payload = http + body
        else:
            payload = body
        head = [b"WARC/1.0",
                b"WARC-Type: " + r["type"].encode("latin-1")]
        if r.get("url"):
            head.append(b"WARC-Target-URI: " + r["url"].encode("latin-1"))
        if r.get("date"):
            head.append(b"WARC-Date: " + r["date"].encode("latin-1"))
        head.append(b"Content-Length: %d" % len(payload))
        rec = b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = co.compress(rec) + co.flush()
        if index is not None:
            # gzip layout: span = the compressed member; plain
            # layout: the frame MINUS the trailing \r\n\r\n padding
            # (the parser treats padding as inter-record, outside
            # the span)
            length = len(rec) if gzip_members else len(rec) - 4
            index.append({"url": r.get("url"), "offset": written,
                          "length": length,
                          "digest": payload_digest(body)})
        written += len(rec)
        out.append(rec)
    return b"".join(out)
