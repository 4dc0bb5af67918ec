"""WARC (Web ARChive, ISO 28500) corpus connector.

The Common Crawl interchange format — the single largest public source
of LLM pre-training text arrives as .warc(.gz) response captures (raw
HTTP) or .wet conversion records (extracted plain text).  This
connector parses either record type from WARC files and normalizes the
extracted text onto the engine's canonical `documents` schema, so the
whole dedup/quality/curation surface runs unchanged on crawl data.

Execution shape (the standard one for WARC at scale):
- `binaryFile` source → one task per WARC file.  gzip is not
  splittable and WARC records are variable-length, so FILE-level
  parallelism is the unit of work everywhere (cc_net, Dolma, and
  Spark's own warc readers all do this); crawls ship as many ~1 GB
  files precisely so this parallelizes.  The parse runs inside
  Arrow-batched `mapInPandas` — no driver-side loop, no per-row UDF.
- Multi-member gzip (the .warc.gz convention: one gzip member per
  record) decompresses with stdlib zlib member-chaining.
- Malformed records quarantine with (file, byte offset, reason)
  instead of failing the job; parsing resynchronizes only when the
  record length is known, otherwise the remainder of that file is
  quarantined as one row — auditable, never silent.
- HTML → text is a deliberately small stdlib extraction (drop
  script/style/comments, strip tags, unescape entities, collapse
  whitespace).  A production trafilatura-grade extractor slots in at
  the same seam (`_http_payload_to_text`) without touching the plan.

The WARC-Target-URI is preserved in the `source` column (provenance —
what URL-level dedup and domain mixing key on), falling back to the
connector's corpus label for records without one.
"""

from __future__ import annotations

import html as _html
import re
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oxford_data_pipeline_spark.sources.textfiles import _normalize

_PARSED_SCHEMA = (
    "text string, source string, file string, offset long, bad_reason string"
)

# record types that carry document text: `response` = raw HTTP capture
# (.warc), `conversion` = pre-extracted plain text (.wet)
_TEXT_TYPES = {"response", "conversion"}


def _gunzip_members(blob: bytes) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout:
    one member per record) into one byte stream."""
    out = []
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(blob[pos:]))
        tail = d.unused_data
        if not tail:
            break
        pos = len(blob) - len(tail)
    return b"".join(out)


def _dechunk(body: bytes) -> bytes:
    """Strip Transfer-Encoding: chunked framing (RFC 9112 §7.1): each
    chunk is `<hex-size>[;ext]CRLF <data> CRLF`, terminated by a
    0-size chunk.  Best-effort: on malformed framing, return whatever
    decoded cleanly so far rather than leaking chunk-size hex tokens
    into document text."""
    out, pos, n = [], 0, len(body)
    while pos < n:
        # earliest line terminator wins: an LF-only size line must not
        # be skipped in favour of a CRLF that sits inside chunk data
        crlf = body.find(b"\r\n", pos)
        lf = body.find(b"\n", pos)
        if lf < 0:
            break
        if crlf >= 0 and crlf < lf:
            eol, nxt = crlf, crlf + 2
        else:
            eol, nxt = lf, lf + 1
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[nxt:nxt + size])
        pos = nxt + size
        # consume the CRLF (or LF) trailing the chunk data
        if body[pos:pos + 2] == b"\r\n":
            pos += 2
        elif body[pos:pos + 1] == b"\n":
            pos += 1
    return b"".join(out)


def _http_payload_to_text(payload: bytes) -> str:
    """HTTP response bytes → visible text: drop the header block
    (CRLFCRLF per spec, but real captures include LF-only responses),
    de-chunk Transfer-Encoding: chunked bodies, then strip
    script/style/comments/tags, unescape entities, collapse space."""
    sep_crlf = payload.find(b"\r\n\r\n")
    sep_lf = payload.find(b"\n\n")
    if sep_crlf >= 0 and (sep_lf < 0 or sep_crlf <= sep_lf):
        headers, body = payload[:sep_crlf], payload[sep_crlf + 4:]
    elif sep_lf >= 0:
        headers, body = payload[:sep_lf], payload[sep_lf + 2:]
    else:
        headers, body = b"", payload
    if re.search(rb"(?im)^transfer-encoding\s*:.*\bchunked\b", headers):
        body = _dechunk(body)
    doc = body.decode("utf-8", "replace")
    doc = re.sub(r"(?is)<(script|style)[^>]*>.*?</\1>", " ", doc)
    doc = re.sub(r"(?s)<!--.*?-->", " ", doc)
    doc = re.sub(r"<[^>]+>", " ", doc)
    doc = _html.unescape(doc)
    return re.sub(r"\s+", " ", doc).strip()


def _parse_warc(name: str, blob: bytes) -> Iterator[dict]:
    """Yield parsed-record dicts (text/source set) and quarantine dicts
    (bad_reason set) from one WARC file's bytes."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = _gunzip_members(blob)
        except zlib.error as exc:
            yield {"file": name, "offset": 0, "bad_reason": f"gzip: {exc}"}
            return
    pos, n = 0, len(blob)
    while pos < n:
        while blob[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        end_hdr = blob.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            yield {"file": name, "offset": pos,
                   "bad_reason": "unterminated record header"}
            return
        lines = blob[pos:end_hdr].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            # cannot trust the header block → cannot resync: quarantine
            # the remainder of the file as one auditable row
            yield {"file": name, "offset": pos,
                   "bad_reason": "missing WARC/ version line"}
            return
        fields: dict[bytes, bytes] = {}
        for ln in lines[1:]:
            key, _, val = ln.partition(b":")
            fields[key.strip().lower()] = val.strip()
        try:
            clen = int(fields[b"content-length"])
            if clen < 0:
                raise ValueError(clen)
        except (KeyError, ValueError):
            yield {"file": name, "offset": pos,
                   "bad_reason": "missing/invalid Content-Length"}
            return
        body_start = end_hdr + 4
        body = blob[body_start:body_start + clen]
        if len(body) < clen:
            yield {"file": name, "offset": pos,
                   "bad_reason": "truncated record payload"}
            return
        pos = body_start + clen  # length known → resync past this record
        rectype = fields.get(b"warc-type", b"").decode("ascii", "replace").lower()
        if rectype not in _TEXT_TYPES:
            continue  # warcinfo / request / metadata / revisit
        uri = fields.get(b"warc-target-uri")
        text = (
            _http_payload_to_text(body)
            if rectype == "response"
            else body.decode("utf-8", "replace").strip()
        )
        if text:
            yield {
                "text": text,
                "source": uri.decode("utf-8", "replace") if uri else None,
            }


def read_warc_documents(
    spark: SparkSession, path: str, source: str = "warc"
) -> tuple[DataFrame, DataFrame]:
    """Read WARC/WET files → (documents, quarantine).  Documents carry
    the canonical schema (doc_id = content hash, source = target URI or
    the corpus label); quarantine rows carry (file, offset, reason)."""
    import pandas as pd

    bins = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["text", "source", "file", "offset", "bad_reason"]
        for pdf in batches:
            rows = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                for rec in _parse_warc(str(name), bytes(blob)):
                    rows.append([rec.get(c) for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    parsed = bins.mapInPandas(parse, _PARSED_SCHEMA).cache()
    bad = parsed.filter(F.col("bad_reason").isNotNull()).select(
        "file", "offset", F.col("bad_reason").alias("reason")
    )
    good = parsed.filter(F.col("bad_reason").isNull()).select("text", "source")
    return _normalize(good, source), bad
