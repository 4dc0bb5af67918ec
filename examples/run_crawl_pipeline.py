"""Crawl-ingest curation end-to-end: WARC → URL tier → paragraph
tier → content tier.

    python examples/run_crawl_pipeline.py [work_dir]

The first mile of a real pre-training pipeline, composed from the
registered operators in the order cc_net / RefinedWeb / Dolma run it:

1. A .warc.gz capture file lands (here: synthesized, with the noise a
   real crawl carries — duplicate captures of one page under scheme /
   www / fragment / tracking-param variation, a chunked
   transfer-encoding response, an LF-only response, a blocked-host
   page, and one malformed record).
2. The WARC connector parses it (file-level parallelism, Arrow
   `mapInPandas`), quarantining the malformed record with (file,
   offset, reason) and preserving WARC-Target-URI as `source`.
3. URL tier (BEFORE any content processing): normalize the URL
   (`operators/urlops.py`), drop blocklisted hosts with a broadcast
   anti-join, keep-first per normalized URL (`dedup_url` semantics),
   and roll up the per-host counts domain mixing keys on.
4. Paragraph tier on the URL-level survivors (cc_net's second pass):
   content-defined segmentation + the `dedup_paragraph_survivors`
   keep-rule splices the shared site boilerplate out of every page
   but the globally-first occurrence.
5. Content tier on the paragraph-cleaned survivors: C4 heuristics +
   PII gate (the same scan-local operators `cur_pipeline` composes),
   then content-hash exact dedup as the final dedup pass.
6. Reports land via the S6/S7 sinks.

Every stage asserts its contract; the composition is CI-driven by
tests/test_codecs.py::test_crawl_pipeline_example_end_to_end.
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_HTML = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
         b"<html><body><p>%s</p></body></html>")
_CHUNKED = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"1a\r\nchunked capture body words\r\n0\r\n\r\n")
_LF_ONLY = b"HTTP/1.1 200 OK\nContent-Type: text/html\n\n<p>lf framed page</p>"


def _rec(rectype: str, uri: str | None, payload: bytes) -> bytes:
    hdr = [b"WARC/1.0", b"WARC-Type: " + rectype.encode()]
    if uri:
        hdr.append(b"WARC-Target-URI: " + uri.encode())
    hdr.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _build_crawl(path: str) -> None:
    """One .warc.gz file: 7 good records + 1 malformed."""
    body = lambda s: _HTML % s  # noqa: E731
    # shared site boilerplate (footer text on every news page) — the
    # paragraph tier exists to splice exactly this out of all but the
    # globally-first occurrence
    boiler = (b" subscribe to our newsletter today for daily updates"
              b" delivered straight to your inbox every single morning")
    recs = [
        # the same article captured three ways -> ONE normalized URL
        _rec("response", "HTTP://WWW.News.Example/story/42?utm_source=feed",
             body(b"breaking story text one two three four five six"
                  + boiler)),
        _rec("response", "https://news.example/story/42#comments",
             body(b"breaking story text one two three four five six recrawl"
                  + boiler)),
        _rec("response", "https://news.example/story/42/",
             body(b"breaking story text one two three four five six again"
                  + boiler)),
        # distinct pages
        _rec("response", "https://news.example/story/43",
             body(b"different story body with plenty of words to pass gates"
                  + boiler)),
        _rec("response", "https://blog.example/post?id=7", _CHUNKED),
        _rec("response", "https://blog.example/post-two", _LF_ONLY),
        # a host the blocklist will drop
        _rec("response", "https://spam.example/landing",
             body(b"buy now spam page words words words words words words")),
        # malformed: claims more payload than exists
        (b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 9999"
         b"\r\n\r\nshort"),
    ]
    with open(path, "wb") as fh:
        for r in recs:
            fh.write(gzip.compress(r))


def main(spark: SparkSession | None = None, work: str | None = None) -> dict:
    if spark is None:
        from oxford_data_pipeline_spark.session import get_spark

        spark = get_spark("crawl-pipeline")
    work = work or tempfile.mkdtemp(prefix="crawl_")
    os.makedirs(work, exist_ok=True)

    from oxford_data_pipeline_spark.operators.urlops import normalize_urls
    from oxford_data_pipeline_spark.plans.curation import host_counts
    from oxford_data_pipeline_spark.plans.quality import c4_heuristics, pii_scrub
    from oxford_data_pipeline_spark.sources.sinks import (
        write_json_report,
        write_text_summary,
    )
    from oxford_data_pipeline_spark.sources.warc import read_warc_documents

    # ---- 1+2: capture lands; connector parses + quarantines ----
    crawl = os.path.join(work, "crawl.warc.gz")
    _build_crawl(crawl)
    docs, bad = read_warc_documents(spark, crawl, source="crawl-demo")
    n_docs, n_bad = docs.count(), bad.count()
    assert n_docs == 7 and n_bad == 1, (n_docs, n_bad)
    reasons = [r["reason"] for r in bad.collect()]
    assert reasons == ["truncated record payload"], reasons
    print(f"connector: {n_docs} documents, {n_bad} quarantined ({reasons[0]})")

    # ---- 3: URL tier (normalize -> blocklist -> URL dedup -> mix) ----
    normed = normalize_urls(docs, url_col="source")
    blocklist = spark.createDataFrame([("spam.example",)], "host string")
    admitted = normed.join(F.broadcast(blocklist), "host", "left_anti")
    assert admitted.count() == 6  # spam.example page dropped
    # keep-first per normalized URL (dedup_url semantics: min doc_id)
    keep = admitted.groupBy("norm_url").agg(F.min("doc_id").alias("doc_id"))
    survivors = admitted.join(keep, ["norm_url", "doc_id"])
    n_surv = survivors.count()
    assert n_surv == 4, n_surv  # 3 captures of story/42 collapsed to 1
    mix = host_counts(admitted.select("doc_id", "n_chars",
                                      F.col("source").alias("url")))
    hosts = {r["host"]: r["n_docs"] for r in mix.collect()}
    assert hosts == {"news.example": 4, "blog.example": 2}, hosts
    # chunked + LF-only framing never leaks into text
    texts = {r["norm_url"]: r["text"] for r in survivors.collect()}
    assert texts["blog.example/post?id=7"] == "chunked capture body words"
    assert texts["blog.example/post-two"] == "lf framed page"
    print(f"url tier: blocklist dropped 1 host, url dedup 6 -> {n_surv}; "
          f"hosts: {hosts}")

    # ---- 4: paragraph tier (cc_net's second pass) on URL survivors ----
    # the shared news-site footer repeats across pages; only its
    # globally-first occurrence (min (doc_id, position)) survives
    from oxford_data_pipeline_spark.operators.textops import normalized, tokens
    from oxford_data_pipeline_spark.plans.dedup import (
        paragraph_survivors_relation,
    )

    toks = (
        survivors.withColumn("t", tokens(normalized(F.col("text"))))
        .filter(F.size("t") > 0)
        .select("doc_id", "t")
    )
    cleaned = paragraph_survivors_relation(toks)
    stats = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["clean_text"])
        for r in cleaned.collect()
    }
    n_paras = sum(s[0] for s in stats.values())
    n_kept = sum(s[1] for s in stats.values())
    assert n_kept < n_paras, (n_paras, n_kept)  # boilerplate was spliced
    # marker: an INTERIOR footer token ("inbox") — content-defined
    # boundaries put the footer's first words in the doc-unique
    # boundary paragraph, so only interior paragraphs are cross-doc
    # duplicates
    boiler_docs = sorted(
        d for d, r in {
            r["doc_id"]: r for r in survivors.collect()
        }.items() if "inbox" in r["text"]
    )
    assert len(boiler_docs) == 2  # story/42 keeper + story/43
    keeps = {d: "inbox" in stats[d][2] for d in boiler_docs}
    # exactly the smaller doc_id keeps the footer (the batch keep-rule)
    assert keeps == {boiler_docs[0]: True, boiler_docs[1]: False}, keeps
    print(f"paragraph tier: {n_paras} paragraphs -> {n_kept} kept; "
          f"footer kept only on doc {boiler_docs[0]}")
    docs_clean = survivors.select("doc_id", "source").join(
        cleaned.select("doc_id", F.col("clean_text").alias("text")), "doc_id"
    )

    # ---- 4b: exact-substring audit (unbounded length) ----
    # the bisection audit quantifies what the paragraph tier removed:
    # before cleaning, the shared footer makes the longest duplicated
    # substring at least footer-sized; after cleaning it survives on
    # ONE document only, so the maximum collapses
    from oxford_data_pipeline_spark.plans.quality import (
        longest_dup_substring_relation,
    )

    pre_audit = longest_dup_substring_relation(
        spark, survivors.select("text")
    ).first()
    post_audit = longest_dup_substring_relation(
        spark, cleaned.select(F.col("clean_text").alias("text"))
    ).first()
    footer_len = len(" subscribe to our newsletter today for daily updates"
                     " delivered straight to your inbox every single morning")
    assert pre_audit["max_dup_len"] >= footer_len - 1
    assert post_audit["max_dup_len"] < footer_len - 1
    assert post_audit["max_dup_len"] <= pre_audit["max_dup_len"]
    print(f"substring audit: longest dup {pre_audit['max_dup_len']} -> "
          f"{post_audit['max_dup_len']} chars after paragraph tier")

    # ---- 5: content tier on the paragraph-cleaned survivors ----
    gated = c4_heuristics(
        pii_scrub(docs_clean)
        .filter(~F.col("has_pii"))
        .join(docs_clean, ["doc_id", "source"])
    ).filter("admitted")
    n_gated = gated.count()
    assert 1 <= n_gated <= n_surv
    # second dedup pass: exact content fingerprints among the gated
    fp = docs_clean.join(gated.select("doc_id"), "doc_id").select(
        "doc_id", F.md5("text").alias("fp")
    )
    n_distinct = fp.select("fp").distinct().count()
    assert n_distinct == n_gated  # survivors are content-distinct here
    print(f"content tier: {n_gated} admitted, {n_distinct} distinct")

    # ---- 6: reports ----
    write_json_report(mix.orderBy("host"), os.path.join(work, "domain_mix.json"))
    write_text_summary(
        bad, os.path.join(work, "quarantine.txt"), "Quarantined records"
    )
    print(f"reports under {work}")
    return {
        "documents": n_docs,
        "quarantined": n_bad,
        "url_survivors": n_surv,
        "paragraphs": n_paras,
        "paragraphs_kept": n_kept,
        "admitted": n_gated,
        "hosts": hosts,
        "work": work,
    }


if __name__ == "__main__":
    print(main(work=sys.argv[1] if len(sys.argv) > 1 else None))
