"""WARC reader (sources/warc.py): record framing, gzip layouts, HTTP
body extraction, exact text round trips, malformed-input errors, and
the Spark extraction pipeline."""

from __future__ import annotations

import gzip

import pytest

from datawarehouse1_spark.sources.warc import (
    encode_warc,
    extract_text,
    http_response_body,
    parse_warc,
    wrap_html,
)


def _pages(texts):
    return [
        (f"http://corpus.local/doc/{i}", "2026-01-01T00:00:00Z", wrap_html(t))
        for i, t in enumerate(texts)
    ]


@pytest.mark.parametrize("per_record_gzip", [True, False])
def test_warc_roundtrip_framing(per_record_gzip):
    pages = _pages(["alpha", "beta & <gamma>", "líne\ntwo"])
    recs = parse_warc(encode_warc(pages, per_record_gzip=per_record_gzip))
    assert len(recs) == 3
    for (uri, date, page), r in zip(pages, recs):
        assert r.warc_type == "response"
        assert r.target_uri == uri and r.date == date
        assert http_response_body(r.body) == page


def test_whole_file_gzip_layout():
    pages = _pages(["a", "b"])
    whole = gzip.compress(encode_warc(pages, per_record_gzip=False))
    assert len(parse_warc(whole)) == 2


def test_text_extraction_exactly_inverts_wrapping():
    cases = [
        "plain text",
        "entities: & < > \" '",
        "unicode: àéîöü — ligatures ﬁ",
        "looks<like<tags but escaped",
        "multi\nline\n\ntext with   spaces",
        "",
    ]
    for text in cases:
        assert extract_text(wrap_html(text)) == text, repr(text)


def test_extractor_drops_script_and_style():
    page = (
        b"<html><head><style>body{color:red}</style></head>"
        b"<body><script>if(a<b){x()}</script>content</body></html>"
    )
    assert extract_text(page) == "content"


def test_malformed_warc_raises():
    with pytest.raises(ValueError, match="version line"):
        parse_warc(b"NOT-WARC/1.0\r\n\r\n")
    # truncated body: declared Content-Length exceeds data
    good = encode_warc(_pages(["hello"]), per_record_gzip=False)
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(good[:-20])
    with pytest.raises(ValueError, match="gzip"):
        parse_warc(b"\x1f\x8b" + b"\x00" * 20)
    with pytest.raises(ValueError, match="terminator"):
        http_response_body(b"HTTP/1.1 200 OK no terminator")


def test_spark_pipeline_recovers_documents(spark):
    """Archive packing -> full extraction chain returns every document's
    exact text keyed by the URI-derived id."""
    from datawarehouse1_spark.catalog import table
    from datawarehouse1_spark.queries.warc_ext import (
        synthesize_warc_archives,
        warc_extract_documents,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").filter("doc_id < 40")
    expected = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    out = warc_extract_documents(synthesize_warc_archives(docs)).collect()
    assert {r.doc_id: r.text for r in out} == expected
    assert all(r.uri.endswith(str(r.doc_id)) for r in out)
