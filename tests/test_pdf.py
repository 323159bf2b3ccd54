"""PDF/layout parsing: from-scratch writer↔reader round trip and the
Spark mapInPandas operator (north_rule: "PDF/layout parse")."""

import random
import re
import string
import zlib

from mini_html_parser_spark.operators.pdf import (
    extract_pdf_text,
    parse_pdf_documents,
    pdf_bytes_from_text,
)


def test_round_trip_escapes_unicode_pagination():
    t = "hello (world) \\ test\nsecond line\n中文 text\nlast"
    assert extract_pdf_text(pdf_bytes_from_text(t, lines_per_page=2)) == (t, 2, False)


def test_round_trip_randomized():
    random.seed(7)
    alphabet = string.printable[:-5] + "()\\中ü"
    for _ in range(300):
        s = "".join(
            random.choice(alphabet) for _ in range(random.randint(0, 120))
        )
        txt, n, m = extract_pdf_text(pdf_bytes_from_text(s, lines_per_page=3))
        assert not m and txt == s, (s, txt)
        assert n == max(-(-len(s.split("\n")) // 3), 1)


def test_operator_tokens_in_strings_do_not_break_parse():
    # "ET"/"BT"/"Tj" inside literal strings must not terminate blocks
    t = "PET BT ET Tj (nested) [array] T* 1 2 Td"
    assert extract_pdf_text(pdf_bytes_from_text(t)) == (t, 1, False)


def test_flate_compressed_stream():
    raw = pdf_bytes_from_text("flate line one\nflate two")
    m = re.search(rb"<< /Length (\d+) >>\nstream\n(.*?)\nendstream", raw, re.DOTALL)
    comp = zlib.compress(m.group(2))
    new = (
        raw[: m.start()]
        + b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
        + comp
        + b"\nendstream"
        + raw[m.end() :]
    )
    assert extract_pdf_text(new) == ("flate line one\nflate two", 1, False)


def test_malformed_fallback():
    assert extract_pdf_text(b"") == ("", 0, True)
    assert extract_pdf_text(b"not a pdf at all") == ("", 0, True)
    # PDF header but garbage body: parses to empty text, not an error
    txt, _n, m = extract_pdf_text(b"%PDF-1.4\ngarbage")
    assert txt == "" and not m


def test_spark_operator(spark):
    rows = [
        ("1", pdf_bytes_from_text("alpha\nbeta", lines_per_page=1)),
        ("2", b"broken bytes"),
        ("3", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    got = {r["doc_id"]: r for r in parse_pdf_documents(df).collect()}
    assert got["1"]["text"] == "alpha\nbeta" and got["1"]["n_pages"] == 2
    assert not got["1"]["malformed"]
    assert got["2"]["malformed"] and got["2"]["text"] == ""
    assert got["3"]["malformed"]


def test_interleaved_spans_round_trip():
    from mini_html_parser_spark.operators.pdf import (
        extract_pdf_spans,
        pdf_bytes_from_spans,
    )

    spans = [
        ("text", "intro paragraph\nline two"),
        ("media", "media://img/7"),
        ("text", "after the (image) BT ET Do"),
        ("media", "media://vid/9 \\x"),
        ("text", "tail"),
    ]
    assert extract_pdf_spans(pdf_bytes_from_spans(spans)) == (spans, 1, False)
    # media-first and media-only documents
    assert extract_pdf_spans(pdf_bytes_from_spans([("media", "m")])) == (
        [("media", "m")], 1, False,
    )


def test_interleaved_spark_operator(spark):
    from mini_html_parser_spark.operators.pdf import (
        parse_pdf_interleaved,
        pdf_bytes_from_spans,
    )

    blob = pdf_bytes_from_spans([("text", "a"), ("media", "r1"), ("text", "b")])
    df = spark.createDataFrame([("1", blob)], "doc_id string, content binary")
    row = parse_pdf_interleaved(df).collect()[0]
    assert [
        (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]
    ] == [("text", "a", "", 0), ("media", "", "r1", 1), ("text", "b", "", 2)]
    assert row["n_pages"] == 1 and not row["malformed"]


def test_pdf_extraction_job_end_to_end_with_resume(spark, tmp_path):
    """run_pdf_extraction_job: salting/lineage/metrics/resume over a
    binary PDF corpus, sharing the icelite machinery with HTML."""
    from pyspark.sql import functions as F

    from mini_html_parser_spark.pipeline import run_pdf_extraction_job

    rows = [
        (str(i), pdf_bytes_from_text(f"doc {i} line one\nline two"))
        for i in range(30)
    ] + [("bad", b"not a pdf")]
    pdfs = spark.createDataFrame(rows, "doc_id string, content binary")

    out = str(tmp_path / "pdftbl")
    result = run_pdf_extraction_job(spark, pdfs, out, parallelism=2)
    snap = result["snapshot"]
    assert snap["total_rows"] == 31
    assert result["metrics"]["docs_parsed"] == 31
    assert result["metrics"]["malformed_fallbacks"] == 1
    assert result["metrics"]["spans_emitted"] == 30  # one text span each

    # resume: identical input -> all buckets committed, no-op commit
    again = run_pdf_extraction_job(spark, pdfs, out, parallelism=2)
    assert again["snapshot"] is None

    from mini_html_parser_spark.plans.icelite import IceliteTable

    back = IceliteTable(out).read(spark)
    assert back.count() == 31
    good = back.filter(F.col("doc_id") == "7").collect()[0]
    assert [s["text"] for s in good["spans"]] == ["doc 7 line one\nline two"]
    assert good["n_pages"] == 1 and not good["malformed"]


def test_adversarial_pdf_keywords_in_text():
    """PDF structural keywords inside document text must not corrupt
    the scan: streams are sliced by /Length, structural scans exclude
    stream bytes, filter misdetection falls back to a raw scan."""
    cases = [
        "before endstream after",          # stream truncation bait
        "x stream\nBT (fake) Tj ET y",     # stream-start bait
        "docs about /Type /Page counting", # page-count bait
        "uses /Filter /FlateDecode here",  # filter misdetection bait
        "dict-ish << /Subtype /Image /Name /Im9 /Subject (phantom) >>",
        "endobj 9 0 obj trailer xref",
    ]
    for t in cases:
        got = extract_pdf_text(pdf_bytes_from_text(t, lines_per_page=40))
        assert got == (t, 1, False), (t, got)
    # the filter-bait text must also not poison the NEXT page's stream
    two_pages = "uses /Filter /FlateDecode here\nsecond page line"
    assert extract_pdf_text(pdf_bytes_from_text(two_pages, lines_per_page=1)) == (
        two_pages, 2, False,
    )
    # interleaved: keywords in text AND a '>' in the media ref
    from mini_html_parser_spark.operators.pdf import (
        extract_pdf_spans,
        pdf_bytes_from_spans,
    )

    spans = [
        ("text", "see endstream and /Type /Page"),
        ("media", "media://a>b?c=<d>"),
        ("text", "after"),
    ]
    assert extract_pdf_spans(pdf_bytes_from_spans(spans)) == (spans, 1, False)


def test_quote_show_operator_moves_to_next_line():
    """The ' operator is "next line, then show" (ISO 32000 9.4.3) —
    hand-built PDF, since the bundled writer only emits Tj."""
    stream = b"BT /F1 12 Tf 72 720 Td (line one) Tj (line two) ' ET"
    body = b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n" \
        b"2 0 obj\n<< /Length " + str(len(stream)).encode() + \
        b" >>\nstream\n" + stream + b"\nendstream\nendobj\n"
    assert extract_pdf_text(body) == ("line one\nline two", 1, False)


def test_corrupt_flate_stream_marks_malformed():
    """A genuinely /FlateDecode-declared, /Length-sliced stream that
    fails to decompress must surface malformed=True and emit no
    garbage text — not raw-scan compressed bytes."""
    junk = b"\x99\x99not-deflate\x99(fake) Tj\x99"
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(junk)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + junk + b"\nendstream\nendobj\n"
    )
    txt, n, m = extract_pdf_text(body)
    assert txt == "" and m and n == 1


def test_indirect_length_falls_back_to_endstream_scan():
    """An indirect /Length (12 0 R) must not slice a bogus 1-byte
    body — the stream falls back to endstream-delimited scanning."""
    stream = b"BT /F1 12 Tf 72 720 Td (indirect ok) Tj ET"
    body = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
        b"2 0 obj\n<< /Length 12 0 R >>\nstream\n" + stream
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(body) == ("indirect ok", 1, False)
