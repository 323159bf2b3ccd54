"""Deterministic interleaved-document corpus generator (FIXTURES.md §1).

Generates the ``documents`` table of BASELINE.json's ``input_hint``:
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``.

Content is drawn from a fixed pool of HTML fragment families that
exercise exactly the semantics the reference's golden tests pin
(FIXTURES.md fragment table).  Generation is a pure function of
``(seed, doc_index)`` — no wall clock, no global RNG state — so it is
embarrassingly parallel: the Spark path generates each partition
independently with ``spark.range`` + ``mapInPandas``, which is how a
10^12-row synthetic corpus would be materialized on a real cluster
(no driver-side data, no shuffle).

Size/skew profile (FIXTURES.md): ~90% small docs (1–5 KB), ~9% medium
(20–50 KB), ~1% giant (0.5–2 MB) so naive hash partitioning skews;
~30% of docs get 1–5 interleaved media spans; ~2% get a malformed
fragment (must route through the malformed-fallback counter).
"""

from __future__ import annotations

import random

import pandas as pd

# fragment families: each exercises reference-pinned semantics
# (sources cited in FIXTURES.md §1; these are new compositions, not
# copies of reference test strings)
_TITLES = [
    "Synthetic corpus page {i}",
    "A study of tries and prefix trees {i}",
    "Document {i}: on parsing",
]
_PARAS = [
    "This is a paragraph about data structures with enough text to pass "
    "length thresholds in span filters.",
    "Short para {i}.",
    "A second paragraph mentions   collapsed    whitespace and\nnewlines.",
    "Text with &amp; entities and &nbsp; non-breaking spaces inside.",
]
_NESTED_DIV = (
    '<div class="level-1" id="d{i}">outer text'
    '<div class="level-2">inner text {i}</div></div>'
)
_FOLD_CHAIN = (
    '<div class="fold-a" id="f{i}"><div class="fold-b">folded content {i}'
    "</div></div>"
)
_TABLE = (
    "<table><thead><tr><th>Header {i}</th></tr></thead>"
    "<tbody><tr><td>cell one</td><td>cell two</td></tr></tbody></table>"
)
_LIST = "<ul><li>alpha {i}</li><li>beta</li><li>gamma</li></ul>"
_PRE = "<pre>verbatim   spacing\n  kept {i}</pre>"
_BR_RUN = "line one<br><br>line two {i}<br>"
_BOILER = (
    '<script>var x_{i} = "noise";</script>'
    "<style>.c{i} {{ color: red; }}</style>"
    "<header>site chrome</header>"
    "<footer>copyright {i}</footer>"
    '<form action="/s"><input name="q"></form>'
    "<iframe src=\"about:blank\"></iframe>"
)
_MALFORMED = '<p> broken {i} </><a href="http://x.example/{i}""> link </a>'
_SMALL_SPAN = "<span>tiny</span><span>a longer span body {i}</span>"

_FAMILIES = [
    "<h1>" + _TITLES[0] + "</h1>",
    "<h2>" + _TITLES[1] + "</h2>",
    "<p>" + _PARAS[0] + "</p>",
    "<p>" + _PARAS[1] + "</p>",
    "<p>" + _PARAS[2] + "</p>",
    "<p>" + _PARAS[3] + "</p>",
    _NESTED_DIV,
    _FOLD_CHAIN,
    _TABLE,
    _LIST,
    _PRE,
    "<p>" + _BR_RUN + "</p>",
    _BOILER,
    _SMALL_SPAN,
]

SEED = 42

# ``str.format`` dominates generation cost (one call per ~70-byte
# fragment; a 2 MB giant doc formats ~28k fragments).  Every family
# placeholder is the SAME value ``{i}``, so each family pre-splits
# (via a one-time .format with a sentinel, which also resolves the
# ``{{``/``}}`` escapes in _BOILER) into literal pieces joined by the
# id string — ``idstr.join(pieces)`` is byte-identical to
# ``family.format(i=idstr)`` and ~3× faster.
_SENTINEL = "\x00"
_FAMILY_PIECES = [f.format(i=_SENTINEL).split(_SENTINEL) for f in _FAMILIES]
_N_FAMILIES = len(_FAMILIES)
# piece-count dispatch: 1 piece = no placeholder (the fragment is a
# constant), 2 pieces = single placeholder (plain concat beats join)
_FAMILY_NPIECES = [len(p) for p in _FAMILY_PIECES]


def _doc_spans(seed: int, i: int) -> list[dict]:
    """Spans for document ``i`` — pure function of (seed, i)."""
    rng = random.Random((seed << 32) ^ i)
    u = rng.random()
    if u < 0.90:
        target = rng.randint(1_000, 5_000)
    elif u < 0.99:
        target = rng.randint(20_000, 50_000)
    else:
        target = rng.randint(500_000, 2_000_000)

    n_media = rng.randint(1, 5) if rng.random() < 0.30 else 0
    malformed = rng.random() < 0.02

    parts: list[str] = ["<html><head><title>doc</title></head><body>"]
    size = 0
    k = 0
    # rng.randrange(_N_FAMILIES) inlined to its getrandbits form
    # (random.py _randbelow_with_getrandbits: draw bit_length bits,
    # reject while >= n).  Consumes the IDENTICAL underlying entropy
    # stream, so documents stay byte-identical (md5-verified over the
    # full bench corpus at seeds 42 and 7), while skipping two Python
    # frames per fragment — the frames were ~45 % of generation time.
    getrandbits = rng.getrandbits
    nf = _N_FAMILIES
    nb = nf.bit_length()
    append = parts.append
    istr = f"{i}_"
    while size < target:
        fam = getrandbits(nb)
        while fam >= nf:
            fam = getrandbits(nb)
        np_ = _FAMILY_NPIECES[fam]
        pieces = _FAMILY_PIECES[fam]
        if np_ == 2:
            frag = pieces[0] + istr + str(k) + pieces[1]
        elif np_ == 1:
            frag = pieces[0]
        else:
            frag = (istr + str(k)).join(pieces)
        append(frag)
        size += len(frag)
        k += 1
    if malformed:
        parts.append(_MALFORMED.format(i=i))
    parts.append("</body></html>")

    # split the html into n_media+1 text chunks at tag boundaries and
    # interleave media spans between them
    spans: list[dict] = []
    offset = 0
    if n_media == 0:
        spans.append({"kind": "html", "text": "".join(parts),
                      "media_ref": "", "offset": 0})
        return spans
    cuts = sorted(rng.sample(range(1, len(parts) - 1), min(n_media, len(parts) - 2)))
    prev = 0
    for ci, cut in enumerate(cuts):
        spans.append({"kind": "html", "text": "".join(parts[prev:cut]),
                      "media_ref": "", "offset": offset})
        offset += 1
        spans.append({"kind": "media", "text": "",
                      "media_ref": f"media://img/{i}/{ci}.png", "offset": offset})
        offset += 1
        prev = cut
    spans.append({"kind": "html", "text": "".join(parts[prev:]),
                  "media_ref": "", "offset": offset})
    return spans


def generate_pandas(n_docs: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    """Local/test generation of [start, start+n_docs)."""
    rows = {
        "doc_id": [f"doc-{i:08d}" for i in range(start, start + n_docs)],
        "spans": [_doc_spans(seed, i) for i in range(start, start + n_docs)],
    }
    return pd.DataFrame(rows)


def generate_documents(spark, n_docs: int, seed: int = SEED, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas (no shuffle)."""
    from .operators.extract import DOCUMENTS_SCHEMA

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].tolist()
            yield pd.DataFrame({
                "doc_id": [f"doc-{i:08d}" for i in ids],
                "spans": [_doc_spans(seed, int(i)) for i in ids],
            })

    rng = spark.range(0, n_docs, numPartitions=partitions)
    return rng.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)

def generate_warc_segments(
    out_dir: str,
    n_segments: int = 32,
    raw_mb_per_segment: int = 8,
    seed: int = SEED,
) -> dict:
    """Deterministic synthetic crawl archive for the WARC ingestion
    bench (VERDICT r4 #8): ``n_segments`` standalone WARC files built
    from the same HTML fragment families as the document corpus, each
    holding ~``raw_mb_per_segment`` MB of raw page HTML.  Every 4th
    segment is whole-file gzip (the CommonCrawl layout), the rest are
    plain — both read paths of sources.warc get exercised.  Pure
    function of (seed, segment), so repeated bench runs reuse the
    cached archive; a ``_manifest.json`` records totals and params
    and doubles as the cache validity marker."""
    import json
    import os

    from .sources.warc import warc_bytes

    manifest_path = os.path.join(out_dir, "_manifest.json")
    params = {
        "n_segments": n_segments,
        "raw_mb_per_segment": raw_mb_per_segment,
        "seed": seed,
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("params") == params:
            return m
    os.makedirs(out_dir, exist_ok=True)
    # invalidate BEFORE touching segment files: a crash mid-rebuild
    # must not leave a manifest that later cache-hits against a
    # partial segment set it does not describe
    if os.path.exists(manifest_path):
        os.remove(manifest_path)
    for name in os.listdir(out_dir):  # stale cache: rebuild clean
        if name.startswith("segment-"):
            os.remove(os.path.join(out_dir, name))
    total_pages = 0
    total_raw = 0
    disk_bytes = 0
    target = raw_mb_per_segment * 1024 * 1024
    for s in range(n_segments):
        rng = random.Random((seed << 16) ^ s)
        pages = []
        size = 0
        while size < target:
            page_target = rng.randint(8_000, 64_000)
            parts = ["<html><head><title>crawl page</title></head><body>"]
            psize = 0
            k = 0
            while psize < page_target:
                frag = _FAMILIES[rng.randrange(len(_FAMILIES))].format(
                    i=f"{s}_{total_pages}_{k}"
                )
                parts.append(frag)
                psize += len(frag)
                k += 1
            parts.append("</body></html>")
            html = "".join(parts)
            pages.append(
                (f"http://crawl.example/seg{s}/page{total_pages}", html)
            )
            size += len(html)
            total_pages += 1
        total_raw += size
        gz = s % 4 == 0
        blob = warc_bytes(pages, compress=gz)
        ext = "warc.gz" if gz else "warc"
        path = os.path.join(out_dir, f"segment-{s:04d}.{ext}")
        with open(path, "wb") as f:
            f.write(blob)
        disk_bytes += len(blob)
    m = {
        "params": params,
        "n_pages": total_pages,
        "raw_html_bytes": total_raw,
        "disk_bytes": disk_bytes,
    }
    with open(manifest_path, "w") as f:
        json.dump(m, f)
    return m
