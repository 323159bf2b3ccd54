"""Self-contained byte-pair-encoding tokenizer (reference B16).

The reference computes GPT-2 token lengths via ``transformers``
(statistics/compute_aggregate_stats.py:25,62-64), which is
unavailable offline.  This module provides a public-knowledge BPE
built from scratch: a fixed, embedded merge table applied in rank
order — the standard BPE application scheme (Sennrich et al. 2016),
with one deterministic simplification: each merge rank makes a
single left-to-right non-overlapping pass (exactly ``str.replace``
semantics) instead of iterating a rank to fixpoint.  The two differ
only on immediately-repeated pairs (``llll`` → ``[ll, l, l]`` vs
``[ll, ll]``) and the single-pass form is what every SQL engine's
``replace()`` implements — which makes the tokenizer exactly
replicable in DuckDB for the driver's oracle cross-check, and
implementable as pure JVM expressions on the Spark side (no Python
in the hot path; the whole plan stays in whole-stage codegen).

Pipeline (identical on all three implementations — Spark SQL,
DuckDB oracle, pure Python):

1. pretokenize: ``[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]`` (the engine's
   GPT-2-ish pretoken regex, already oracle-verified in
   ``token_counts``),
2. join pretokens with ``\\x1e`` (a char absent from every merge
   pair, so merges can never cross a pretoken boundary),
3. space-separate every character (trailing-space symbol form:
   ``hello`` → ``h e l l o ``),
4. apply each merge ``(x, y)`` in rank order as one
   ``replace("x y ", "xy ")`` pass,
5. token count = number of remaining symbols, minus the boundary
   markers.
"""

from __future__ import annotations

from functools import lru_cache, reduce

import re

from pyspark.sql import Column, functions as F

# explicit whitespace class, NOT \s: \s differs per engine (Java
# includes \x0b, RE2/DuckDB does not, Python adds \x1c-\x1f/\xa0/…),
# so a \s here would make the Spark/DuckDB/Python triple diverge on
# control-char text (ADVICE r2).  This exact set is what Java \s
# matches, spelled portably.
WHITESPACE_CLASS = " \\t\\n\\r\\f\\x0b"
PRETOKEN_RE = rf"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9{WHITESPACE_CLASS}]"
_PRETOKEN_C = re.compile(PRETOKEN_RE)

# pretoken boundary marker: never part of a merge pair, so merges
# can't bridge two pretokens when the text is processed as one string
BOUNDARY = "\x1e"

# Embedded mini merge table (~60 ranks over common English units).
# Invariant: a pair's sides are single chars or outputs of EARLIER
# merges — the topological consistency every learned BPE vocab has.
MERGES: list[tuple[str, str]] = [
    ("t", "h"), ("i", "n"), ("a", "n"), ("o", "n"), ("r", "e"),
    ("e", "r"), ("e", "d"), ("e", "s"), ("o", "r"), ("e", "n"),
    ("a", "t"), ("i", "t"), ("i", "s"), ("o", "u"), ("a", "r"),
    ("s", "t"), ("l", "e"), ("o", "f"), ("a", "l"), ("o", "m"),
    ("i", "c"), ("a", "s"), ("i", "l"), ("e", "t"), ("u", "r"),
    ("o", "l"), ("l", "y"), ("a", "m"), ("u", "n"), ("o", "w"),
    ("e", "x"), ("c", "h"), ("s", "h"), ("w", "h"), ("p", "r"),
    ("p", "l"), ("d", "e"), ("b", "e"), ("h", "a"), ("h", "e"),
    ("w", "e"), ("m", "e"), ("n", "o"), ("s", "e"), ("t", "o"),
    ("th", "e"), ("an", "d"), ("in", "g"), ("th", "is"), ("th", "at"),
    ("er", "e"), ("or", "e"), ("en", "t"), ("at", "e"), ("es", "s"),
    ("it", "y"), ("ou", "r"), ("re", "s"), ("c", "on"), ("c", "om"),
    ("the", "re"), ("st", "r"), ("pr", "o"), ("al", "l"), ("is", "h"),
]


# ---- corpus-driven merge learning -------------------------------------------

def learn_bpe(
    df,
    n_merges: int = 64,
    top_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn a merge table FROM the corpus (Sennrich et al. 2016).

    Scale split: Spark does the corpus-sized work — pretokenize,
    explode, one groupBy to the word-frequency table, top-V truncation
    (classic practice: learning on the most frequent V word types
    loses nothing that matters at 64-4096 merges) — and the driver
    runs the classic pair-count merge loop on that tiny dict.  The
    returned list plugs into :func:`bpe_token_count_col` /
    :func:`oracle_sql_expr` / :func:`encode_pretoken` via ``merges=``.
    """
    from collections import Counter

    from pyspark.sql import functions as F

    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(PRETOKEN_RE), 0)
            ).alias("w")
        )
        .filter(F.col("w") != BOUNDARY)  # reserved char, see encode()
        .groupBy("w")
        .count()
        .orderBy(F.desc("count"), F.asc("w"))
        .limit(top_words)
        .collect()
    )
    vocab = {tuple(r["w"]): int(r["count"]) for r in words}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += cnt
        if not pair_counts:
            break
        # deterministic: max count, ties by pair lexicographic
        (x, y), _cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((x, y))
        merged = x + y
        new_vocab = {}
        for syms, cnt in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


# ---- pure-Python reference (tests + the stats job's Python stage) ----------

@lru_cache(maxsize=262144)
def _encode_cached(pretoken: str, merges: tuple) -> tuple[str, ...]:
    s = "".join(c + " " for c in pretoken)
    for x, y in merges:
        pat = f"{x} {y} "
        if pat in s:
            s = s.replace(pat, f"{x}{y} ")
    return tuple(s.split(" ")[:-1])


def encode_pretoken(pretoken: str, merges=None) -> tuple[str, ...]:
    """BPE symbol sequence for one pretoken (cached — crawl text
    repeats words heavily)."""
    return _encode_cached(pretoken, tuple(merges) if merges is not None else tuple(MERGES))


def encode(text: str, merges=None) -> list[str]:
    """BPE token sequence for ``text``.

    BOUNDARY (\\x1e) is RESERVED: occurrences in the input are
    dropped, on all three paths — the JVM/SQL forms can't distinguish
    an input \\x1e symbol from the pretoken marker, so the Python
    reference adopts the same rule (it can only ever be a standalone
    single-char pretoken: alnum runs can't contain it)."""
    m_t = tuple(merges) if merges is not None else tuple(MERGES)
    out: list[str] = []
    for m in _PRETOKEN_C.finditer(text or ""):
        if m.group(0) != BOUNDARY:
            out.extend(_encode_cached(m.group(0), m_t))
    return out


def count_tokens(text: str, merges=None) -> int:
    m_t = tuple(merges) if merges is not None else tuple(MERGES)
    return sum(
        len(_encode_cached(m.group(0), m_t))
        for m in _PRETOKEN_C.finditer(text or "")
        if m.group(0) != BOUNDARY
    )


# ---- Spark expression (JVM-side, whole-stage codegen) -----------------------

def bpe_token_count_col(text: Column, merges: list[tuple[str, str]] | None = None) -> Column:
    """Token count as a pure built-in-function expression: pretoken
    regex → boundary join → char spacing → one ``replace`` per merge
    → symbol count.  No UDF, no Python worker."""
    toks = F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0)
    joined = F.array_join(toks, BOUNDARY)
    spaced = F.regexp_replace(joined, "(.)", "$1 ")
    merged = reduce(
        lambda col, m: F.replace(col, F.lit(f"{m[0]} {m[1]} "), F.lit(f"{m[0]}{m[1]} ")),
        merges if merges is not None else MERGES,
        spaced,
    )
    symbols = F.filter(
        F.split(F.trim(merged), " "),
        lambda s: (s != "") & (s != BOUNDARY),
    )
    return F.size(symbols).cast("long")


def oracle_sql_expr(text_expr: str, merges: list[tuple[str, str]] | None = None) -> str:
    """The identical computation as a DuckDB SQL expression (the
    driver's oracle side) — same pretoken regex, same boundary char,
    same per-rank single-pass replaces."""
    # coalesce: DuckDB array_to_string([]) is NULL (Spark's is '')
    merged = (
        f"regexp_replace(coalesce(array_to_string(regexp_extract_all({text_expr}, "
        f"'{PRETOKEN_RE}'), chr(30)), ''), '(.)', '\\1 ', 'g')"
    )
    for x, y in (merges if merges is not None else MERGES):
        merged = f"replace({merged}, '{x} {y} ', '{x}{y} ')"
    return (
        "CAST(len(list_filter(string_split(trim(" + merged + "), ' '), "
        "s -> s != '' AND s != chr(30))) AS BIGINT)"
    )
