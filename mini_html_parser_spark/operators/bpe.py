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

PRETOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
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


# ---- pure-Python reference (tests + the stats job's Python stage) ----------

@lru_cache(maxsize=65536)
def encode_pretoken(pretoken: str) -> tuple[str, ...]:
    """BPE symbol sequence for one pretoken (cached — crawl text
    repeats words heavily)."""
    s = "".join(c + " " for c in pretoken)
    for x, y in MERGES:
        pat = f"{x} {y} "
        if pat in s:
            s = s.replace(pat, f"{x}{y} ")
    return tuple(s.split(" ")[:-1])


def encode(text: str) -> list[str]:
    """BPE token sequence for ``text``."""
    out: list[str] = []
    for m in _PRETOKEN_C.finditer(text or ""):
        out.extend(encode_pretoken(m.group(0)))
    return out


def count_tokens(text: str) -> int:
    return sum(len(encode_pretoken(m.group(0))) for m in _PRETOKEN_C.finditer(text or ""))


# ---- Spark expression (JVM-side, whole-stage codegen) -----------------------

def bpe_token_count_col(text: Column) -> Column:
    """Token count as a pure built-in-function expression: pretoken
    regex → boundary join → char spacing → one ``replace`` per merge
    → symbol count.  No UDF, no Python worker."""
    toks = F.regexp_extract_all(text, F.lit(PRETOKEN_RE), 0)
    joined = F.array_join(toks, BOUNDARY)
    spaced = F.regexp_replace(joined, "(.)", "$1 ")
    merged = reduce(
        lambda col, m: F.replace(col, F.lit(f"{m[0]} {m[1]} "), F.lit(f"{m[0]}{m[1]} ")),
        MERGES,
        spaced,
    )
    symbols = F.filter(
        F.split(F.trim(merged), " "),
        lambda s: (s != "") & (s != BOUNDARY),
    )
    return F.size(symbols).cast("long")


def oracle_sql_expr(text_expr: str) -> str:
    """The identical computation as a DuckDB SQL expression (the
    driver's oracle side) — same pretoken regex, same boundary char,
    same per-rank single-pass replaces."""
    # coalesce: DuckDB array_to_string([]) is NULL (Spark's is '')
    merged = (
        f"regexp_replace(coalesce(array_to_string(regexp_extract_all({text_expr}, "
        f"'{PRETOKEN_RE}'), chr(30)), ''), '(.)', '\\1 ', 'g')"
    )
    for x, y in MERGES:
        merged = f"replace({merged}, '{x} {y} ', '{x}{y} ')"
    return (
        "CAST(len(list_filter(string_split(trim(" + merged + "), ' '), "
        "s -> s != '' AND s != chr(30))) AS BIGINT)"
    )
