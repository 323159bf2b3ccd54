"""GPT-2 merge-table import/validate/export CLI (round 6, VERDICT r5
stretch #8) — the one-command swap-in for the public 50k merges.txt.

    python jobs/vocab_tool.py validate /path/to/merges.txt
    python jobs/vocab_tool.py import   /path/to/merges.txt --install DIR
    python jobs/vocab_tool.py export   /path/to/out.txt

``validate`` parses the file and checks table INTEGRITY:

- every merge side must be FORMABLE — a single byte symbol from
  ``bytes_to_unicode()`` or the product of SOME pair in the table (a
  merges file with an unproducible side has lost a line: every later
  rank is shifted and the tokenization silently diverges).  Strict
  earlier-rank ordering is NOT required — encoding applies merges by
  priority, not sequentially, so an out-of-order side is legal (the
  embedded illustrative table has two) — but since sequentially-
  learned tables (including the released GPT-2 file) always satisfy
  it, violations are reported as ``rank_order_warnings``;
- no duplicate pair (a duplicate never fires — same corruption class);
- rank-count report vs the released table's 50,000 (a warning, not an
  error — corpus-learned exports are any size);
- bijection spot-check: ``gpt2_decode(gpt2_encode(s)) == s`` for a
  sample covering every pretokenizer branch (letters, contractions,
  numbers, symbols, exotic whitespace, non-ASCII bytes).

``import`` = validate + copy the file into DIR and print the exact
environment line (``SPARK_GRAFT_GPT2_MERGES=…``) that makes it the
engine default (``gpt2_bpe.default_merges``; the table is read once
on the driver and shipped to executors inside UDF closures, so no
``--files`` distribution is needed).  ``export`` writes the currently
configured default table (env-installed or embedded illustrative) in
the standard format.

Every command prints one JSON report line (the jobs/ contract).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GPT2_RELEASED_RANKS = 50_000

# one probe per pretokenizer branch (letters, contraction, number,
# symbol run, space-backtrack, exotic whitespace, non-ASCII bytes)
_ROUNDTRIP_PROBES = [
    "hello world",
    "it's DON'T",
    "abc 12345 x9",
    "a!!b??  c",
    " leading and  double  spaces ",
    "tab\tnl\nnbsp ls ",
    "naïve — résumé 中文 🙂",
    "",
]


def validate_table(path: str) -> dict:
    from mini_html_parser_spark.operators.gpt2_bpe import (
        bytes_to_unicode,
        gpt2_decode,
        gpt2_encode,
        load_gpt2_merges,
    )

    merges = load_gpt2_merges(path)
    report: dict = {"path": path, "ranks": len(merges), "errors": []}

    byte_symbols = set(bytes_to_unicode().values())
    products = {x + y for x, y in merges}
    producible = byte_symbols | products
    seen_pairs = set()
    formed_so_far = set(byte_symbols)
    rank_order_warnings = []
    for rank, (x, y) in enumerate(merges):
        if (x, y) in seen_pairs:
            report["errors"].append(
                f"rank {rank}: duplicate pair {(x, y)!r} (never fires)"
            )
        seen_pairs.add((x, y))
        for side in (x, y):
            if side not in producible:
                report["errors"].append(
                    f"rank {rank}: side {side!r} is neither a byte "
                    "symbol nor the product of any pair in the table "
                    "(a lost/garbled line upstream?)"
                )
                break
            if side not in formed_so_far:
                rank_order_warnings.append(
                    f"rank {rank}: side {side!r} is only produced by a "
                    "LATER rank (legal at encode time; sequentially-"
                    "learned tables like the released file never do "
                    "this)"
                )
        formed_so_far.add(x + y)
    report["rank_order_warnings"] = rank_order_warnings

    # bijection spot-checks (byte-level BPE must round-trip ANY text)
    roundtrip_failures = 0
    if not report["errors"]:
        for probe in _ROUNDTRIP_PROBES:
            if gpt2_decode(gpt2_encode(probe, merges)) != probe:
                roundtrip_failures += 1
                report["errors"].append(
                    f"round-trip failed for probe {probe!r}"
                )
    report["roundtrip_probes"] = len(_ROUNDTRIP_PROBES)
    report["roundtrip_failures"] = roundtrip_failures
    report["released_rank_count"] = len(merges) == GPT2_RELEASED_RANKS
    if not report["released_rank_count"]:
        report["note"] = (
            f"rank count {len(merges)} != released {GPT2_RELEASED_RANKS} "
            "(fine for corpus-learned tables; the public GPT-2 file has "
            "exactly 50000)"
        )
    report["valid"] = not report["errors"]
    return report


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["validate", "import", "export"])
    p.add_argument("path", help="merges.txt to read (validate/import) "
                                "or write (export)")
    p.add_argument("--install", metavar="DIR", default=None,
                   help="import: copy the validated file into DIR and "
                        "print the env line that makes it the engine "
                        "default")
    args = p.parse_args(argv)

    if args.command == "export":
        from mini_html_parser_spark.operators.gpt2_bpe import (
            default_merges,
            save_gpt2_merges,
        )

        table = default_merges()
        save_gpt2_merges(table, args.path)
        print(json.dumps({"exported": args.path, "ranks": len(table)}))
        return 0

    report = validate_table(args.path)
    if args.command == "import":
        if not report["valid"]:
            print(json.dumps(report))
            return 1
        from mini_html_parser_spark.operators.gpt2_bpe import MERGES_ENV

        if args.install:
            os.makedirs(args.install, exist_ok=True)
            dest = os.path.join(args.install, "merges.txt")
            shutil.copyfile(args.path, dest)
        else:
            dest = os.path.abspath(args.path)
        report["installed"] = dest
        report["env"] = f"{MERGES_ENV}={dest}"
        report["activate"] = (
            f"export {MERGES_ENV}={dest}  # engine-wide default "
            "(driver-side read; UDF closures carry the table)"
        )
    print(json.dumps(report))
    return 0 if report["valid"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
