"""Benchmark entry (driver contract).

Runs the headline workload at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", plus informative extras (docs/sec throughput of
the extraction stages — the BASELINE.json metric)}.

The extraction corpus is the deterministic skewed interleaved corpus
from datagen (FIXTURES.md profile: 1% giant docs up to 2 MB) scaled by
sf, so the benchmark exercises the salting/long-tail path, not just
tiny uniform rows.  Scaling-efficiency evidence (N vs 4N cores) is
produced by tools/scaling_bench.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# sf0.1 ≈ 600k lineitem rows; extraction corpus sized to keep the
# whole bench in low single-digit minutes while still carrying a
# giant-doc tail (1% at 0.5–2 MB)
N_SYNTH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "3000"))


def main() -> None:
    from pyspark.sql import functions as F

    from mini_html_parser_spark.datagen import generate_documents
    from mini_html_parser_spark.operators.extract import extract_documents, explode_spans
    from mini_html_parser_spark.operators import dedup, similarity, stats
    from mini_html_parser_spark.pipeline import build_session, repartition_for_extraction
    from mini_html_parser_spark.queries import (
        q_extract_flagship,
        q_join_broadcast_revenue,
        q_agg_median_by_lang,
        q_dedup_ngram_jaccard,
        q_similarity_bruteforce,
    )

    spark = build_session(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # 1) skewed interleaved corpus end-to-end extraction (the headline)
    docs = generate_documents(spark, N_SYNTH_DOCS, partitions=CPUS * 4)
    salted = repartition_for_extraction(docs, CPUS)
    ext = extract_documents(salted, "boilerplate_strip")
    agg = ext.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_spans").alias("spans"),
        F.sum(F.col("malformed").cast("long")).alias("malformed"),
        F.sum("n_chars").alias("chars"),
    )
    row = timed("extract_skewed_corpus", lambda: agg.collect()[0])
    extras["extract_docs_per_sec"] = round(row["docs"] / timings["extract_skewed_corpus"], 2)
    extras["extract_spans_emitted"] = int(row["spans"])
    extras["extract_malformed"] = int(row["malformed"])
    extras["extract_mb_per_sec"] = round(
        row["chars"] / 1e6 / timings["extract_skewed_corpus"], 2
    )

    # 2) extraction + stats over the sf documents table (oracle-shaped)
    timed("extract_flagship_sf", lambda: q_extract_flagship(spark, SF_DIR).count())

    # 3) two-level span statistics over real extraction output
    docs2 = generate_documents(spark, max(N_SYNTH_DOCS // 4, 200), partitions=CPUS * 2)
    ext2 = extract_documents(docs2, "boilerplate_strip")
    timed(
        "span_stats_two_level",
        lambda: stats.tag_stats(stats.span_stats(ext2)).count(),
    )

    # 4) dedup: minhash-LSH + jaccard verify at sf
    timed("dedup_ngram_jaccard", lambda: q_dedup_ngram_jaccard(spark, SF_DIR).count())

    # 5) similarity brute-force top-k at sf
    timed("similarity_topk", lambda: q_similarity_bruteforce(spark, SF_DIR).count())

    # 6) relational bundle at sf
    timed("agg_median_by_lang", lambda: q_agg_median_by_lang(spark, SF_DIR).count())
    timed("join_broadcast_revenue", lambda: q_join_broadcast_revenue(spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline workload wall-clock (extraction + stats + dedup + similarity + relational)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        "synth_docs": N_SYNTH_DOCS,
        **extras,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
