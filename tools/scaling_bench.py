"""Scaling-efficiency evidence (BASELINE.json north_rule).

The rule's two-cluster-size criterion (N → 4N executors, efficiency
≥ 0.8) cannot use a real cluster in this sandbox, so per the driver
instructions it is evidenced by running the SAME extraction job on the
SAME deterministic input at two parallelism levels (default local[8]
vs local[32]) and reporting docs/sec at both plus

    efficiency = (T_N / T_4N) / 4  =  throughput_4N / (4 * throughput_N)

Each run happens in a fresh subprocess (one JVM per master setting).

Usage: python tools/scaling_bench.py [n_docs]      # orchestrator
       python tools/scaling_bench.py --worker CORES N_DOCS   # one run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(cores: int, n_docs: int) -> None:
    import time

    from pyspark.sql import functions as F

    from mini_html_parser_spark.datagen import generate_documents
    from mini_html_parser_spark.operators.extract import extract_documents
    from mini_html_parser_spark.pipeline import build_session, repartition_for_extraction

    spark = build_session(master=f"local[{cores}]", shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = generate_documents(spark, n_docs, partitions=cores * 4)
    salted = repartition_for_extraction(docs, cores)
    ext = extract_documents(salted, "boilerplate_strip")
    agg = ext.select(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_spans").alias("spans"),
        F.sum("n_chars").alias("chars"),
    )
    # warm-up pass (JIT + python worker spin-up), then the measured pass
    agg.collect()
    t0 = time.perf_counter()
    row = agg.collect()[0]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "cores": cores,
        "n_docs": int(row["docs"]),
        "seconds": round(dt, 3),
        "docs_per_sec": round(row["docs"] / dt, 2),
        "mb_per_sec": round(row["chars"] / 1e6 / dt, 2),
        "spans": int(row["spans"]),
    }))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    lo = int(os.environ.get("SCALE_N", "8"))
    hi = int(os.environ.get("SCALE_4N", "32"))
    results = {}
    for cores in (lo, hi):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cores), str(n_docs)],
            capture_output=True, text=True, check=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line)
    ratio = hi / lo
    eff = results[hi]["docs_per_sec"] / (ratio * results[lo]["docs_per_sec"])
    print(json.dumps({
        "scaling": f"local[{lo}] -> local[{hi}]",
        "docs_per_sec_N": results[lo]["docs_per_sec"],
        "docs_per_sec_4N": results[hi]["docs_per_sec"],
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }))


if __name__ == "__main__":
    main()
