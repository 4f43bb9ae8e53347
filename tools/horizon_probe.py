"""Deep-horizon probe for the incremental LSH path: 50 arrival batches
through the ON-DISK state loop (streaming/neardup_ingest.process_batch),
so what grows is what grows in production — index rows AND parquet file
count.

The 6-batch probe (tools/incremental_probe.py) proved per-batch COMPUTE
is flat vs index growth; this one probes the part that probe could not
see: append-only parquet state gains ~one file set per batch, and at a
50x horizon per-batch wall-clock is dominated by file listing/footer
reads unless the state is periodically compacted. Run both arms:

    python tools/horizon_probe.py 50 off   # append-only, no compaction
    python tools/horizon_probe.py 50 10    # compact every 10 batches

Appends a comparison table to docs/INCREMENTAL.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flinkstreametl_spark.session import get_spark  # noqa: E402
from flinkstreametl_spark.sources.parquet import load_table  # noqa: E402
from flinkstreametl_spark.streaming.neardup_ingest import (  # noqa: E402
    INDEX_SUBDIR,
    process_batch,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "INCREMENTAL.md"
)


def _n_files(path: str) -> int:
    if not os.path.isdir(path):
        return 0
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def run_arm(spark, docs, n_batches: int, compact_every: int | None) -> list[tuple]:
    state_dir = tempfile.mkdtemp(prefix=f"horizon_{compact_every or 'off'}_")
    rows = []
    try:
        for i in range(n_batches):
            batch = docs.filter(F.col("doc_id") % n_batches == i).localCheckpoint()
            t0 = time.perf_counter()
            process_batch(
                spark, batch, state_dir, batch_id=i, compact_every=compact_every
            )
            dt = time.perf_counter() - t0
            nf = _n_files(os.path.join(state_dir, INDEX_SUBDIR))
            rows.append((i, dt, nf))
            if i % 10 == 9:
                print(f"#   batch {i}: {dt:.2f}s, {nf} index files", file=sys.stderr)
    finally:
        shutil.rmtree(state_dir, ignore_errors=True)
    return rows


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    arg = sys.argv[2] if len(sys.argv) > 2 else "both"
    spark = get_spark("horizon-probe")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")

    # warmup
    w = tempfile.mkdtemp(prefix="horizon_warm_")
    process_batch(spark, docs.limit(40), w, compact_every=None)
    shutil.rmtree(w, ignore_errors=True)

    arms: dict[str, list[tuple]] = {}
    if arg in ("both", "off"):
        print("# arm: no compaction", file=sys.stderr)
        arms["off"] = run_arm(spark, docs, n_batches, None)
    if arg not in ("off",):
        every = 10 if arg == "both" else int(arg)
        print(f"# arm: compact every {every}", file=sys.stderr)
        arms[f"every{every}"] = run_arm(spark, docs, n_batches, every)

    def tenth_means(rows):
        out = []
        for d in range(0, len(rows), 10):
            chunk = rows[d : d + 10]
            out.append(
                (
                    f"{d}-{d + len(chunk) - 1}",
                    sum(r[1] for r in chunk) / len(chunk),
                    chunk[-1][2],
                )
            )
        return out

    lines = [
        "",
        "## Deep-horizon probe: 50 batches, on-disk state, file-count effect",
        "",
        f"`python tools/horizon_probe.py {n_batches}` at {SF_DIR} on local[32]:",
        "same arrival stream through the PRODUCTION loop",
        "(`streaming/neardup_ingest.process_batch`, parquet state per batch),",
        "with and without periodic compaction. Mean per-batch wall-clock per",
        "decade of batches, plus the index file count at the decade's end:",
        "",
        "| batches | "
        + " | ".join(f"{name}: mean s (files)" for name in arms)
        + " |",
        "|---|" + "---|" * len(arms),
    ]
    decades = {name: tenth_means(rows) for name, rows in arms.items()}
    n_dec = max(len(v) for v in decades.values())
    for d in range(n_dec):
        cells = []
        label = ""
        for name in arms:
            lab, mean, nf = decades[name][d]
            label = lab
            cells.append(f"{mean:.2f} ({nf})")
        lines.append("| " + " | ".join([label, *cells]) + " |")
    for name, rows in arms.items():
        first = sum(r[1] for r in rows[:10]) / 10
        last = sum(r[1] for r in rows[-10:]) / 10
        lines.append("")
        lines.append(
            f"Arm `{name}`: last-decade/first-decade mean ratio "
            f"**{last / first:.2f}** ({rows[-1][2]} index files at the end)."
        )
    with open(OUT, "a") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"appended to {OUT}")


if __name__ == "__main__":
    main()
