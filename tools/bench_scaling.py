"""Scaling-efficiency evidence for the north rule's two-cluster-size
criterion (BASELINE.json: "throughput scaling efficiency >= 0.8 between N
and 4N executors").

No real cluster exists in this sandbox, so — per the driver instruction —
we run the IDENTICAL extraction job on the IDENTICAL materialized input at
two local parallelism levels (default local[8] vs local[32]; same JVM
memory, same fixed input/shuffle partition counts so ONLY core count
varies) in fresh subprocesses, and report throughput at both plus

    efficiency = (rate_4N / rate_N) / (4N / N)

Appends a measured-results section to BENCH/BASELINE.md and prints one
JSON line.

Usage:  python tools/bench_scaling.py [--n 8] [--xn 32] [--scale bench]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PARTITIONS = 128  # >= 4 x max cores; identical for both runs


def child(cores: int, input_path: str) -> None:
    """One measured run in a fresh JVM: scan -> extract -> materialize."""
    from pyspark.sql import functions as F

    from ocr_gpu_services_spark.plans.extract_job import extract_pipeline
    from ocr_gpu_services_spark.session import get_spark
    from ocr_gpu_services_spark.sources.pages import read_pages

    spark = get_spark(app=f"scale-{cores}", cores=cores,
                      shuffle_partitions=PARTITIONS)
    pages = read_pages(spark, input_path)
    n_docs = pages.count()          # warm the scan metadata
    # warmup pass (untimed): spawns every Python worker (they persist via
    # spark.python.worker.reuse), loads the per-partition model state, and
    # JITs the JVM expression pipeline — we report STEADY-STATE throughput,
    # the regime a multi-hour 100 TB job actually runs in, not the one-off
    # process-spawn cost that a 9-second toy run is dominated by
    (extract_pipeline(pages.sample(0.08, seed=1))
     .select(F.count("*")).collect())
    t0 = time.time()
    out = (extract_pipeline(pages)
           .select(F.count("*").alias("n"),
                   F.sum(F.length("extracted_text")).alias("chars"),
                   F.sum("n_spans").alias("spans"))
           .collect()[0])
    wall = time.time() - t0
    assert out["n"] == n_docs
    print(json.dumps({"cores": cores, "docs": n_docs,
                      "wall_s": round(wall, 3),
                      "docs_per_sec": round(n_docs / wall, 2),
                      "chars": int(out["chars"])}))
    spark.stop()


def run_child(cores: int, input_path: str) -> dict:
    # CPU affinity makes the "cluster size" real: in local mode the Arrow
    # kernel runs in separate Python worker processes the OS would happily
    # schedule on ALL cores, so an un-pinned local[8] run silently uses up
    # to 16 cores and understates true 8-core -> 32-core scaling
    cmd = ["taskset", "-c", f"0-{cores - 1}",
           sys.executable, os.path.abspath(__file__),
           "--child", str(cores), "--input", input_path]
    p = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3600)
    if p.returncode != 0:
        raise RuntimeError(f"child cores={cores} failed:\n{p.stderr[-2000:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--input", default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--xn", type=int, default=32)
    ap.add_argument("--scale", default="bench")
    ap.add_argument("--repeats", type=int, default=2,
                    help="best-of repeats per level (JVM warmup noise)")
    args = ap.parse_args()

    if args.child is not None:
        child(args.child, args.input)
        return 0

    input_path = os.environ.get(
        "SPARK_GRAFT_PAGES_DIR", f"/tmp/spark_graft_pages_{args.scale}")
    if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
        from ocr_gpu_services_spark.session import get_spark
        from ocr_gpu_services_spark.sources.pages import write_synthetic_pages
        spark = get_spark(app="scale-gen", cores=args.xn)
        write_synthetic_pages(spark, args.scale, input_path,
                              partitions=PARTITIONS)
        spark.stop()

    results = {}
    for cores in (args.n, args.xn):
        best = None
        for _ in range(args.repeats):
            r = run_child(cores, input_path)
            if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
                best = r
        results[cores] = best
        print(f"  local[{cores}]: {best['docs_per_sec']} docs/s "
              f"({best['wall_s']}s over {best['docs']} docs)",
              file=sys.stderr)

    rn, rxn = results[args.n], results[args.xn]
    ratio = args.xn / args.n
    eff = (rxn["docs_per_sec"] / rn["docs_per_sec"]) / ratio
    summary = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": round(eff, 3),
        "pass": eff >= 0.8,
        "N_cores": args.n, "4N_cores": args.xn,
        "docs": rn["docs"], "input_partitions": PARTITIONS,
        "docs_per_sec_N": rn["docs_per_sec"],
        "docs_per_sec_4N": rxn["docs_per_sec"],
        "wall_s_N": rn["wall_s"], "wall_s_4N": rxn["wall_s"],
    }
    print(json.dumps(summary))

    bench_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(bench_md), exist_ok=True)
    header = not os.path.exists(bench_md)
    with open(bench_md, "a") as f:
        if header:
            f.write(
                "# BENCH/BASELINE.md — measured results\n\n"
                "North-rule two-cluster-size criterion, evidenced per the\n"
                "driver instruction by the identical job + identical input\n"
                "at two local parallelism levels (fresh JVM each; fixed\n"
                f"input partitions={PARTITIONS}, fixed shuffle partitions;\n"
                "only the core count differs). efficiency =\n"
                "(rate_4N/rate_N)/(4N/N).\n\n"
                "| docs | N | 4N | docs/s @N | docs/s @4N | efficiency |"
                " pass(>=0.8) |\n|---|---|---|---|---|---|---|\n")
        f.write(f"| {rn['docs']} | local[{args.n}] | local[{args.xn}] "
                f"| {rn['docs_per_sec']} | {rxn['docs_per_sec']} "
                f"| **{eff:.3f}** | {'YES' if eff >= 0.8 else 'NO'} |\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
