#!/usr/bin/env python
"""Strong-scaling (cores) sweep: the executor-parallelism study.

The 10x-data studies (PERFORMANCE.md rounds 6-9) answer "does the work
grow gracefully with data on fixed cores?". This sweep answers the
complementary 100 TB question: "does the work actually SPREAD across
cores?" — the round-9 media sweep found four queries whose decode stage
silently ran on ONE core, a failure mode invisible at any data scale
without a cores axis. A query whose time is flat from local[4] to
local[32] on a compute-dominated corpus is hiding a serialized stage.

Usage:
    python scripts/sweep_cores.py [sf_dir] [cores ...]

Runs each query in QUERIES at every cores level IN A FRESH JVM
(one subprocess per level — executor-thread pools, codegen caches and
shuffle state don't leak between levels), min-of-REPS after a warm-up,
noop sink (measuring the engine, not collect). Prints one JSON line:
{"sf_dir": ..., "levels": {"4": {query: sec, ...}, ...}}

The interesting corpus is a 10x-scaled one (see PERFORMANCE.md round
10 for the builder: per-copy char-rotation for documents, shifted
orderkeys for the facts, fixed dims) where compute dominates the
~0.3-0.5 s/query engine floor; at plain sf0.1 most of these queries
are floor-bound and the cores signal drowns.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

QUERIES = [
    "tpch_q1_pricing_summary",
    "tpch_q9_product_profit",
    "agg_frequent_itemset_pairs",
    "dedup_ngram_jaccard",
    "text_tfidf_top_terms",
    "simsearch_topk_bruteforce",
    "multimodal_image_ahash",
    "multimodal_jpeg_features",
]
if os.environ.get("SPARK_GRAFT_SWEEP_QUERIES"):
    QUERIES = os.environ["SPARK_GRAFT_SWEEP_QUERIES"].split(",")

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from git_etl_spark import registry
from git_etl_spark.session import get_spark

cores = {cores}
sf_dir = {sf_dir!r}
reps = {reps}
registry.load_all()
spark = get_spark(app_name=f"sweep-cores-{{cores}}", cpus=cores)
spark.sparkContext.setLogLevel("ERROR")

def run(name):
    t0 = time.perf_counter()
    registry.QUERIES[name](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0

# warm-up: JIT/codegen + the Python/Arrow worker pool
run("join_multiway_regional_revenue")
run("multimodal_decode_features")
out = {{}}
for name in {queries!r}:
    times = [run(name) for _ in range(reps)]
    out[name] = round(min(times), 3)
print("SWEEP_RESULT " + json.dumps(out))
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_cores"
    cores_levels = [int(c) for c in sys.argv[2:]] or [4, 8, 16, 32]
    reps = int(os.environ.get("SPARK_GRAFT_SWEEP_REPS", "3"))
    levels: dict[str, dict[str, float]] = {}
    for cores in cores_levels:
        child = _CHILD.format(
            repo=str(REPO), cores=cores, sf_dir=sf_dir, reps=reps,
            queries=QUERIES,
        )
        p = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True,
            timeout=3600,
        )
        line = next(
            (ln for ln in p.stdout.splitlines() if ln.startswith("SWEEP_RESULT ")),
            None,
        )
        if line is None:
            print(f"cores={cores} FAILED:\n{p.stderr[-2000:]}", file=sys.stderr)
            sys.exit(1)
        levels[str(cores)] = json.loads(line[len("SWEEP_RESULT "):])
        print(f"cores={cores} done: {levels[str(cores)]}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "levels": levels}))


if __name__ == "__main__":
    main()
