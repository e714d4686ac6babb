"""Two-parallelism scaling run — the sandbox proxy for the north_rule's
"N vs 4N executors with throughput scaling efficiency ≥ 0.8".

Runs the same PageRank job (fixed iterations, same input) at local[N] and
local[4N] in separate subprocesses (one JVM each — Spark local mode can't be
resized in-process), reports edges-traversed/sec at both plus
``efficiency = throughput(4N) / (4 × throughput(N))`` ... NOTE: in a single
shared-memory box the honest proxy for *cluster* scaling efficiency is
``throughput(4N)/throughput(N) / 4`` only if the small run actually uses N
cores; we also report the raw speedup. Results appended to BENCH/BASELINE.md.

Usage: python BENCH/run_scaling.py [n_small] [n_big] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["GOFFISH_REPO"])
cores = int(sys.argv[1]); sf = sys.argv[2]; iters = int(sys.argv[3])
from goffish_v3_spark.session import get_spark
from goffish_v3_spark.operators.pagerank import pagerank_with_info
from goffish_v3_spark.sources.tpch_graph import customer_supplier_edges
from goffish_v3_spark.sources.ingest import ingest
from goffish_v3_spark.sources.synthetic import generate_repos

n_repos = int(os.environ.get("SCALING_N_REPOS", "2000"))
files_per_repo = int(os.environ.get("SCALING_FILES_PER_REPO", "500"))
# IDENTICAL job at both parallelism levels: same shuffle partition count
# (sized for the big run), only the core count varies — the honest analogue
# of running one fixed cluster job at N vs 4N executors
shuffle_parts = int(os.environ.get("SCALING_SHUFFLE_PARTS", "64"))
spark = get_spark(app_name=f"scaling-{cores}", master=f"local[{cores}]",
                  shuffle_partitions=shuffle_parts)
edges_path = os.environ.get("SCALING_EDGES_PATH")
if edges_path:
    # pre-generated once (at full parallelism) so low-core children spend
    # their budget on the measured job, not on input synthesis
    edges = spark.read.parquet(edges_path).persist()
else:
    repos = generate_repos(spark, n_repos=n_repos, files_per_repo=files_per_repo, seed=42)
    edges = ingest(repos).edges.persist()
n_edges = edges.count()
# warmup superstep machinery + JIT
pagerank_with_info(spark, edges, fixed_iterations=2)
walls = []
for _ in range(int(os.environ.get("SCALING_RUNS", "3"))):
    t0 = time.monotonic()
    scores, info = pagerank_with_info(spark, edges, fixed_iterations=iters)
    scores.count()
    walls.append(time.monotonic() - t0)
walls.sort()
wall = walls[len(walls) // 2]  # median
print(json.dumps({"cores": cores, "edges": n_edges, "iters": iters,
                  "wall_s": round(wall, 3), "runs": [round(w, 3) for w in walls],
                  "eps": round(iters * n_edges / wall, 1)}))
"""


def run(cores: int, sf: str, iters: int) -> dict:
    env = dict(os.environ, GOFFISH_REPO=REPO)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), sf, str(iters)],
        capture_output=True,
        text=True,
        env=env,
        timeout=7200,
    )
    last = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not last:
        raise RuntimeError(f"child failed: {out.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    sf = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    iters = 10
    small = run(n_small, sf, iters)
    big = run(n_big, sf, iters)
    ratio = big["eps"] / small["eps"]
    efficiency = ratio / (n_big / n_small)
    report = {
        "small": small,
        "big": big,
        "speedup": round(ratio, 3),
        "efficiency": round(efficiency, 3),
        "sf": sf,
    }
    print(json.dumps(report))

    md = os.path.join(HERE, "BASELINE.md")
    stamp = datetime.now(timezone.utc).isoformat(timespec="seconds")
    lines = [
        f"\n## Scaling run {stamp}",
        "",
        f"Input: synthetic repos graph ({os.environ.get('SCALING_N_REPOS', '2000')}×"
        f"{os.environ.get('SCALING_FILES_PER_REPO', '500')} files, {small['edges']} edges), "
        f"PageRank ×{iters} fixed supersteps, sf aux dir `{sf}`.",
        "",
        "| cores | wall s | edges-traversed/sec |",
        "|---|---|---|",
        f"| {small['cores']} | {small['wall_s']} | {small['eps']:,} |",
        f"| {big['cores']} | {big['wall_s']} | {big['eps']:,} |",
        "",
        f"speedup {n_small}→{n_big} cores: **{report['speedup']}×**; "
        f"scaling efficiency = speedup/{n_big//n_small} = **{report['efficiency']}** "
        f"(north_rule gate: ≥ 0.8 on a real N→4N executor scale-out; "
        f"single-box core scaling under-reports this because shuffle disk and "
        f"memory bandwidth are shared).",
    ]
    with open(md, "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
