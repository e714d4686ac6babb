"""Cluster job entry point: the north_rule launch shape end-to-end.

    spark-submit --master <yarn|k8s://...> \
        --py-files dist/goffish_v3_spark.zip \
        tools/run_pagerank_job.py \
        --repos  <parquet/Iceberg path: repo,path,commit,lang,content> \
        --output <scores parquet path> \
        --checkpoint-dir <DFS path>  [--resume --run-id <id>] \
        [--iterations 20 | --eps 1e-3] [--blocks unused-for-df-engine]

Reads the source-code repository table, derives the link graph (per-row
sha256(content) preserved — sources/ingest.py), runs PageRank with the
checkpoint store + per-partition lineage metrics ON (resumable
mid-iteration), and writes ``(repo, path, rank)``. No master is set in code:
whatever spark-submit provides wins (session.get_spark).

Also accepts a pre-built edge table (--edges src,dst parquet) to skip ingest.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--repos", help="repos table path (repo,path,commit,lang,content)")
    src.add_argument("--edges", help="pre-built edge table path (src,dst)")
    ap.add_argument("--output", required=True, help="scores output parquet path")
    ap.add_argument("--iterations", type=int, default=None,
                    help="fixed superstep count (omit to run the ε-gate)")
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="state store root (DFS on a cluster); enables resume")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    from goffish_v3_spark.operators.pagerank import pagerank_with_info
    from goffish_v3_spark.session import get_spark

    spark = get_spark(app_name="goffish-pagerank")
    if args.repos:
        from goffish_v3_spark.sources.ingest import ingest

        graph = ingest(spark.read.parquet(args.repos))
        edges, vertices = graph.edges, graph.vertices
    else:
        edges = spark.read.parquet(args.edges).select("src", "dst")
        vertices = None

    scores, info = pagerank_with_info(
        spark,
        edges,
        eps=args.eps,
        fixed_iterations=args.iterations,
        checkpoint_dir=args.checkpoint_dir,
        run_id=args.run_id,
        resume=args.resume,
        partition_metrics=args.checkpoint_dir is not None,
    )
    if vertices is not None:
        scores = scores.join(vertices, "vid").select("repo", "path", "rank")
    scores.write.mode("overwrite").parquet(args.output)
    print(
        f"run_id={info.run_id} supersteps={info.supersteps} "
        f"converged={info.converged} wall_s={info.wall_s:.1f}"
    )


if __name__ == "__main__":
    main()
