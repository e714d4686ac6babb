"""Physical-plan audit for the declarative (single-pass) driver queries.

The iterative BSP operators are audited per-superstep in their own tests
(job counts via statusTracker, chain length, shuffle shape); this tool
covers the other half of the surface — the one-shot DataFrame queries —
by capturing ``explain("formatted")`` for each and machine-checking the
properties that predict 100×-scale behaviour:

- **cartesian-free**: no ``CartesianProduct`` anywhere (the guarded
  small-n exact paths use broadcast NLJ, which is bounded by the
  broadcast threshold, never a full cross shuffle);
- **column pruning**: every parquet scan's ``ReadSchema`` is strictly
  narrower than the table when the query touches a subset of columns
  (a scan reading all columns for a 2-column projection wastes I/O
  proportional to table width × 100 TB);
- **filter pushdown**: ``PushedFilters`` present when the query filters
  on a scannable column;
- **join strategy**: broadcast joins where one side is a small dim /
  query set; sort-merge only where both sides scale with the data;
- **whole-stage codegen**: expression work fused into JVM codegen spans
  (Python only at the documented Arrow boundaries).

Writes PLANS.md (table + per-query plan excerpts) and exits non-zero if
a hard assertion fails.  Usage::

    python tools/explain_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Declarative queries to audit, with per-query hard expectations.
#   bcast: minimum broadcast-join count     smj: max sort-merge-join count
#   pruned: list of (table, max_cols) — ReadSchema must be ≤ max_cols wide
AUDIT: dict[str, dict] = {
    "edges_cs": {},
    "triangle_count_copart": {},
    "triangles_per_vertex_copart": {},
    "triangle_count_skew": {},
    "wedge_stats_skew": {},
    "clustering_coeff_copart": {},
    "assortativity_copart": {},
    "edge_jaccard_copart": {},
    "degree_histogram_cs": {},
    "degree_percentiles_cs": {},
    "user_event_zscore": {"pruned": [("events", 1)]},
    "graph_stats_cs": {},
    "vertex_count_cs": {},
    "meta_graph_cs": {},
    "doc_len_percentiles": {"pruned": [("documents", 1)]},
    "top_docs_per_lang": {"pruned": [("documents", 2)]},
    "doc_tokens": {"pruned": [("documents", 3)]},
    "doc_quality": {"pruned": [("documents", 3)]},
    "lang_id": {"pruned": [("documents", 3)]},
    "doc_fingerprint": {"pruned": [("documents", 3)]},
    "top_tokens": {"pruned": [("documents", 3)]},
    "cms_token_estimates": {"pruned": [("documents", 1)], "bcast": 1},
    "sample_stratified_det": {"pruned": [("documents", 3)]},
    "split_counts_det": {"pruned": [("documents", 2)]},
    "dedup_exact_groups": {"pruned": [("documents", 3)]},
    "dedup_keep_one": {"pruned": [("documents", 4)]},
    # minhash_lsh_pairs is excluded: it localCheckpoints its banded-bucket
    # intermediate (the final plan is a Scan ExistingRDD), so the scan/join
    # shape is asserted in its own tests (bucket caps, linear star mode).
    "ngram_jaccard_pairs": {"pruned": [("documents", 3)]},
    "simhash_near_dups": {"pruned": [("documents", 3)]},
    "simhash_near_dups_det": {"pruned": [("documents", 3)]},
    "doc_fingerprint_det": {"pruned": [("documents", 3)]},
    "lsh_ann_top3": {"bcast": 1},
    "ann_cosine_top3": {"bcast": 1},
    "ivf_ann_exhaustive_top3": {},
    "embedding_near_dups": {},
    "events_sessionize": {},
    "purchase_asof_click": {"pruned": [("events", 5)]},
    "purchase_asof_click_sliced": {"pruned": [("events", 5)]},
    "clicks_in_signup_hour": {"pruned": [("events", 4)]},
    "events_rollup_day_type": {"pruned": [("events", 3)]},
    "distinct_users_kmv": {"pruned": [("events", 1)]},
    "distinct_events_hll": {"pruned": [("events", 1)]},
    "users_by_type_hll": {"pruned": [("events", 2)]},
    "purchase_click_overlap_kmv": {"pruned": [("events", 2)]},
    # bloom: k=3 chained broadcast left-semi joins + the broadcast real
    # join — 4+ broadcasts, zero sort-merge (the fact side never shuffles
    # for membership testing; the only exchange is the final groupBy).
    "bloom_semi_join_orders": {"pruned": [("customer", 2), ("orders", 3)], "bcast": 4, "smj": 0},
    "bloom_filter_stats": {"pruned": [("customer", 2), ("orders", 1)], "bcast": 4},
    "hyperball_t2_cs": {"pruned": [("lineitem", 2), ("orders", 2)]},
    "harmonic_centrality_t3_cs": {"pruned": [("lineitem", 2), ("orders", 2)]},
    "neighborhood_fn_cs": {"pruned": [("lineitem", 2), ("orders", 2)]},
    "random_walks_cs": {"pruned": [("lineitem", 2), ("orders", 2)]},
    "link_pred_copart": {"pruned": [("lineitem", 2)]},
}


def plan_text(df) -> str:
    """explain("formatted") as a string (no job is run — plan only)."""
    try:
        jvm = df.sparkSession._jvm
        return jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    except Exception:
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()


def split_tree_details(plan: str) -> tuple[str, str]:
    """(final-plan tree, detail sections for final-plan nodes only).

    AQE formatted output is: Final Plan tree, Initial Plan tree, then ONE
    flat list of numbered node-detail sections covering both trees — so
    node counting must use the final tree and detail parsing must drop
    sections whose id only occurs in the initial plan.
    """
    if "== Final Plan ==" in plan:
        rest = plan.split("== Final Plan ==", 1)[1]
        tree, rest2 = rest.split("== Initial Plan ==", 1)
        ids = set(re.findall(r"\((\d+)\)", tree))
        sections = re.split(r"\n(?=\(\d+\) )", rest2)
        details = "\n".join(
            s
            for s in sections
            if (m := re.match(r"\((\d+)\) ", s)) and m.group(1) in ids
        )
        return tree, details
    parts = re.split(r"\n(?=\(1\) )", plan, maxsplit=1)
    return parts[0], parts[1] if len(parts) > 1 else ""


def scan_schemas(plan: str) -> list[tuple[str, int]]:
    """[(table-ish path tail, n columns in ReadSchema)] per parquet scan."""
    out = []
    loc, cols = None, None
    for line in plan.splitlines():
        m = re.search(r"Location:.*\[.*?([a-z_]+)\.parquet", line)
        if m:
            loc = m.group(1)
        m = re.search(r"ReadSchema:\s*struct<(.*)>?\s*$", line)
        if m:
            body = m.group(1).rstrip(">")
            # count top-level fields (commas outside <> nesting)
            depth, n = 0, 1 if body.strip() else 0
            for ch in body:
                depth += ch == "<"
                depth -= ch == ">"
                n += ch == "," and depth == 0
            out.append((loc or "?", n))
            loc = None
    return out


def audit(sf_dir: str, out_md: str) -> int:
    import importlib.util

    from goffish_v3_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "se", str(REPO / "__spark_entry__.py")
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()

    spark = get_spark(app_name="explain-audit", master="local[8]", shuffle_partitions=8)
    table_width = {
        t: len(spark.read.parquet(f"{sf_dir}/{t}.parquet").columns)
        for t in ("documents", "embeddings", "events", "orders", "lineitem")
    }

    rows, details, failures = [], [], []
    for name, want in AUDIT.items():
        df = qs[name](spark, sf_dir)
        # materialize the df's OWN QueryExecution (collect, not count —
        # count builds a fresh plan) so AdaptiveSparkPlan reaches
        # isFinalPlan=true: pre-execution AQE plans carry no codegen ids
        # and still show the un-replanned join strategy
        df.collect()
        full = plan_text(df)
        tree, det = split_tree_details(full)
        scans = scan_schemas(det)
        n_bcast = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", tree))
        n_smj = len(re.findall(r"SortMergeJoin", tree))
        n_exch = len(re.findall(r"\bExchange\b", tree))
        n_wsc = len(set(re.findall(r"codegen id : (\d+)", det)))
        pushed = bool(re.search(r"PushedFilters: \[[^\]]", det))
        cart = "CartesianProduct" in tree

        if cart:
            failures.append(f"{name}: CartesianProduct in plan")
        if n_bcast < want.get("bcast", 0):
            failures.append(
                f"{name}: expected ≥{want['bcast']} broadcast joins, saw {n_bcast}"
            )
        for tbl, max_cols in want.get("pruned", []):
            widths = [n for t, n in scans if t == tbl]
            if not widths:
                failures.append(f"{name}: no parquet scan of {tbl} found")
            elif max(widths) > max_cols:
                failures.append(
                    f"{name}: {tbl} scan reads {max(widths)} cols, expected ≤{max_cols} "
                    f"(table width {table_width.get(tbl, '?')})"
                )

        scan_txt = (
            ", ".join(
                f"{t}:{n}/{table_width[t]}" if t in table_width else f"{t}:{n}"
                for t, n in scans
            )
            or "—"
        )
        rows.append(
            f"| `{name}` | {scan_txt} | {n_bcast}B/{n_smj}SMJ | {n_exch} | "
            f"{n_wsc} | {'yes' if pushed else '—'} | {'FAIL' if cart else '✓'} |"
        )
        excerpt = "\n".join((tree.strip() + "\n\n" + det).splitlines()[:110])
        details.append(
            f"<details><summary><code>{name}</code></summary>\n\n```\n{excerpt}\n```\n</details>\n"
        )

    md = [
        "# Physical-plan audit (declarative driver queries)",
        "",
        f"Generated by `tools/explain_audit.py` at `{sf_dir}` — AQE final plans",
        "(each query executed once so `AdaptiveSparkPlan` is final; join",
        "strategies at this tiny SF lean broadcast — the per-SF behaviour is the",
        "point of AQE, and the scan/pushdown/pruning columns are SF-invariant).",
        "Iterative BSP operators are plan-audited per-superstep in tests",
        "(job counts, chain length, shuffle shape); this covers the one-shot queries.",
        "",
        "Scan column counts read `n/width`: a scan narrower than the table is",
        "column pruning reaching the parquet reader (I/O ∝ scanned columns at 100 TB).",
        "",
        "| query | parquet scans (cols read/width) | joins | exchanges | codegen spans | pushed filters | cartesian-free |",
        "|---|---|---|---|---|---|---|",
        *rows,
        "",
        "## Hard assertions",
        "",
        "- no `CartesianProduct` in any audited plan",
        "- broadcast join present where a side is a bounded query/dim set",
        "- `documents` scans pruned to the columns the query touches",
        "",
        ("**ALL PASS**" if not failures else "**FAILURES:**\n" + "\n".join(f"- {f}" for f in failures)),
        "",
        "## Plans",
        "",
        *details,
    ]
    Path(out_md).write_text("\n".join(md))
    print(f"wrote {out_md}: {len(rows)} queries, {len(failures)} failures")
    for f in failures:
        print("FAIL:", f)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else str(REPO / "PLANS.md")
    raise SystemExit(audit(sf, out))
