"""Regenerate SCALING.md: measured scale-up behavior of headline
queries across sf0.001 → sf0.01 → sf0.1 (100× input growth).

Usage: python scripts/scaling_curve.py

Methodology matches bench.py: noop-sink execution (no driver collect),
one untimed full warm-up pass per scale factor, then interleaved timed
passes taking the per-query min (host CPU-steal bursts land on
different queries each pass).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ["0.001", "0.01", "0.1", "1"]


def sf_dir_for(sf: str) -> str:
    """Driver-shipped scales live in /root/testdata; the sf1 step is
    self-generated (scripts/gen_testdata.py, same schemas) under the
    repo's gitignored .localdata/."""
    driver = f"/root/testdata/sf{sf}"
    if os.path.isdir(driver):
        return driver
    local = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", f"sf{sf}",
    )
    if os.path.isdir(local):
        return local
    raise SystemExit(
        f"missing sf{sf} corpus: run `python scripts/gen_testdata.py {sf}` first"
    )
QUERIES_SHOWN = [
    ("g1_pricing_summary", "lineitem"),
    ("j6_multiway_revenue", "lineitem"),
    ("a3_rmse_item_mean", "lineitem"),
    ("w1_topk_per_user", "orders"),
    ("q3_shipping_priority", "lineitem"),
    ("ev_sessionize", "events"),
    ("text_quality", "documents"),
    ("dedup_minhash_lsh", "documents"),
    ("ann_bruteforce_topk", "embeddings"),
    ("curation_pack", "documents"),
    ("ev_rollup_merge", "events"),
    ("text_repetition", "documents"),
    # round-5 continuation representatives
    ("text_span_dedup", "documents"),
    ("graph_pagerank", "lineitem"),
    ("fuzzy_match_suppliers", "supplier"),
    ("sketch_hll_distinct", "events"),
    ("ev_transitions", "events"),
    # round-5 fourth-continuation representatives
    ("ml_nb_confusion", "documents"),
    ("text_lm_perplexity", "documents"),
    ("text_html_extract", "documents"),
    ("ev_hopping_agg", "events"),
    ("dedup_keep_best", "documents"),
    # round-5 fifth-continuation representatives
    ("lex_trigram_search", "documents"),
    ("skyline_parts", "part"),
    ("ev_concurrency", "events"),
    ("agg_incremental_view", "orders"),
    ("j10_multitouch_attribution", "events"),
    ("sample_epoch_shuffle", "documents"),
]
PASSES = 2

HEADER = """# SCALING — measured scale-up behavior (auto-generated)

`python scripts/scaling_curve.py` regenerates this file.

Input grows 10× per step (sf0.001 → sf0.01 → sf0.1 → sf1); the table shows
wall time per query (noop sink, warm JVM, per-query min over
interleaved passes) and the time ratio of each 10× data step. How to
read the ratios:

- **ratio ≪ 10** at these scales means the query is still dominated by
  fixed per-query overhead (planning, task launch, codegen lookup) —
  the marginal cost of data is small, so scale-up headroom is large.
- **ratio ≈ 10** means execution is data-proportional already; at
  cluster scale this is the per-row cost that parallelizes across
  executors (all these plans shuffle only keys/aggregates, never
  payloads — see PLANS.md).
- **ratio > 10** would flag super-linear work (quadratic pair blowup,
  spill) — none is expected or observed; near-dup candidate joins are
  LSH-bucketed exactly to keep pair work linear in input.

Driver tables (rows at each sf): lineitem 6k/60k/600k, orders
1.5k/15k/150k, events 1k/10k/100k — 10× per step. documents is
500/500/5000 and embeddings 500/500/2000, so document/embedding
queries see NO data growth at step A (expect ≈1×) and 10×/4× at
step B. The sf1 step (step C) is self-generated with
`scripts/gen_testdata.py` (same schemas/distributions, seeded; the
driver ships no sf1): lineitem 6M, orders 1.5M, events 1M, documents
50k (10×), embeddings 20k (10×) — the first scale where shuffled data
work clearly dominates fixed overhead on local[32].

Step-A ratios BELOW 1.0 are an artifact of measurement order: sf0.001
is timed first, while the JVM still carries residual JIT/codegen cost
its single warm-up pass didn't fully absorb — i.e. at these sizes the
fixed overhead exceeds all data-dependent work. The load-bearing
numbers are steps B and C (fully warm; step C is the first where most
queries' shuffle/data work dominates). Measured step-C verdict (r6
regeneration): every ratio is SUB-linear — max 4.3× (ann_bruteforce's
10× embedding step); the two r5 step-C leaders both dropped after the
r6 hashed-gram rewrites (text_span_dedup 6.4× → 4.2× with sf1 down
37.4 → 10.2 s; text_repetition 7.8× → 4.1× with sf1 down 22.2 →
4.3 s); dedup_minhash_lsh's step C is now 0.8× (flat — the hot-bucket
cap bounds per-bucket work). No query shows the >10× super-linear
signature of quadratic blowup or spill. This table was recorded in a
window with visible CPU steal on the sf0.1 pass (several step-B
ratios ~2× above their bench-run counterparts — compare BASELINE.md's
same-day 23-query run); the cross-sf RATIOS, not the absolute
seconds, are the load-bearing numbers.
"""

# Static epilogue: the measured AQE skew proof (scripts/skew_proof.py,
# r6). Kept in the generator so regeneration preserves it; re-run the
# proof script to refresh the numbers.
SKEW_PROOF = """## AQE skew-join proof (Q13 slot, measured r6)

`python scripts/skew_proof.py` — a Zipf-skewed orders corpus at sf1
volume (15M rows, hottest custkey owns 30% — far past the ≥1% bar)
through the Q13-grade customer⋈orders join on local[32], skew-join
rewrite off vs on (best-of-3 interleaved):

| skewJoin | wall time | plan evidence |
|---|---|---|
| off | 3.01 s | one straggler task owns the hot partition |
| on | 1.63 s (**1.85×**) | `SortMergeJoin(skew=true)`, `AQEShuffleRead coalesced and skewed` |

Arming required `forceOptimizeSkewedJoin=true`: Q13 pipelines the join
into a per-custkey aggregate that reuses the join partitioning, so
splitting the hot partition inserts an exchange Spark vetoes by
default — worth it at real skew. Thresholds were lowered to CI bytes
(the 256 MB production default only changes WHEN the rewrite arms).
Two detection traps documented in the script: AQE measures skew in
post-compression BYTES (a constant hot join key lz4-compresses a 15×
row skew down to 1.3× in bytes), and Catalyst column-prunes payloads
no output consumes — both can silently disarm the rewrite on
synthetic corpora. The deterministic plan assertions live in
tests/test_skew_aqe.py; g14_custdist's LEFT OUTER shape — whose orders
side AQE cannot split without breaking no-match detection — relies on
partial aggregation absorbing the hot key map-side, also pinned there.

## Step D: sf3 evidence for the bucketed heavies (measured r6)

The 100 TB claim previously extrapolated from sf1; step D extends the
curve with a self-generated sf3 corpus (scripts/gen_testdata.py 3 —
lineitem 18M, documents 150k, embeddings 60k) for the three bucketed
heavies. Noop-sink min over interleaved warm passes, local[32]; the
×3 column is the time ratio for 3× data (sub-linear < 3.0):

| query | sf1 s | sf3 s | ×3 step D |
|---|---|---|---|
| dedup_minhash_lsh | 6.2 | 6.0 | 1.0× (banded LSH + hot-bucket cap: per-bucket work stays flat) |
| ann_lsh_topk | 0.9 | 1.0 | 1.1× (sign-bucketed; per-bucket candidates bounded) |
| curation_contamination | 12.7 | 24.2 | 1.9× (broadcast bench-gram set grows with the %97 sample; probe stream linear) |

Every step-D ratio is sub-linear — no quadratic tail appears at 3×
the largest prior scale. Step E (sf10, measured later the same round —
lineitem 60M, documents 500k, embeddings 200k, 1.9 GB) extends the
curve a full decade past sf1:

| query | sf1 s | sf3 s | sf10 s | ×10 (sf1→sf10) |
|---|---|---|---|---|
| dedup_minhash_lsh | 6.2 | 6.0 | 13.6 | 2.2× |
| ann_lsh_topk | 0.9 | 1.0 | 1.9 | 2.1× |
| curation_contamination | 12.7 | 24.2 | 104.6 | 8.2× |

All three stay sub-linear across the full decade. Contamination's
sf3→sf10 step alone reads 4.3× for 3.3× data — that uptick is the
SYNTHETIC corpus's finite 32-word vocabulary saturating: the %97
bench sample's gram set covers an ever-larger fraction of the
bounded 5-gram space as the corpus grows, so the per-doc HIT rate
rises with scale; on a real corpus the eval-set gram space is fixed
and the hit stream stays sparse. The full-decade 8.2× (vs 10× data)
is the honest headline. Negative result recorded the same session:
rewriting contamination's grams to the dual-xxhash64 chains that
bought duplicate_spans its 3.9× was A/B-tested at sf1 and REJECTED
(strings 12.7 s vs hashed 39.6 s interleaved best-of-3) — the hashing
win requires an md5/shuffle in the loop to eliminate; against a
scan-local broadcast join the extra interpreted array passes dominate.
"""


def main() -> None:
    from bench import make_spark, run_one
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict[str, float]] = {name: {} for name, _ in QUERIES_SHOWN}
    for sf in SFS:
        sf_dir = sf_dir_for(sf)
        for name, _ in QUERIES_SHOWN:  # untimed warm-up pass
            run_one(spark, QUERIES[name].builder, sf_dir)
        best = {name: float("inf") for name, _ in QUERIES_SHOWN}
        for _ in range(PASSES):
            for name, _ in QUERIES_SHOWN:
                best[name] = min(
                    best[name], run_one(spark, QUERIES[name].builder, sf_dir)
                )
        for name, v in best.items():
            results[name][sf] = v
        print(f"sf{sf} done", file=sys.stderr)

    lines = [HEADER]
    lines.append(
        "| query | driving table | sf0.001 s | sf0.01 s | sf0.1 s | sf1 s "
        "| ×10 step A | ×10 step B | ×10 step C |"
    )
    lines.append("|---|---|---|---|---|---|---|---|---|")
    for name, table in QUERIES_SHOWN:
        a, b, c, d = (results[name][sf] for sf in SFS)
        lines.append(
            f"| {name} | {table} | {a:.2f} | {b:.2f} | {c:.2f} | {d:.2f} "
            f"| {b / a:.1f}× | {c / b:.1f}× | {d / c:.1f}× |"
        )
    lines.append("")
    lines.append(
        f"Generated on local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], "
        "per-query min over "
        f"{PASSES} interleaved timed passes after one warm-up pass per sf."
    )
    lines.append("")
    lines.append(SKEW_PROOF)
    lines.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write("\n".join(lines))
    print("SCALING.md written")


if __name__ == "__main__":
    main()
