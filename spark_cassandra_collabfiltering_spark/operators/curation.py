"""Training-data curation operators: PII redaction, benchmark-
contamination detection, and token-budget document packing.

Driver-mandated extension territory (no reference counterpart — the
reference's scope ends at SURVEY §2.8 string functions): these are the
three curation passes a 100 TB pretraining pipeline runs between raw
scrape and tokenizer, alongside dedup (operators/dedup.py), quality
scoring (operators/text.py) and sampling (operators/relational.py).

Scale design:
- PII redaction is a pure per-row regexp pass — JVM built-ins, codegen,
  zero shuffle; it scan-scales like the text operators.
- Contamination: the benchmark/eval side is SMALL by construction (eval
  suites are thousands of docs, not billions), so its shingle set
  broadcasts; the corpus side is a map-side explode → broadcast-hash
  semi-count → per-doc agg. The only shuffle is the final doc_id agg,
  and it carries (doc_id, count) pairs, not text.
- Packing is the concat-then-chunk model pretraining actually uses:
  documents are concatenated in a deterministic order and sliced into
  budget-sized sequences. A single global cumsum would serialize on one
  partition, so packing runs per md5-bucket pack group (parallel
  windows, deterministic group assignment, no coordination across
  groups — exactly how a 1000-executor run would shard it).

All outputs are integers/strings — engine-portable, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.operators.relational import (
    hash_bucket,
    md5_draw60,
)

# RE2-and-Java-portable patterns (no backrefs/lookaround): the ORDER
# matters — SSN and credit-card shapes are substrings of looser phone/
# number shapes, so the more specific patterns replace first.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CC>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact PII spans with typed tags and count hits per category.

    Counts are taken BEFORE replacement (on the original text), then
    the patterns replace in the declared order. One projection, all
    ``regexp_extract_all``/``regexp_replace`` built-ins — a map-only
    pass with no shuffle, which is the whole point at corpus scale.
    """
    c = F.col(text_col)
    counts = {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0))
        for name, pat, _ in PII_PATTERNS
    }
    redacted: Column = c
    for _, pat, tag in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, tag)
    return df.withColumns({**counts, "text_redacted": redacted})


def _word_ngrams(text_col: Column, n: int) -> Column:
    """Array of word n-grams (space-rejoined) from a text column —
    row-local, built by zip_with over shifted slices of the word array
    so the tokenizer evaluates per ROW. (The earlier
    ``transform(sequence, i -> slice(words, i, n))`` form captured
    ``words`` in the lambda body, and captured expressions re-evaluate
    per element inside higher-order functions — the regexp ran once
    per n-gram; see operators/text.py:_word_ngrams for the measured
    cost.) Empty when the doc has fewer than ``n`` words."""
    words = F.regexp_extract_all(text_col, F.lit(r"[A-Za-z0-9]+"), 0)
    k = F.size(words) - (n - 1)  # gram count when >= 1
    shifted = [F.slice(words, s + 1, k) for s in range(n)]
    grams = shifted[0]
    for nxt in shifted[1:]:
        grams = F.zip_with(grams, nxt, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination detection by word n-gram overlap.

    A corpus doc is contaminated when it shares ≥1 word ``n``-gram with
    any benchmark/eval doc — the standard decontamination test run
    before pretraining so the training set can't leak eval answers.

    Plan: benchmark → distinct n-gram set (small; broadcast). Corpus →
    row-local n-gram explode (map-side; no shuffle) → broadcast-hash
    inner join → per-doc count. Output: (doc_id, n_hits,
    contaminated) for EVERY corpus doc (zero-hit docs included via the
    left join back — the decontamination filter needs the clean rows).
    """
    bench_grams = (
        benchmark.select(
            F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
        ).distinct()
    )
    corpus_grams = corpus.select(
        F.col(id_col), F.explode(_word_ngrams(F.col(text_col), n)).alias("gram")
    )
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def domain_mix_sample(
    df: DataFrame,
    quotas: dict[str, int],
    domain_col: str = "source",
    key_col: str = "doc_id",
    range_bits: int = 8,
) -> DataFrame:
    """Exact-quota domain-mix rebalancing — the "data recipe" step of a
    pretraining pipeline (take exactly 40 B docs of web, 20 B of code,
    ...), deterministic and skew-free at corpus scale.

    Semantics: per domain, keep EXACTLY ``min(quota, available)`` rows
    — the ones ranked first by a pure-function-of-the-row md5 draw
    (ties broken by key). Equivalent to
    ``row_number() OVER (PARTITION BY domain ORDER BY draw, key)
    <= quota`` — which is how the DuckDB oracle states it — but that
    direct window puts an entire domain's rows in ONE task, and a
    pretraining mix has FEW domains with BILLIONS of rows each: the
    naive plan serializes on the hottest domain. Instead, a two-phase
    distributed top-n:

    1. Range-split the 60-bit draw into ``2^range_bits`` ordered
       buckets (top bits — bucket order IS draw order). Per
       (domain, bucket) counts are one map-side-combinable agg whose
       output is tiny (domains x 256 rows), so the running prefix
       count per domain is a window over a broadcast-scale table.
    2. Broadcast the per-bucket prefix counts back onto the rows:
       buckets wholly under quota keep ALL rows scan-locally (no sort,
       no shuffle); buckets wholly past quota drop scan-locally; only
       each domain's single BOUNDARY bucket — ~1/256th of one domain —
       shuffles for an exact within-bucket rank to fill the remainder.

    Domains absent from ``quotas`` get quota 0 (dropped). Output is
    the selected (key, domain) rows."""
    nb_shift = 60 - range_bits
    base = df.select(
        F.col(key_col),
        F.col(domain_col),
        md5_draw60(F.col(key_col)).alias("_draw"),
    ).withColumn("_rb", F.shiftright(F.col("_draw"), nb_shift))

    stats = base.groupBy(domain_col, "_rb").agg(F.count(F.lit(1)).alias("_cnt"))
    w_before = (
        Window.partitionBy(domain_col)
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    stats = stats.withColumn(
        "_before", F.coalesce(F.sum("_cnt").over(w_before), F.lit(0))
    )

    quota: Column = F.lit(0)
    for d, q in quotas.items():
        quota = F.when(F.col(domain_col) == d, F.lit(int(q))).otherwise(quota)

    j = base.join(F.broadcast(stats), [domain_col, "_rb"]).withColumn(
        "_quota", quota
    )
    keep_all = j.filter(F.col("_before") + F.col("_cnt") <= F.col("_quota"))
    boundary = j.filter(
        (F.col("_before") < F.col("_quota"))
        & (F.col("_before") + F.col("_cnt") > F.col("_quota"))
    )
    w_rank = Window.partitionBy(domain_col, "_rb").orderBy("_draw", key_col)
    boundary_kept = boundary.withColumn(
        "_rk", F.row_number().over(w_rank)
    ).filter(F.col("_before") + F.col("_rk") <= F.col("_quota"))
    return keep_all.select(key_col, domain_col).unionByName(
        boundary_kept.select(key_col, domain_col)
    )


def pack_documents(
    df: DataFrame,
    budget: int = 512,
    n_groups: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget document packing (concat-then-chunk model).

    Documents are assigned to ``n_groups`` deterministic md5 pack
    groups, concatenated within each group in ``id_col`` order, and the
    resulting token stream is sliced into ``budget``-token sequences.
    Each doc reports the sequence its FIRST token lands in and its
    offset there — exactly the placement a pretraining loader needs to
    materialize packed sequences with EOD separators.

    tokens = whitespace-token count (swap in a real tokenizer count
    column upstream without touching the packing math). The window
    cumsum runs per pack group → ``n_groups``-way parallel, no global
    sort, no single-partition window.
    """
    tokens = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0))
    w = (
        Window.partitionBy("pack_group")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = df.select(
        F.col(id_col),
        hash_bucket(F.col(id_col), n_groups).alias("pack_group"),
        tokens.alias("n_tokens"),
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("tok_start")
    return g.select(
        id_col,
        "pack_group",
        "n_tokens",
        start,
    ).select(
        id_col,
        "pack_group",
        "n_tokens",
        F.floor(F.col("tok_start") / budget).cast("bigint").alias("seq_id"),
        (F.col("tok_start") % budget).cast("bigint").alias("seq_offset"),
    )
