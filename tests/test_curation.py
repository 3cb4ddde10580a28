"""Behavioral tests for training-data curation operators
(operators/curation.py) — edge cases the sf0.01 oracle rows don't pin
down: redaction ordering, sub-n-gram docs, pack-boundary math.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spark_cassandra_collabfiltering_spark.operators import curation as cu  # noqa: E402


def test_redact_pii_each_category(spark):
    df = spark.createDataFrame(
        [
            (1, "reach me at jo.doe+x@mail.example.org thanks"),
            (2, "card 4111 1111 1111 1111 on file"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "call 415-555-0137 today"),
            (5, "host 192.168.0.1 up"),
            (6, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in cu.redact_pii(df).collect()}
    assert out[1]["n_email"] == 1 and "<EMAIL>" in out[1]["text_redacted"]
    assert out[2]["n_cc"] == 1 and "<CC>" in out[2]["text_redacted"]
    assert out[3]["n_ssn"] == 1 and "<SSN>" in out[3]["text_redacted"]
    assert out[4]["n_phone"] == 1 and "<PHONE>" in out[4]["text_redacted"]
    assert out[5]["n_ipv4"] == 1 and "<IP>" in out[5]["text_redacted"]
    assert out[6]["text_redacted"] == "nothing sensitive here"
    for doc_id, r in out.items():
        if doc_id != 6:
            # the raw span must be gone from the redacted text
            assert "@" not in r["text_redacted"] or doc_id != 1
            assert "4111" not in r["text_redacted"]
            assert "123-45-6789" not in r["text_redacted"]


def test_redact_pii_specific_before_loose(spark):
    # an SSN must become <SSN>, not be half-eaten by the phone pattern;
    # a credit card must not decay into <PHONE>/<IP> fragments
    df = spark.createDataFrame(
        [(1, "ssn 123-45-6789 card 4111-1111-1111-1111")], ["doc_id", "text"]
    )
    r = cu.redact_pii(df).collect()[0]
    assert r["text_redacted"] == "ssn <SSN> card <CC>"
    assert (r["n_ssn"], r["n_cc"]) == (1, 1)


def test_contamination_marks_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # shares 5-gram with bench
            (2, "one two three four five six"),  # disjoint
            (3, "too short"),  # < n words -> no grams at all
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in cu.contamination_check(corpus, bench, n=5).collect()}
    assert len(out) == 3  # every corpus doc reported, clean ones included
    assert out[1]["contaminated"] and out[1]["n_hits"] == 1
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert not out[3]["contaminated"] and out[3]["n_hits"] == 0


def test_pack_documents_boundary_math(spark):
    # single group so the chunk layout is fully determined: docs of
    # 100/50/30 tokens in id order against budget 64:
    #   doc 1 -> start 0   (seq 0, off 0)
    #   doc 2 -> start 100 (seq 1, off 36)
    #   doc 3 -> start 150 (seq 2, off 22)
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(1, 100), (2, 50), (3, 30)]],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in cu.pack_documents(docs, budget=64, n_groups=1).collect()
    }
    assert all(r["pack_group"] == 0 for r in out.values())
    assert (out[1]["seq_id"], out[1]["seq_offset"]) == (0, 0)
    assert (out[2]["seq_id"], out[2]["seq_offset"]) == (1, 36)
    assert (out[3]["seq_id"], out[3]["seq_offset"]) == (2, 22)
    assert [r["n_tokens"] for r in out.values()] == [100, 50, 30]


def test_pack_documents_groups_are_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(40)], ["doc_id", "text"]
    )
    one = sorted(map(tuple, cu.pack_documents(docs, budget=8, n_groups=4).collect()))
    two = sorted(
        map(
            tuple,
            cu.pack_documents(docs.repartition(13), budget=8, n_groups=4).collect(),
        )
    )
    assert one == two  # placement is a pure function of the rows


def _naive_mix(spark, df, quotas):
    """The oracle's statement of domain_mix_sample: per-domain
    row_number over (md5 draw, key) <= quota."""
    from pyspark.sql import Window
    from spark_cassandra_collabfiltering_spark.operators.relational import (
        md5_draw60,
    )

    w = Window.partitionBy("source").orderBy(
        md5_draw60(F.col("doc_id")), F.col("doc_id")
    )
    quota = F.lit(0)
    for d, q in quotas.items():
        quota = F.when(F.col("source") == d, F.lit(q)).otherwise(quota)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .select("doc_id", "source")
    )


def test_domain_mix_exact_quotas_and_caps(spark):
    rows = [(i, f"dom{i % 3}") for i in range(90)]  # 30 per domain
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    quotas = {"dom0": 7, "dom1": 45}  # dom1 over-quota; dom2 absent
    out = cu.domain_mix_sample(df, quotas).collect()
    by_dom: dict[str, set] = {}
    for r in out:
        by_dom.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_dom.get("dom0", set())) == 7      # exact quota
    assert len(by_dom.get("dom1", set())) == 30     # capped at available
    assert "dom2" not in by_dom                     # no quota -> dropped


def test_domain_mix_matches_naive_window_statement(spark):
    rows = [(i, f"dom{i % 5}") for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    quotas = {"dom0": 11, "dom1": 1, "dom3": 40, "dom4": 0}
    got = sorted(map(tuple, cu.domain_mix_sample(df, quotas).collect()))
    want = sorted(map(tuple, _naive_mix(spark, df, quotas).collect()))
    assert got == want and len(got) == 11 + 1 + 40


def test_domain_mix_is_partitioning_invariant(spark):
    rows = [(i, f"dom{i % 3}") for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    quotas = {"dom0": 13, "dom1": 29, "dom2": 5}
    one = sorted(map(tuple, cu.domain_mix_sample(df, quotas).collect()))
    two = sorted(
        map(tuple, cu.domain_mix_sample(df.repartition(17), quotas).collect())
    )
    assert one == two


def test_domain_mix_boundary_bucket_ranking(spark):
    # range_bits=1 forces two coarse buckets so at least one domain's
    # quota lands strictly INSIDE a bucket -> exercises the boundary-
    # rank arm (keep_all/drop_all alone can't hit an odd quota)
    rows = [(i, "only") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = sorted(
        map(tuple, cu.domain_mix_sample(df, {"only": 23}, range_bits=1).collect())
    )
    want = sorted(map(tuple, _naive_mix(spark, df, {"only": 23}).collect()))
    assert got == want and len(got) == 23


def test_bloom_no_false_negatives_and_prunes(spark):
    vocab = [f"alpha beta gamma delta token{i}" for i in range(60)]
    grams = spark.createDataFrame([(g,) for g in vocab], ["gram"])
    words = cu.bloom_build(grams, "gram", bits_log2=16, n_hashes=5)
    probes = vocab + [f"zeta eta theta iota other{i}" for i in range(400)]
    df = spark.createDataFrame([(p,) for p in probes], ["gram"])
    kept = {
        r["gram"]
        for r in df.filter(
            cu.bloom_might_contain(words, F.col("gram"), bits_log2=16, n_hashes=5)
        ).collect()
    }
    assert set(vocab) <= kept                 # no false negatives, ever
    fp = len(kept) - len(vocab)
    assert fp <= 8                            # 400 probes vs ~0.002% design FP


def test_contamination_bloom_path_is_result_identical(spark):
    rows = [
        (i, f"w{i} shared common phrase here and tail {i} " + " ".join(
            f"t{i}_{j}" for j in range(8)))
        for i in range(40)
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = corpus.filter(F.col("doc_id") % 7 == 0)
    exact = sorted(
        map(tuple, cu.contamination_check(corpus, bench, n=5).collect())
    )
    bloom = sorted(
        map(
            tuple,
            cu.contamination_check(
                corpus, bench, n=5, bloom_bits_log2=14
            ).collect(),
        )
    )
    assert exact == bloom


def test_bloom_empty_bench_rejects_everything(spark):
    empty = spark.createDataFrame([], "gram string")
    words = cu.bloom_build(empty, "gram", bits_log2=12, n_hashes=3)
    assert all(w == 0 for w in words)
    df = spark.createDataFrame([("anything",)], ["gram"])
    assert (
        df.filter(
            cu.bloom_might_contain(words, F.col("gram"), bits_log2=12, n_hashes=3)
        ).count()
        == 0
    )


def test_cluster_safe_split_atomicity(spark):
    """No near-dup cluster may straddle the train/val boundary, the
    whole corpus is covered exactly once, and singletons split by
    their own id (same draw as hash_split on doc_id)."""
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES, t

    sf = "/root/testdata/sf0.001"
    out = QUERIES["curation_cluster_split"].builder(spark, sf).collect()
    docs = {r.doc_id for r in t(spark, sf, "documents").select("doc_id").collect()}
    assert {r.doc_id for r in out} == docs and len(out) == len(docs)
    by_cluster = {}
    for r in out:
        if r.cluster_id is not None:
            by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert by_cluster, "testdata should contain near-dup clusters"
    assert all(len(sides) == 1 for sides in by_cluster.values())


def test_cluster_safe_split_planted(spark):
    from spark_cassandra_collabfiltering_spark.operators import curation as cu

    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    clusters = spark.createDataFrame(
        [(1, 1), (7, 1), (9, 1), (2, 2), (4, 2)], "node bigint, cluster_id bigint"
    )
    got = {r.doc_id: (r.cluster_id, r.split)
           for r in cu.cluster_safe_split(docs, clusters).collect()}
    assert len(got) == 10
    # every member of a cluster gets the cluster's draw
    assert got[1] == got[7] == got[9]
    assert got[2] == got[4]
    # singletons carry NULL cluster_id
    assert got[0][0] is None and got[5][0] is None


def test_quality_floor_is_per_group(spark):
    """Each group's floor must come from its OWN distribution: group a
    (scores around 900k) keeps its high scorers, group b (scores
    around 100k) keeps its own top — a global floor would keep all of
    a and none of b."""
    # a: all mass in one bin (900k..907k) -> lower-edge flooring keeps
    # the whole threshold bin (never mass-drops a concentrated group);
    # b: mass spread across bins (0..700k) -> a real partial cut
    rows = [("a", i, 900_000 + i * 1000) for i in range(8)]
    rows += [("b", 100 + i, i * 100_000) for i in range(8)]
    df = spark.createDataFrame(rows, "source string, doc_id bigint, quality_e6 bigint")
    out = cu.quality_floor(df, "source", "quality_e6", q=0.25).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.source, []).append(r)
    assert set(by_group) == {"a", "b"}
    for g, rs in by_group.items():
        assert len({r.floor_est for r in rs}) == 1  # one floor per group
    kept_a = sum(r.keep for r in by_group["a"])
    kept_b = sum(r.keep for r in by_group["b"])
    assert kept_a == 8          # concentrated group fully kept
    assert kept_b == 7          # spread group loses its bottom tail
    # b's floor sits far below a's
    assert by_group["b"][0].floor_est < by_group["a"][0].floor_est
    # verdicts agree with the carried floor
    for r in out:
        assert r.keep == (r.quality_e6 >= r.floor_est)


def test_pipeline_verdict_consistent_and_covering(spark):
    from spark_cassandra_collabfiltering_spark.plans.queries import QUERIES, t

    sf = "/root/testdata/sf0.001"
    out = QUERIES["curation_pipeline_verdict"].builder(spark, sf).collect()
    docs = {r.doc_id for r in t(spark, sf, "documents").select("doc_id").collect()}
    assert {r.doc_id for r in out} == docs
    for r in out:
        assert r.keep == (
            r.gopher_pass and not r.contaminated and r.floor_keep
            and not r.dup_loser
        )
    # every reason column discriminates on this corpus except the
    # Gopher gate, which the synthetic vocabulary fails wholesale
    # (only one stop-word KIND present — corpus truth, verified in
    # the gate's own oracle row, not a composition defect)
    assert any(r.contaminated for r in out) and not all(
        r.contaminated for r in out
    )
    assert any(r.floor_keep for r in out) and not all(r.floor_keep for r in out)
    assert any(r.dup_loser for r in out) and not all(r.dup_loser for r in out)


# --- canonicalize_url ------------------------------------------------------


def _canon(spark, urls):
    from spark_cassandra_collabfiltering_spark.operators.curation import (
        canonicalize_url,
    )

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_url_surface_forms_collapse(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/docs//3/?utm_source=feed&b=2&a=1#frag",
            "http://example.com/docs/3?a=1&b=2",
            "http://Example.com/docs/3?b=2&gclid=xyz&a=1&fbclid=abc",
        ],
    )
    assert set(got) == {"http://example.com/docs/3?a=1&b=2"}


def test_url_distinctions_preserved(spark):
    got = _canon(
        spark,
        [
            "https://example.com/docs/3",   # scheme differs
            "http://example.com/Docs/3",    # path case is significant
            "http://example.com:8080/docs/3",  # non-default port kept
            "http://example.com/docs/3?a=2",   # param value differs
        ],
    )
    assert len(set(got)) == 4
    assert "http://example.com:8080/docs/3" in got


def test_url_default_port_is_scheme_aware(spark):
    a, b, c = _canon(
        spark,
        [
            "https://example.com:443/x",
            "https://example.com:80/x",  # :80 NOT default for https
            "http://example.com:443/x",  # :443 NOT default for http
        ],
    )
    assert a == "https://example.com/x"
    assert b == "https://example.com:80/x"
    assert c == "http://example.com:443/x"


def test_url_query_only_tracking_drops_question_mark(spark):
    (got,) = _canon(spark, ["http://example.com/a?utm_campaign=x&utm_medium=y"])
    assert got == "http://example.com/a"


def test_url_schemeless_input_passes_through(spark):
    (got,) = _canon(spark, ["not a url #fragment"])
    assert got == "not a url "


# --- semantic contamination (embedding-cosine eval screen) ------------------


def _sem_fixture(spark):
    corpus = spark.createDataFrame(
        [
            (100, [1.0, 0.0, 0.0]),     # identical to eval 0
            (101, [0.9, 0.1, 0.0]),     # near eval 0
            (102, [0.0, 0.0, 1.0]),     # orthogonal to both evals
            (103, [0.0, 0.0, 0.0]),     # zero vector: cos := 0, never flagged
            (104, [0.7, 0.7, 0.0]),     # close-ish to BOTH evals
        ],
        "vec_id bigint, embedding array<double>",
    )
    ev = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "eval_id bigint, eval_vec array<double>",
    )
    return corpus, ev


def test_contamination_semantic_flags_and_counts(spark):
    corpus, ev = _sem_fixture(spark)
    got = {r.vec_id: r for r in cu.contamination_semantic(corpus, ev, tau=0.9).collect()}
    assert len(got) == 5  # one row per corpus doc, flagged or not
    assert got[100].contaminated and got[100].n_eval_hits == 1
    assert got[100].max_cos == 1.0
    assert got[101].contaminated  # cos ~ 0.9939 >= 0.9
    assert not got[102].contaminated and got[102].n_eval_hits == 0
    assert not got[103].contaminated and got[103].max_cos == 0.0
    # 104 is at cos ~ 0.707 to each eval: below 0.9, but both hits at 0.7
    assert not got[104].contaminated
    both = {r.vec_id: r for r in cu.contamination_semantic(corpus, ev, tau=0.7).collect()}
    assert both[104].n_eval_hits == 2 and both[104].contaminated


def test_contamination_semantic_tau_boundary_inclusive(spark):
    corpus, ev = _sem_fixture(spark)
    # rounded max_cos of doc 104 vs either eval is round(0.70711, 4) = 0.7071
    got = {r.vec_id: r for r in cu.contamination_semantic(corpus, ev, tau=0.7071).collect()}
    assert got[104].contaminated and got[104].n_eval_hits == 2
    above = {r.vec_id: r for r in cu.contamination_semantic(corpus, ev, tau=0.7072).collect()}
    assert not above[104].contaminated


# --- temperature-scaled source mixing ---------------------------------------


def _draw60_py(x) -> int:
    import hashlib

    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


def test_temperature_mix_quotas_and_exact_selection(spark):
    import math

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = {r.source: r for r in cu.temperature_mix_sample(df, budget=100).collect()}
    # isqrt weights: big 20, small 5 -> quotas 80, 20
    assert got["big"].n_before == 400 and got["small"].n_before == 25
    assert got["big"].quota == 80 and got["small"].quota == 20
    assert got["big"].n_selected == 80 and got["small"].n_selected == 20
    # small's share rose from 25/425 (5.9%) to 20% — the alpha<1 point
    # checksum pins WHICH rows: replicate the md5-draw ranking in Python
    for src, ids in (("big", range(400)), ("small", range(1000, 1025))):
        ranked = sorted(ids, key=lambda i: (_draw60_py(i), i))
        want = 0
        for i in ranked[: got[src].quota]:
            want ^= _draw60_py(i)
        assert got[src].sel_checksum == want
    assert math.isqrt(400) == 20 and math.isqrt(25) == 5  # the weights used


def test_temperature_mix_budget_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(4)] + [(10 + i, "b") for i in range(9)],
        "doc_id bigint, source string",
    )
    got = {r.source: r for r in cu.temperature_mix_sample(df, budget=1000).collect()}
    # quota capped at availability
    assert got["a"].quota == 4 and got["a"].n_selected == 4
    assert got["b"].quota == 9 and got["b"].n_selected == 9


def test_temperature_mix_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [(None, "a"), (1, "a"), (2, "a"), (3, "b")],
        "doc_id bigint, source string",
    )
    got = {r.source: r for r in cu.temperature_mix_sample(df, budget=100).collect()}
    assert got["a"].n_before == 2  # NULL key never counted


def test_k_anonymity_bands_hand_planted(spark):
    rows = (
        [("us", "a")] * 7      # anonymous at k=5
        + [("de", "b")] * 3    # risky
        + [("fr", "c")]        # unique
    )
    df = spark.createDataFrame(rows, "nat string, seg string")
    got = {
        r.risk_band: (r.n_classes, r.n_rows)
        for r in cu.k_anonymity_audit(df, ["nat", "seg"], k=5).collect()
    }
    assert got == {
        "anonymous": (1, 7), "risky": (1, 3), "unique": (1, 1)
    }


def test_expectations_check_counts_planted_violations(spark):
    """Each rule type catches exactly its planted violations; a clean
    column reports zero; uniqueness counts duplicates AND nulls."""
    from spark_cassandra_collabfiltering_spark.operators.curation import (
        expectations_check,
    )

    rows = [
        (1, 10.0, "O"),
        (2, -5.0, "O"),     # totalprice violation
        (3, 10.0, "X"),     # status violation
        (None, 10.0, "F"),  # null key: not-null AND uniqueness violation
        (5, 10.0, "F"),
        (5, 0.0, "O"),      # duplicate key + zero price violation
    ]
    df = spark.createDataFrame(rows, "k long, price double, status string")
    out = {
        r.rule: (r.n_checked, r.n_violations)
        for r in expectations_check(
            df,
            rules=[
                ("k_not_null", "k IS NOT NULL"),
                ("price_positive", "price > 0.0D"),
                ("status_in_set", "status IN ('O', 'F')"),
            ],
            unique_cols=["k"],
        ).collect()
    }
    assert out["k_not_null"] == (6, 1)
    assert out["price_positive"] == (6, 2)
    assert out["status_in_set"] == (6, 1)
    # 6 rows, distinct non-null keys {1,2,3,5} = 4 -> 2 violations
    # (the dup 5 and the NULL)
    assert out["unique:k"] == (6, 2)


# ---------------------------------------------------------------------------
# r6: multi-benchmark decontamination in one scan
# ---------------------------------------------------------------------------

def test_contamination_multi_matches_per_benchmark_runs(spark):
    """One-scan grouped result == N independent contamination_check
    runs (the rescans it replaces), on planted data."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma delta epsilon different tail"),
            (4, "totally unrelated words nothing shared here ok"),
        ],
        ["doc_id", "text"],
    )
    b1 = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    b2 = spark.createDataFrame(
        [(200, "one two three four five six")], ["doc_id", "text"]
    )
    multi_in = b1.select(
        F.lit("b1").alias("benchmark"), "doc_id", "text"
    ).unionByName(b2.select(F.lit("b2").alias("benchmark"), "doc_id", "text"))
    got = {
        (r["doc_id"], r["benchmark"]): r["n_hits"]
        for r in cu.contamination_check_multi(docs, multi_in, n=5).collect()
    }
    want = {}
    for name, b in (("b1", b1), ("b2", b2)):
        for r in cu.contamination_check(docs, b, n=5).collect():
            if r["n_hits"] > 0:
                want[(r["doc_id"], name)] = r["n_hits"]
    assert got == want
    assert (1, "b1") in got and (2, "b2") in got
    assert not any(d == 4 for d, _ in got)  # clean doc never materializes
