"""Poisson bootstrap CI (aggregates.bootstrap_mean_ci): exact replica
parity of the deterministic md5->Poisson(1) machinery, plus the
statistical contracts (CI brackets the mean, width shrinks with n,
weights average ~1)."""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_cassandra_collabfiltering_spark.operators import aggregates as agg  # noqa: E402


def _draw(k, b) -> int:
    return int(hashlib.md5(f"{k}:{b}".encode()).hexdigest()[:15], 16)


def _w(k, b) -> int:
    d = _draw(k, b)
    return sum(1 for t in agg._POISSON1_T60 if d >= t)


def _replica(groups: dict[str, list[tuple[int, int]]], B=50):
    out = {}
    for g, rows in groups.items():
        means = []
        for b in range(1, B + 1):
            swx = sum(_w(k, b) * x for k, x in rows)
            sw = sum(_w(k, b) for k, _ in rows)
            means.append(None if sw == 0 else (swx * 1000000) // sw)
        means.sort(key=lambda m: (m is not None, m))  # NULLS FIRST
        lo_rank = -(-25 * B // 1000)
        out[g] = (means[lo_rank - 1], means[B - lo_rank])
    return out


def test_bootstrap_matches_pure_python_replica(spark):
    groups = {
        "a": [(i, 100 + (i * 7) % 50) for i in range(40)],
        "b": [(1000 + i, 500 + (i * 13) % 200) for i in range(15)],
    }
    rows = [(k, x, g) for g, rs in groups.items() for k, x in rs]
    df = spark.createDataFrame(rows, "doc_id bigint, n_chars bigint, source string")
    got = {
        r.source: r
        for r in agg.bootstrap_mean_ci(df, "source", "n_chars", "doc_id").collect()
    }
    want = _replica(groups)
    for g, rs in groups.items():
        assert got[g].n == len(rs)
        assert got[g].mean_e6 == (sum(x for _, x in rs) * 1000000) // len(rs)
        assert (got[g].ci_lo_e6, got[g].ci_hi_e6) == want[g]
        # CI must bracket the point estimate for these tame fixtures
        assert got[g].ci_lo_e6 <= got[g].mean_e6 <= got[g].ci_hi_e6


def test_bootstrap_ci_narrows_with_n(spark):
    # same value distribution, 20x the rows -> tighter interval
    small = [(i, 100 + i % 100, "s") for i in range(50)]
    big = [(10_000 + i, 100 + i % 100, "l") for i in range(1000)]
    df = spark.createDataFrame(
        small + big, "doc_id bigint, n_chars bigint, source string"
    )
    got = {
        r.source: r
        for r in agg.bootstrap_mean_ci(df, "source", "n_chars", "doc_id").collect()
    }
    w_small = got["s"].ci_hi_e6 - got["s"].ci_lo_e6
    w_big = got["l"].ci_hi_e6 - got["l"].ci_lo_e6
    assert w_big < w_small


def test_poisson_weights_average_near_one():
    n = 20_000
    tot = sum(_w(k, 1) for k in range(n))
    assert abs(tot / n - 1.0) < 0.03  # Poisson(1) mean, deterministic draws


# --- PSI drift --------------------------------------------------------------


def _psi_replica(ca, cb, na, nb, bins):
    # mirrors the r6 e12 fixed-point scale (operators/aggregates.py
    # psi_drift): probabilities at e12, per-bin terms at e15, outputs
    # floored back to e9
    def L(x):
        if x == 0:
            return -1000
        e = x.bit_length() - 1
        return e * 1000 + ((x - (1 << e)) * 1000) // (1 << e)

    s = 0
    contribs = {}
    for b in set(ca) | set(cb):
        p = ((ca.get(b, 0) + 1) * 10**12) // (na + bins)
        q = ((cb.get(b, 0) + 1) * 10**12) // (nb + bins)
        c = (p - q) * (L(p) - L(q))
        contribs[b] = c
        s += c
    return s // 10**6, {b: c // 10**6 for b, c in contribs.items()}


def test_psi_zero_for_identical_distributions(spark):
    a = spark.range(1000).selectExpr("cast(id % 100 as double) as v")
    got = agg.psi_drift(a, a, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert got.psi_e9 == 0
    assert got.n_a == got.n_b == 1000


def test_psi_detects_shift_and_matches_replica(spark):
    # a: uniform over [0, 50); b: uniform over [50, 100) -> strong shift
    a = spark.range(500).selectExpr("cast(id % 50 as double) as v")
    b = spark.range(400).selectExpr("cast(50 + id % 50 as double) as v")
    got = agg.psi_drift(a, b, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert got.psi_e9 > 0

    ca = {i: 100 for i in range(5)}   # 500 rows in bins 0-4
    cb = {i: 80 for i in range(5, 10)}
    want, contribs = _psi_replica(ca, cb, 500, 400, 10)
    assert got.psi_e9 == want
    best = min(
        (b for b in contribs if contribs[b] == max(contribs.values()))
    )
    assert got.top_bin == best and got.top_contrib_e9 == max(contribs.values())
    # a mild shift scores far lower than the disjoint shift
    c = spark.range(500).selectExpr("cast((id % 50) + 5 as double) as v")
    mild = agg.psi_drift(a, c, "v", lo=0.0, hi=100.0, bins=10).collect()[0]
    assert 0 < mild.psi_e9 < got.psi_e9
