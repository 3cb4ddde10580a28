"""M1-M3: collaborative filtering via pyspark.ml ALS (SURVEY §2.11).

The reference trains RDD-based MLlib ALS with rank=6, iterations=20,
lambda=0.01 (CollabFilterCassandra8.java:28-30,35), scores validation
(user, product) pairs with ``model.predict`` (:39-43 — inner-join
semantics on the factor matrices, J3), and computes
RMSE = sqrt(mean((actual-pred)²)) over the inner join of actuals and
predictions on (user, product) (:45-57 — J1/A1-A3).

Differences, deliberate (SURVEY §7.4):
- ``pyspark.ml.recommendation.ALS`` (DataFrame-native; mllib's RDD API is
  gone in Spark 4).
- ``seed`` pinned: MLlib 1.1 ALS was unseeded/nondeterministic — the
  reference copes with a threshold test; we keep the threshold contract
  AND reproducible runs.
- ``coldStartStrategy="drop"`` reproduces predict's inner semantics
  (unknown user/product pairs absent from output, not NaN).
"""

from __future__ import annotations

from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_cassandra_collabfiltering_spark.functions.scalar import squared_error

# CollabFilterCassandra8.java:28-30
ALS_RANK = 6
ALS_ITERATIONS = 20
ALS_LAMBDA = 0.01
ALS_SEED = 42


def train(
    ratings: DataFrame,
    rank: int = ALS_RANK,
    max_iter: int = ALS_ITERATIONS,
    reg_param: float = ALS_LAMBDA,
    seed: int = ALS_SEED,
) -> ALSModel:
    """M1: ALS.train(ratings, 6, 20, 0.01) ≙ CollabFilterCassandra8.java:32-37.

    The input only needs user/product/rating columns (P3's projection is
    just column selection — Catalyst prunes the scan to these columns).
    Explicit feedback (implicitPrefs=False) matches ``ALS.train``.
    """
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        userCol="user",
        itemCol="product",
        ratingCol="rating",
        implicitPrefs=False,
        coldStartStrategy="drop",
    )
    return als.fit(ratings.select("user", "product", "rating"))


def predict(model: ALSModel, pairs: DataFrame) -> DataFrame:
    """M2/J3: score (user, product) pairs ≙ model.predict
    (CollabFilterCassandra8.java:39-43).

    Output columns: user, product, prediction (double). coldStart="drop"
    keeps the inner-join-on-factors semantics.
    """
    return model.transform(pairs.select("user", "product")).select(
        "user", "product", F.col("prediction").cast("double").alias("prediction")
    )


def validate(predictions: DataFrame, actuals: DataFrame) -> float:
    """M3/J1/A1-A3: RMSE over the inner join on (user, product)
    ≙ CollabFilterCassandra8.java:45-57.

    Pairs missing on either side are dropped (inner), exactly like the
    reference's pair-RDD join — cold-start predictions never poison the
    mean. One distributed expression: sqrt(avg((rating-prediction)²)).
    """
    joined = actuals.select("user", "product", "rating").join(
        predictions, on=["user", "product"], how="inner"
    )
    return rmse(joined)


def rmse(joined: DataFrame, actual_col: str = "rating", pred_col: str = "prediction") -> float:
    """sqrt(mean squared error) as a single hash-aggregate plan
    (partial per partition + final merge — the DataFrame analog of
    JavaDoubleRDD.mean, CollabFilterCassandra8.java:50-54)."""
    row = joined.agg(
        F.sqrt(F.avg(squared_error(F.col(actual_col), F.col(pred_col)))).alias("rmse")
    ).first()
    return float(row["rmse"]) if row["rmse"] is not None else float("nan")


def recommend_top_k(model: ALSModel, k: int = 3) -> DataFrame:
    """Capability-parity plus (SURVEY §2.5): top-k products per user.

    Mirrors MatrixFactorizationModel.recommendProducts (which the
    reference does not call); exposed because it is the natural windowed
    query over predictions. Returns user, product, prediction, rank.
    """
    recs = model.recommendForAllUsers(k)
    return recs.select(
        "user", F.posexplode("recommendations").alias("pos", "rec")
    ).select(
        "user",
        F.col("rec.product").alias("product"),
        F.col("rec.rating").cast("double").alias("prediction"),
        (F.col("pos") + 1).alias("rank"),
    )
