"""Coverage for the UDF extension surface (§2.10), CSV source/sink (S1/S9),
and the seeded random split (X1 literal form)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_recommendation_system_spark.functions import (
    cosine_pairs_pandas,
    rating_zscore,
)
from flink_recommendation_system_spark.functions.pandas_fns import (
    top_k_per_group_pandas,
)
from flink_recommendation_system_spark.operators.relational import random_split
from flink_recommendation_system_spark.operators.similarity import cosine
from flink_recommendation_system_spark.sources.tables import (
    load_csv_reviews,
    load_table,
    reviews_from_events,
)
from tests.conftest import SF0001


def test_rating_zscore_pandas_udf(spark):
    reviews = reviews_from_events(spark, SF0001)
    z = rating_zscore(reviews)
    rows = z.filter(F.col("product_id") == 0).collect()
    vals = [r["rating"] for r in rows]
    mean = sum(vals) / len(vals)
    std = math.sqrt(sum((v - mean) ** 2 for v in vals) / len(vals))
    for r in rows:
        expected = (r["rating"] - mean) / (std if std else 1.0)
        assert abs(r["rating_z"] - expected) < 1e-9


def test_cosine_pairs_pandas_close_to_jvm(spark):
    emb = load_table(spark, SF0001, "embeddings").limit(50)
    pairs = (
        emb.alias("a")
        .join(emb.alias("b"), F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.embedding").alias("a_vec"),
            F.col("b.embedding").alias("b_vec"),
            cosine(F.col("a.embedding"), F.col("b.embedding")).alias("jvm_cos"),
        )
    )
    out = cosine_pairs_pandas(pairs).collect()
    for r in out:
        assert abs(r["cosine_sim"] - r["jvm_cos"]) < 1e-9


def test_top_k_per_group_applyinpandas(spark):
    orders = load_table(spark, SF0001, "orders")
    got = top_k_per_group_pandas(orders, "o_custkey", "o_totalprice", 3)
    w_expected = (
        orders.groupBy("o_custkey")
        .agg(F.max("o_totalprice").alias("mx"))
        .collect()
    )
    mx = {r["o_custkey"]: r["mx"] for r in w_expected}
    by_cust: dict = {}
    for r in got.collect():
        by_cust.setdefault(r["o_custkey"], []).append(r["o_totalprice"])
    for cust, vals in by_cust.items():
        assert len(vals) <= 3
        assert max(vals) == mx[cust]


def test_csv_roundtrip(spark, tmp_path):
    """S1/S9: the reference's CSV contract `(UserId,ProductId,Review,
    Timestamp)` without header (spliter.py:19,32-33)."""
    reviews = reviews_from_events(spark, SF0001).limit(100)
    path = str(tmp_path / "reviews_csv")
    reviews.write.csv(path)  # no header, like spliter.py index=False
    back = load_csv_reviews(spark, path)
    assert back.schema == reviews.schema
    assert back.count() == 100
    assert back.exceptAll(reviews).count() == 0


def test_random_split_invariants(spark):
    """X1 (spliter.py:24-25): seeded split — parts are disjoint and cover
    the input; same seed reproduces exactly."""
    reviews = reviews_from_events(spark, SF0001).withColumn(
        "rid", F.monotonically_increasing_id()
    )
    a1, b1 = random_split(reviews, [0.8, 0.2], seed=200)
    a2, b2 = random_split(reviews, [0.8, 0.2], seed=200)
    assert a1.count() + b1.count() == reviews.count()
    assert a1.join(b1, "rid", "left_semi").count() == 0
    assert a1.exceptAll(a2).count() == 0 and b1.exceptAll(b2).count() == 0


# --- merge_upsert (keyed MERGE into a parquet model table) -----------------


def test_merge_upsert_updates_inserts_deletes(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from flink_recommendation_system_spark.sources.warehouse import (
        merge_upsert,
    )

    path = str(tmp_path / "model")
    seed = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    assert merge_upsert(spark, path, seed, ["k"]) == 3

    updates = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        ["k", "v", "is_delete"],
    )
    n = merge_upsert(spark, path, updates, ["k"], delete_col="is_delete")
    assert n == 3
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    # 1 untouched, 2 updated, 3 tombstoned, 4 inserted
    assert got == {(1, "a"), (2, "B"), (4, "d")}
    # staging/old directories cleaned up after the swap
    assert not glob.glob(path + ".staging") and not glob.glob(path + ".old")


def test_merge_upsert_rejects_ambiguous_updates(spark, tmp_path):
    import pytest

    from flink_recommendation_system_spark.sources.warehouse import (
        merge_upsert,
    )

    path = str(tmp_path / "model2")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    with pytest.raises(ValueError):
        merge_upsert(spark, path, dup, ["k"])


def test_merge_upsert_is_idempotent_on_rerun(spark, tmp_path):
    from flink_recommendation_system_spark.sources.warehouse import (
        merge_upsert,
    )

    path = str(tmp_path / "model3")
    seed = spark.createDataFrame([(1, "a")], ["k", "v"])
    merge_upsert(spark, path, seed, ["k"])
    updates = spark.createDataFrame([(1, "A"), (2, "b")], ["k", "v"])
    merge_upsert(spark, path, updates, ["k"])
    before = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    merge_upsert(spark, path, updates, ["k"])  # same batch replayed
    after = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert before == after == {(1, "A"), (2, "b")}


def test_merge_upsert_recovers_from_crash_between_renames(spark, tmp_path):
    import os

    from flink_recommendation_system_spark.sources.warehouse import (
        merge_upsert,
    )

    path = str(tmp_path / "model4")
    seed = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    merge_upsert(spark, path, seed, ["k"])
    # simulate a crash between the two swap renames: target gone,
    # .old holds the only copy of the table
    os.rename(path, path + ".old")
    updates = spark.createDataFrame([(2, "B"), (3, "c")], ["k", "v"])
    n = merge_upsert(spark, path, updates, ["k"])
    assert n == 3
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    # the pre-crash rows MUST survive the replay — not just the batch
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_merge_upsert_null_delete_flag_upserts(spark, tmp_path):
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from flink_recommendation_system_spark.sources.warehouse import (
        merge_upsert,
    )

    path = str(tmp_path / "model5")
    seed = spark.createDataFrame([(1, "a")], ["k", "v"])
    merge_upsert(spark, path, seed, ["k"])
    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("v", StringType()),
            StructField("is_delete", BooleanType()),
        ]
    )
    # NULL flag (e.g. a JSON batch missing the field) must UPSERT the
    # key, not silently tombstone it
    updates = spark.createDataFrame([(1, "A", None)], schema)
    n = merge_upsert(spark, path, updates, ["k"], delete_col="is_delete")
    assert n == 1
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "A")}


def test_sentence_split_udtf(spark):
    """Spark-4 Python UDTF (the TableFunction slot of §2.10): lateral
    per-document sentence expansion; null text yields no rows."""
    from flink_recommendation_system_spark.functions.pandas_fns import (
        sentence_split_udtf,
    )

    spark.udtf.register("sentence_split_t", sentence_split_udtf())
    spark.createDataFrame(
        [(1, "A b. C d? E!"), (2, None), (3, "  ")],
        "doc_id long, text string",
    ).createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        "SELECT doc_id, s.sentence_idx, s.sentence "
        "FROM udtf_docs, LATERAL sentence_split_t(doc_id, text) s "
        "ORDER BY doc_id, sentence_idx"
    ).collect()
    assert [(r["doc_id"], r["sentence_idx"], r["sentence"]) for r in rows] == [
        (1, 0, "A b"),
        (1, 1, "C d"),
        (1, 2, "E"),
    ]


def test_documents_jsonl_roundtrip(spark, tmp_path):
    """JSONL corpus source: parquet documents → JSONL shards → identical
    rows through the corpus-operator contract; malformed lines drop (or
    fail under strict)."""
    import pytest

    from flink_recommendation_system_spark.sources.tables import (
        load_documents_jsonl,
        load_table,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    path = str(tmp_path / "shards")
    docs.coalesce(2).write.mode("overwrite").json(path)
    back = load_documents_jsonl(spark, path)
    sym = back.exceptAll(docs).union(docs.exceptAll(back))
    assert sym.count() == 0

    # hand-written shard with a malformed line (appending to a
    # Spark-written part file would invalidate its .crc sidecar)
    import json as _json
    import os

    bad = str(tmp_path / "bad")
    os.makedirs(bad)
    with open(f"{bad}/shard-0.jsonl", "w") as fh:
        for r in docs.collect():
            fh.write(_json.dumps(r.asDict()) + "\n")
        fh.write('{"doc_id": broken\n')
    lax = load_documents_jsonl(spark, bad)
    assert lax.count() == docs.count()  # malformed line dropped
    with pytest.raises(Exception):
        load_documents_jsonl(spark, bad, strict=True).count()


def test_documents_jsonl_strict_drops_idless_rows(spark, tmp_path):
    import os

    d = str(tmp_path / "s")
    os.makedirs(d)
    with open(f"{d}/x.jsonl", "w") as fh:
        fh.write('{"doc_id": 1, "text": "a"}\n')
        fh.write('{"text": "no id"}\n')
    from flink_recommendation_system_spark.sources.tables import (
        load_documents_jsonl,
    )

    rows = load_documents_jsonl(spark, d, strict=True).collect()
    assert [r["doc_id"] for r in rows] == [1]
