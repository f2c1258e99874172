"""Invariants for int8 embedding quantization (operators.similarity) —
the value oracle checks exact numbers; these pin the contract bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.similarity import (
    quantize_embeddings,
)
from tests.conftest import SF0001


def test_quantization_bounds_and_reconstruction(spark):
    emb = spark.read.parquet(f"{SF0001}/embeddings.parquet")
    q = quantize_embeddings(emb)
    rows = q.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert all(-127 <= v <= 127 for v in r["qvec"])
        if r["scale"] > 0:
            # max element quantizes to ±127 exactly
            assert max(abs(v) for v in r["qvec"]) == 127
            err = max(
                abs(x - qi * r["scale"])
                for x, qi in zip(r["orig"], r["qvec"])
            )
            assert err <= r["scale"] / 2 + 1e-12


def test_zero_vector_quantizes_to_zero_scale(spark):
    z = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 4.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["id"]: r for r in quantize_embeddings(z).collect()}
    assert got[1]["scale"] == 0.0
    assert got[1]["qvec"] == [0, 0, 0, 0]
    assert got[2]["qvec"][3] == 127  # max element pins to full range
    assert got[2]["qvec"][1] == -64  # -2/4*127 = -63.5 → half away → -64
