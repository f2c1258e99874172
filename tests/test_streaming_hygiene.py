"""Streaming corpus-hygiene gate: a 3-batch file replay must produce
exactly the per-document verdicts the batch `hygiene_gate` computes over
the full corpus, with accepted docs carrying redacted text."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_recommendation_system_spark.operators.bloom import bloom_fit
from flink_recommendation_system_spark.operators.text import token_ngrams
from flink_recommendation_system_spark.sources.tables import load_table
from flink_recommendation_system_spark.streaming.hygiene import (
    hygiene_gate,
    read_accepted,
    start_hygiene_stream,
)
from tests.conftest import SF0001

DECON_N = 8


def _pii_planted_docs(spark):
    """sf0.001 documents with deterministic PII planted into a slice, so
    the redaction path is exercised (mirrors the registered pii_redaction
    query's injection)."""
    docs = load_table(spark, SF0001, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    suffix = (
        F.when(did % 5 == 0, F.lit(" mail x@example.com now"))
        .when(did % 5 == 1, F.lit(" host 10.1.2.3 up"))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat("text", suffix).alias("text"))


def test_stream_matches_batch_gate(spark, tmp_path):
    docs = _pii_planted_docs(spark)
    # benchmark filter fitted on the held-out slice (the model artifact)
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    words = bloom_fit(token_ngrams(ev, DECON_N).select("ngram").distinct())

    src = str(tmp_path / "in")
    for i, (lo, hi) in enumerate([(0, 170), (170, 340), (340, 10**9)]):
        (
            train.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .json(f"{src}/b{i}")
        )
    stream = (
        spark.readStream.schema(train.schema)
        .option("maxFilesPerTrigger", 1)
        .json(f"{src}/b*")
    )
    q = start_hygiene_stream(
        stream,
        words,
        accepted_path=str(tmp_path / "acc"),
        rejected_path=str(tmp_path / "rej"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        decon_n=DECON_N,
    )
    q.processAllAvailable()
    q.stop()

    batch = hygiene_gate(train, words, decon_n=DECON_N).localCheckpoint()

    acc = read_accepted(spark, str(tmp_path / "acc"))
    got_acc = {
        (r.doc_id, r.text, r.n_email, r.n_ipv4, r.n_phone)
        for r in acc.collect()
    }
    want_acc = {
        (r.doc_id, r.redacted, r.n_email, r.n_ipv4, r.n_phone)
        for r in batch.filter(F.col("verdict") == "accept").collect()
    }
    assert got_acc == want_acc
    assert want_acc  # gate accepts something — not vacuous

    rej = spark.read.parquet(str(tmp_path / "rej"))
    got_rej = {(r.doc_id, r.verdict) for r in rej.collect()}
    want_rej = {
        (r.doc_id, r.verdict)
        for r in batch.filter(F.col("verdict") != "accept").collect()
    }
    assert got_rej == want_rej
    # both reject reasons occur on this corpus (quality + contamination)
    assert {v for _, v in want_rej} == {"quality", "contaminated"}

    # every input doc got exactly one verdict
    assert len(got_acc) + len(got_rej) == train.count()


def test_accepted_text_is_redacted(spark, tmp_path):
    from flink_recommendation_system_spark.streaming.hygiene import (
        hygiene_gate,
    )

    docs = spark.createDataFrame(
        [
            (
                1,
                "the data of table and scan join with a stream for more "
                "than ten tokens mail bob@corp.example.net ok",
            )
        ],
        ["doc_id", "text"],
    )
    out = hygiene_gate(docs, words := [0] * 16, decon_n=8, m_bits=1024).collect()
    assert len(out) == 1
    r = out[0]
    assert r.verdict == "accept"
    assert r.n_email == 1
    assert "<EMAIL>" in r.redacted and "bob@" not in r.redacted


def test_hygiene_deterministic_on_conflicting_payloads(spark, tmp_path):
    """r14 review pin (the r13 near_dup/semantic_dedup determinism fix,
    extended to the hygiene gate): a batch carrying the SAME doc_id with
    two different texts must gate the byte-wise greatest payload — an
    arbitrary-row pick could accept a different text on replay than the
    first attempt wrote."""
    # a filter fitted on an unrelated doc: neither test text is flagged
    words = bloom_fit(
        token_ngrams(
            spark.createDataFrame(
                [(0, "q w e r t y u i o p")], ["doc_id", "text"]
            ),
            DECON_N,
        ).select("ngram")
    )
    long_a = "alpha " * 40 + "text one for the gate"
    long_b = "zeta " * 40 + "text two for the gate"
    dup = spark.createDataFrame(
        [(1, long_a), (1, long_b), (2, long_a)], ["doc_id", "text"]
    )
    src = str(tmp_path / "in")
    dup.coalesce(1).write.mode("append").json(src)
    stream = (
        spark.readStream.schema(dup.schema)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = start_hygiene_stream(
        stream,
        words,
        str(tmp_path / "acc"),
        str(tmp_path / "rej"),
        str(tmp_path / "ckpt"),
        decon_n=DECON_N,
    )
    q.processAllAvailable()
    q.stop()
    acc = {
        r["doc_id"]: r["text"]
        for r in read_accepted(spark, str(tmp_path / "acc")).collect()
    }
    # doc 1 must carry the byte-wise greatest of the two payloads
    # (zeta... > alpha...), redaction-neutral on these texts
    assert acc[1] == max(long_a, long_b), acc[1][:40]
    assert acc[2] == long_a
