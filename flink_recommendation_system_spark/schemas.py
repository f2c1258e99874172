"""Fixed schemas for the engine (SURVEY.md §1).

The reference declares its types as Java POJOs / Flink tuple generics
(Review.java:6-11; Recommendations.java:28) and one explicit PyFlink row type
(kafka_stream_generator.py:28). We centralize the equivalent StructTypes here.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Core review fact: (userId, productId, review, timestamp)
# — Review.java:7-10, spliter.py:19, kafka_stream_generator.py:28.
REVIEW_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("product_id", LongType()),
        StructField("rating", DoubleType()),
        StructField("ts", LongType()),
    ]
)

# Kafka `Reviews` topic JSON value — ReviewDeserialization.java:15-17.
REVIEW_JSON_SCHEMA = StructType(
    [
        StructField("userId", LongType()),
        StructField("productId", LongType()),
        StructField("review", DoubleType()),
        StructField("timestamp", LongType()),
    ]
)

# Kafka `Output` topic JSON value — KafkaOutput.java:5-8,
# KafkaOutputSerialization.java:10-19 (recommendedProducts are stringified ids).
OUTPUT_SCHEMA = StructType(
    [
        StructField("userId", LongType()),
        StructField("recommendedProducts", ArrayType(StringType())),
    ]
)

# Model-store tables replacing Redis keys (SURVEY.md §1.1 row 5).
USER_RATINGS_SCHEMA = StructType(  # Redis userRatings:{u} → "productId:rating"
    [
        StructField("user_id", LongType()),
        StructField("product_id", LongType()),
        StructField("rating", DoubleType()),
    ]
)

TOP_PRODUCTS_SCHEMA = StructType(  # Redis topProducts set
    [
        StructField("product_id", LongType()),
        StructField("avg_rating", DoubleType()),
    ]
)

USER_RECOMMENDATIONS_SCHEMA = StructType(  # Redis UserRecommendations:{u}
    [
        StructField("user_id", LongType()),
        StructField("product_id", LongType()),
    ]
)

# Multimodal asset column group (extension, SURVEY.md §7 M4): opaque payload +
# typed metadata, the shape a 100 TB training-data pipeline carries media in.
MULTIMODAL_ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

# Driver testdata tables (TESTDATA.md) — names only; parquet carries schemas.
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
