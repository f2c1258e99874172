"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference Flink recommendation system
(MariuszPaluch2001/Flink-recommendation-system), re-expressed Spark-first.

Layers (mirroring the reference's lambda architecture, SURVEY.md §0):

- ``plans.top_products``    — batch layer A (ProductReviewAggregation.java:24-61)
- ``plans.recommendations`` — batch layer B (Recommendations.java:22-81)
- ``streaming.pipeline``    — speed layer (RealTimeRecommendations.java:34-71)
- ``operators.*``           — the full operator inventory (SURVEY.md §2) plus
  LLM-data-pipeline extensions (dedup, similarity search, text analysis,
  multimodal columns) designed for 100 TB scale.

Everything is public PySpark DataFrame/SQL/Structured-Streaming API; no
custom Catalyst rules, no external packages.
"""

__version__ = "0.1.0"
