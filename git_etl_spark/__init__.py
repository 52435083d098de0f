"""git_etl_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the query and data-processing
capabilities of the reference git-analytics ETL (BridgerB/git-etl,
surveyed in /root/repo/SURVEY.md) as idiomatic PySpark: declarative
DataFrame/SQL plans optimized by Catalyst, columnar Parquet storage,
and Structured Streaming for event data.

Layout
------
- ``session``    : SparkSession factory tuned for local dev and documented
                   for large-cluster deployment.
- ``schemas``    : explicit StructTypes for the git domain and the synthetic
                   star-schema corpus (SURVEY.md §1).
- ``io``         : Parquet readers for the test corpus.
- ``registry``   : query + oracle registration (the driver contract).
- ``sources``    : git ingestion (log/tag parsers, repo discovery, config).
- ``operators``  : relational query pack, dedup, similarity, text analysis,
                   multimodal plumbing, windowed/event analytics.
- ``sinks``      : idempotent natural-key upsert on Parquet (merge semantics).
- ``streaming``  : Structured Streaming versions of the event analytics.
"""

__version__ = "0.1.0"
