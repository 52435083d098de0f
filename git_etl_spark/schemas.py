"""Explicit schemas (SURVEY.md §1).

Git-domain schemas reproduce the reference's data model
(reference ``db/schema.ts:3-121``; in-flight records
``src/git-parser.ts:1-43``) with the §1.3 type mapping:
INTEGER→Long (counts can exceed int32 at 100 TB), TIMESTAMP-as-ISO-string
→ real TimestampType, BOOLEAN 0/1 → BooleanType, the in-flight nested
``FileChange[]`` → ArrayType(StructType) flattened with ``explode`` at
load. Surrogate AUTOINCREMENT keys are dropped by design; natural keys
(the reference's UNIQUE constraints) are the identity.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- git domain ---------------------------------------------------------

# reference src/git-parser.ts:15-19 (FileChange)
FILE_CHANGE_STRUCT = StructType(
    [
        StructField("file_path", StringType(), False),
        StructField("additions", LongType(), False),
        StructField("deletions", LongType(), False),
    ]
)

# reference src/git-parser.ts:1-13 (GitCommit) + db/schema.ts:4-20 (commits)
# nested file_changes kept in-flight, exploded into the file_changes table at load
COMMITS_SCHEMA = StructType(
    [
        StructField("repo_name", StringType(), False),
        StructField("sha", StringType(), False),
        StructField("author_email", StringType(), False),
        StructField("author_name", StringType(), False),
        StructField("committed_at", TimestampType(), False),
        StructField("message", StringType(), True),
        StructField("additions", LongType(), False),
        StructField("deletions", LongType(), False),
        StructField("files_changed", LongType(), False),
        StructField("is_merge", BooleanType(), False),
        StructField("branch", StringType(), True),
        StructField("file_changes", ArrayType(FILE_CHANGE_STRUCT), True),
    ]
)

# reference db/schema.ts:84-94 (file_changes), natural key (repo_name, sha, file_path)
FILE_CHANGES_SCHEMA = StructType(
    [
        StructField("repo_name", StringType(), False),
        StructField("sha", StringType(), False),
        StructField("file_path", StringType(), False),
        StructField("additions", LongType(), False),
        StructField("deletions", LongType(), False),
    ]
)

# reference src/git-parser.ts:21-29 (GitTag) + db/schema.ts:102-115 (tags)
TAGS_SCHEMA = StructType(
    [
        StructField("repo_name", StringType(), False),
        StructField("tag_name", StringType(), False),
        StructField("sha", StringType(), False),
        StructField("tagger_name", StringType(), True),
        StructField("tagger_email", StringType(), True),
        StructField("tag_date", TimestampType(), True),
        StructField("message", StringType(), True),
        StructField("is_annotated", BooleanType(), False),
    ]
)

# reference src/git-parser.ts:31-37 (Author) + db/schema.ts:69-78 (authors)
AUTHORS_SCHEMA = StructType(
    [
        StructField("email", StringType(), False),
        StructField("name", StringType(), True),
        StructField("first_commit_at", TimestampType(), True),
        StructField("last_commit_at", TimestampType(), True),
        StructField("total_commits", LongType(), False),
    ]
)

# reference db/schema.ts:54-63 (repos)
REPOS_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("language", StringType(), True),
        StructField("is_archived", BooleanType(), False),
        StructField("last_commit_at", TimestampType(), True),
        StructField("total_commits", LongType(), False),
    ]
)

# reference db/schema.ts:29-46 (pull_requests; placeholder — never written)
PULL_REQUESTS_SCHEMA = StructType(
    [
        StructField("repo_name", StringType(), False),
        StructField("pr_number", LongType(), False),
        StructField("title", StringType(), True),
        StructField("author_email", StringType(), True),
        StructField("state", StringType(), True),
        StructField("created_at", TimestampType(), True),
        StructField("merged_at", TimestampType(), True),
        StructField("closed_at", TimestampType(), True),
        StructField("additions", LongType(), True),
        StructField("deletions", LongType(), True),
        StructField("time_to_merge_hours", DoubleType(), True),
        StructField("review_comments", LongType(), True),
    ]
)

# --- driver synthetic corpus (FIXTURES.md §B, parquet-verified) ----------

CORPUS_TABLES = (
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

CORPUS_SCHEMAS: dict[str, StructType] = {
    "region": StructType(
        [
            StructField("r_regionkey", IntegerType()),
            StructField("r_name", StringType()),
        ]
    ),
    "nation": StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    ),
    "customer": StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_name", StringType()),
            StructField("c_nationkey", IntegerType()),
            StructField("c_acctbal", DoubleType()),
            StructField("c_mktsegment", StringType()),
        ]
    ),
    "supplier": StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_name", StringType()),
            StructField("s_nationkey", IntegerType()),
            StructField("s_acctbal", DoubleType()),
        ]
    ),
    "part": StructType(
        [
            StructField("p_partkey", LongType()),
            StructField("p_name", StringType()),
            StructField("p_brand", StringType()),
            StructField("p_type", StringType()),
            StructField("p_size", IntegerType()),
            StructField("p_retailprice", DoubleType()),
        ]
    ),
    "orders": StructType(
        [
            StructField("o_orderkey", LongType()),
            StructField("o_custkey", LongType()),
            StructField("o_orderstatus", StringType()),
            StructField("o_totalprice", DoubleType()),
            StructField("o_orderdate", TimestampType()),
            StructField("o_orderpriority", StringType()),
        ]
    ),
    "lineitem": StructType(
        [
            StructField("l_orderkey", LongType()),
            StructField("l_partkey", LongType()),
            StructField("l_suppkey", LongType()),
            StructField("l_linenumber", IntegerType()),
            StructField("l_quantity", DoubleType()),
            StructField("l_extendedprice", DoubleType()),
            StructField("l_discount", DoubleType()),
            StructField("l_tax", DoubleType()),
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("l_shipdate", TimestampType()),
        ]
    ),
    "events": StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    ),
    "documents": StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
            StructField("n_chars", LongType()),
        ]
    ),
    "embeddings": StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
            StructField("label", IntegerType()),
        ]
    ),
}
