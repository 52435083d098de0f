"""Git-domain ETL pipeline — SURVEY.md §2.5 A1/A2, §2.2 K5, §2.8 O1-O4.

The reference's per-repo dataflow (``main.ts:79-144``) as DataFrame
construction: parse → nested commits frame → explode file_changes →
derive authors / repos / summary → staged multi-table publish.

Design decisions carried from SURVEY §7.3:

- A1 author "latest name": the reference's comment says latest but its
  loop keeps the oldest (``src/transforms.ts:27``); the documented
  intent wins here via ``max_by(author_name, committed_at)``.
- K5/A2 git-log order dependence (newest-first ``commits[0]``) becomes
  explicit ``max``/``min`` — order-independent by construction.
- Surrogate AUTOINCREMENT keys are dropped; natural keys are identity.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import count_if
from ..sinks.upsert import (
    publish_all,
    upsert_parquet,
    upsert_parquet_partitioned,
    write_staging,
)
from ..sources.git_log import (
    has_commits_by_author,
    list_tracked_files,
    repo_commits_df,
)
from ..sources.git_tags import repo_tags_df
from ..sources.language import detect_language

GIT_TABLES = ("commits", "file_changes", "authors", "repos", "tags")


def explode_file_changes(commits: DataFrame) -> DataFrame:
    """Nested → flat (reference flattens at load, ``src/database.ts:163-175``):
    ``select(sha, explode(file_changes))`` + natural-key dedup (K3)."""
    return (
        commits.select(
            "repo_name",
            "sha",
            F.explode("file_changes").alias("fc"),
        )
        .select(
            "repo_name",
            "sha",
            F.col("fc.file_path").alias("file_path"),
            F.col("fc.additions").alias("additions"),
            F.col("fc.deletions").alias("deletions"),
        )
        .dropDuplicates(["repo_name", "sha", "file_path"])
    )


def aggregate_authors(commits: DataFrame) -> DataFrame:
    """A1/K2: per-author stats re-aggregated exactly from commits
    (reference ``src/transforms.ts:11-39`` + ``src/database.ts:105-130``)."""
    return commits.groupBy(F.col("author_email").alias("email")).agg(
        F.expr("max_by(author_name, committed_at)").alias("name"),
        F.min("committed_at").alias("first_commit_at"),
        F.max("committed_at").alias("last_commit_at"),
        F.count("*").alias("total_commits"),
    )


def repo_metadata(commits: DataFrame, languages: dict[str, str | None]) -> DataFrame:
    """K5: per-repo metadata with explicit max() instead of the
    reference's newest-first positional assumption (``src/database.ts:83``)."""
    spark = commits.sparkSession
    lang_rows = [(k, v) for k, v in languages.items()]
    lang_df = spark.createDataFrame(
        lang_rows, "name string, language string"
    )
    per_repo = commits.groupBy(F.col("repo_name").alias("name")).agg(
        F.max("committed_at").alias("last_commit_at"),
        F.count("*").alias("total_commits"),
    )
    return (
        per_repo.join(F.broadcast(lang_df), "name", "left")
        .withColumn("is_archived", F.lit(False))
        .select(
            "name", "language", "is_archived", "last_commit_at", "total_commits"
        )
    )


def summary_stats(commits: DataFrame) -> DataFrame:
    """A2 global summary (reference ``src/transforms.ts:41-62``) as a
    single order-independent aggregate row."""
    return commits.agg(
        F.count("*").alias("total_commits"),
        F.sum("additions").alias("total_additions"),
        F.sum("deletions").alias("total_deletions"),
        F.sum("files_changed").alias("total_files_changed"),
        count_if(F.col("is_merge")).alias("merge_commits"),
        F.countDistinct("author_email").alias("unique_authors"),
        F.struct(
            F.date_format(F.min("committed_at"), "yyyy-MM-dd").alias("from"),
            F.date_format(F.max("committed_at"), "yyyy-MM-dd").alias("to"),
        ).alias("date_range"),
    )


def format_summary_report(stats_row) -> str:
    """O4 report formatter (reference ``src/transforms.ts:64-86``)."""
    dr = stats_row["date_range"]
    return "\n".join(
        [
            "=== Git ETL Summary ===",
            f"Commits:        {stats_row['total_commits']}",
            f"Additions:      {stats_row['total_additions']}",
            f"Deletions:      {stats_row['total_deletions']}",
            f"Files changed:  {stats_row['total_files_changed']}",
            f"Merge commits:  {stats_row['merge_commits']}",
            f"Unique authors: {stats_row['unique_authors']}",
            f"Date range:     {dr['from']} .. {dr['to']}",
        ]
    )


def etl_repos(
    spark: SparkSession,
    repo_paths: list[str],
    output_dir: str,
    author_pattern: str | None = None,
    layout: str = "flat",
) -> dict:
    """O1/O2: multi-repo ETL into a five-table Parquet warehouse with
    idempotent natural-key merges and K6 staged publish. Returns a run
    report (per-repo success/skip/fail counts — the reference's
    summary banner, ``main.ts:357-369``).

    ``layout='partitioned'`` is the at-scale warehouse shape: the
    repo-keyed tables (commits / file_changes / tags) are laid out
    ``partitionBy(repo_name)`` and incremental merges rewrite only the
    partitions of repos present in the batch
    (``upsert_parquet_partitioned``); the global tables (authors,
    repos) still merge whole — they are node-scale, not fact-scale.
    Both layouts produce identical table *contents* (asserted in
    tests/test_git_etl_e2e.py)."""
    report = {"processed": [], "skipped": [], "failed": []}
    selected: list[str] = []
    for path in repo_paths:
        try:
            if author_pattern and not has_commits_by_author(path, author_pattern):
                report["skipped"].append(path)  # F2 gate
                continue
            selected.append(path)
        except Exception as exc:  # noqa: BLE001 — O2 per-repo fail isolation
            report["failed"].append({"repo": path, "error": str(exc)})

    if not selected:
        return report

    commits = repo_commits_df(spark, selected)
    if commits.isEmpty():  # F3 zero-commit guard
        report["skipped"].extend(selected)
        return report
    commits = commits.dropDuplicates(["repo_name", "sha"]).cache()

    languages = {
        os.path.basename(p.rstrip("/")): detect_language(list_tracked_files(p))
        for p in selected
    }

    tables = {
        "commits": commits.drop("file_changes"),
        "file_changes": explode_file_changes(commits),
        "authors": aggregate_authors(commits),
        "repos": repo_metadata(commits, languages),
        "tags": repo_tags_df(spark, selected),
    }
    keys = {
        "commits": ["repo_name", "sha"],
        "file_changes": ["repo_name", "sha", "file_path"],
        "authors": ["email"],
        "repos": ["name"],
        "tags": ["repo_name", "tag_name"],
    }

    partitioned = {"commits", "file_changes", "tags"} if layout == "partitioned" else set()

    out = lambda t: os.path.join(output_dir, t)  # noqa: E731
    if any(os.path.exists(out(t)) for t in GIT_TABLES):
        # incremental run: per-table natural-key merge (idempotent)
        for t, df in tables.items():
            keep = "first" if t == "file_changes" else "last"
            if t in partitioned:
                upsert_parquet_partitioned(
                    spark, df, out(t), keys[t], "repo_name", keep=keep
                )
            else:
                upsert_parquet(spark, df, out(t), keys[t], keep=keep)
    else:
        # first run: stage everything, then publish all-or-nothing (K6)
        staged = {
            write_staging(
                df.dropDuplicates(keys[t]),
                out(t),
                partition_col="repo_name" if t in partitioned else None,
            ): out(t)
            for t, df in tables.items()
        }
        publish_all(staged)

    report["processed"] = selected
    report["summary"] = summary_stats(commits).collect()[0].asDict(recursive=True)
    commits.unpersist()
    return report
