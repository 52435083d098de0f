"""S1 as a first-class Spark data source (Spark 4 Python DataSource
API): ``spark.read.format("gitlog").load(path)``.

The reference exposes the commit scan as a library call
(``src/git-parser.ts:150-213``); Spark 4's Python DataSource API lets
the same scan participate in the engine's own source machinery
instead: one :class:`InputPartition` per repository, so Spark
schedules repo scans across executors with task-level retries and
locality, and the ordinary reader options channel carries the branch
filter. Downstream it is indistinguishable from any other source —
column pruning, caching, joins all apply.

The per-partition work reuses ``scan_repo_commits`` /
``parse_git_log_text`` — the identical NUL-framed parser behind the
driver-side (``repo_commits_df``) and mapInPandas
(``repo_commits_df_distributed``) paths, so the three ingestion
surfaces cannot diverge semantically (equality asserted in
tests/test_git_parsers.py).

Scale notes: parallelism unit = repository (for monorepos, shard by
commit range into multiple partitions carrying ``since..until``
specs — same reader shape). Repos must live on storage executors can
reach, exactly like the mapInPandas path, and the ``git_etl_spark``
package must be importable on executors (``spark-submit
--py-files``/cluster image — the standard Python-dependency channel;
``read()`` runs there).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

from ..schemas import COMMITS_SCHEMA


class RepoPartition(InputPartition):
    """One schedulable unit of scan work: a single repository."""

    def __init__(self, repo_path: str, branch: str | None):
        self.repo_path = repo_path
        self.branch = branch


class GitLogReader(DataSourceReader):
    def __init__(self, options: dict):
        paths = options.get("paths") or options.get("path") or ""
        self._paths: Sequence[str] = [p for p in paths.split(",") if p]
        self._branch = options.get("branch") or None

    def partitions(self) -> Sequence[InputPartition]:
        return [RepoPartition(p, self._branch) for p in self._paths]

    def read(self, partition: RepoPartition) -> Iterator[tuple]:
        # imported here: this body runs on executors
        from git_etl_spark.sources.git_log import scan_repo_commits

        for c in scan_repo_commits(partition.repo_path, partition.branch):
            yield (
                c["repo_name"],
                c["sha"],
                c["author_email"],
                c["author_name"],
                c["committed_at"],
                c["message"],
                c["additions"],
                c["deletions"],
                c["files_changed"],
                c["is_merge"],
                c["branch"],
                [
                    (fc["file_path"], fc["additions"], fc["deletions"])
                    for fc in c["file_changes"]
                ],
            )


class GitLogDataSource(DataSource):
    """``format("gitlog")``: options ``path``/``paths`` (comma-separated
    repo dirs) and ``branch`` (default: each repo's current branch)."""

    @classmethod
    def name(cls) -> str:
        return "gitlog"

    def schema(self) -> StructType:
        return COMMITS_SCHEMA

    def reader(self, schema: StructType) -> GitLogReader:
        return GitLogReader(self.options)


def register_gitlog_source(spark) -> None:
    """Idempotently register the gitlog format on a session."""
    spark.dataSource.register(GitLogDataSource)
