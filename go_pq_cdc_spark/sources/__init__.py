from .changelog import changelog, committed_changelog, DUCKDB_CHANGELOG_CTE  # noqa: F401
