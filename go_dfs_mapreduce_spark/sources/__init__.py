"""Ingestion/egress + catalog-ops layer (SURVEY.md §2.1 DFS-command parity)."""

from .dfs_chunks import GoDfsBinDataSource, GoDfsTextDataSource
from .dfs_chunks import register as _register_chunk_sources
from .local_text import LocalTextLinesDataSource
from .warehouse import Warehouse


def register_dfs_sources(spark) -> None:
    """Register every custom source on this session (idempotent)."""
    _register_chunk_sources(spark)
    spark.dataSource.register(LocalTextLinesDataSource)


__all__ = [
    "GoDfsBinDataSource",
    "GoDfsTextDataSource",
    "LocalTextLinesDataSource",
    "Warehouse",
    "register_dfs_sources",
]
