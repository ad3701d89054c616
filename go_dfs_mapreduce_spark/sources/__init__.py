"""Ingestion/egress + catalog-ops layer (SURVEY.md §2.1 DFS-command parity)."""

from .dfs_chunks import GoDfsBinDataSource, GoDfsTextDataSource
from .dfs_chunks import register as register_dfs_sources
from .warehouse import Warehouse

__all__ = [
    "GoDfsBinDataSource",
    "GoDfsTextDataSource",
    "Warehouse",
    "register_dfs_sources",
]
