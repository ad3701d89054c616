"""Ingestion/egress + catalog-ops layer (SURVEY.md §2.1 DFS-command parity)."""

from .warehouse import Warehouse

__all__ = ["Warehouse"]
