"""MapReduce-parity job layer (SURVEY.md §2.2 F1-F9).

Reproduces the reference's plugin contract — ``F_map(file, line_number,
line) -> [(k, v), ...]`` and a partition-wide ``F_reduce(keys, values) ->
[lines]`` with a declared reducer count R — on Spark, as one declarative
pipeline instead of the reference's 15-stage TCP choreography
(SURVEY.md §3.1).
"""

from .job import (
    MapReduceJob,
    read_dfs_chunks_with_line_numbers,
    read_text_with_line_numbers,
)

__all__ = [
    "MapReduceJob",
    "read_dfs_chunks_with_line_numbers",
    "read_text_with_line_numbers",
]
