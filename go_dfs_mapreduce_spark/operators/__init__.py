"""DataFrame query pipelines, one module per capability family.

Each module registers ``(spark, sf_dir) -> DataFrame`` builders plus DuckDB
oracle SQL into :mod:`go_dfs_mapreduce_spark.registry`.
"""
