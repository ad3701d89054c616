"""Reusable column-expression builders (pure pyspark.sql.functions —
JVM-side, whole-stage-codegen friendly; no Python UDFs in this package)."""
