"""Multimodal column plumbing (north-star surface).

Media are opaque ``binary`` columns with typed metadata structs, processed
by Arrow-batched pandas UDFs over ``mapInPandas`` — the 100 TB pattern for
decode/resize/frame-sample stages. The container has no image/audio libs,
so the *real* decoders are stubbed behind import-tries (NotImplementedError
with a clear message), while the deterministic fake feature extractor
exercises the full Spark plumbing — schema, batching, partitioning — and
is simple enough to carry an exact DuckDB oracle.

The binary payloads are synthesized from documents.text (UTF-8 bytes), the
same trick the reference uses when it sniffs TXT vs BIN at store time and
moves bytes either way (cl/dfs_actions.go:69-74).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import table

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("last_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque media column + typed metadata struct."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("digest"),
            F.lit("text/plain").alias("media_type"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):  # pragma: no cover - stub by design
    """Real image decode — requires PIL, not present in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode needs pillow; this environment is text-only — "
            "use fake_feature_batches for pipeline plumbing"
        ) from exc
    raise NotImplementedError("wire up Image.open(BytesIO(payload)) here")


def fake_feature_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for a media feature extractor: per payload,
    byte stats any engine can recompute. Arrow-batched; one pass."""
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in payloads],
                "first_byte": [b[0] if len(b) else -1 for b in payloads],
                "last_byte": [b[-1] if len(b) else -1 for b in payloads],
                "byte_sum_mod": [sum(b) % 997 for b in payloads],
            }
        )


META_ORACLE = """
SELECT doc_id,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS digest,
  'text/plain' AS media_type
FROM documents
"""


@query("multimodal_binary_meta", oracle=META_ORACLE)
def multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    df = with_binary_payload(docs)
    return df.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.digest").alias("digest"),
        F.col("meta.media_type").alias("media_type"),
    )


# DuckDB blobs support neither [] nor substring — go through the full hex
# string instead: byte i of the blob is substr(hex(blob), 2i-1, 2).
FAKE_FEATURES_ORACLE = """
SELECT doc_id,
  CAST(n AS BIGINT) AS n_bytes,
  CAST(CASE WHEN n > 0 THEN ('0x' || substr(h, 1, 2))::INT ELSE -1 END AS INTEGER) AS first_byte,
  CAST(CASE WHEN n > 0 THEN ('0x' || substr(h, 2 * n - 1, 2))::INT ELSE -1 END AS INTEGER) AS last_byte,
  CAST(list_sum(list_transform(range(1, n + 1),
       i -> ('0x' || substr(h, 2 * i - 1, 2))::INT)) % 997 AS BIGINT) AS byte_sum_mod
FROM (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
      FROM documents)
"""


@query("multimodal_fake_features", oracle=FAKE_FEATURES_ORACLE)
def multimodal_fake_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode stage shape: binary in, features out via mapInPandas.
    Swapping fake_feature_batches for a real decoder changes nothing about
    the plan — that is the point of the plumbing test."""
    docs = table(spark, sf_dir, "documents")
    return with_binary_payload(docs).select("doc_id", "payload").mapInPandas(
        fake_feature_batches, FEATURE_SCHEMA
    )
