"""Reusable column-expression helpers (all JVM-side built-ins)."""

from icebergplus_spark.operators.dedup import minhash_signature, shingles
from icebergplus_spark.operators.similarity import cosine, dot

__all__ = ["shingles", "minhash_signature", "dot", "cosine"]
