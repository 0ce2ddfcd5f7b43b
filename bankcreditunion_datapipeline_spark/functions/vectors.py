"""Vector math on array<float>/array<double> columns -- entirely JVM-side
(F.zip_with + F.aggregate stay inside codegen; no Python worker hop).

Used by the similarity-search and embedding-dedup operators over the
`embeddings` table (embedding ARRAY<FLOAT>).

Precision note: accumulate in DOUBLE with deterministic left-to-right
array order -- the float32 source values are cast up first, so Spark and
DuckDB (`list_dot_product(x::DOUBLE[], ...)`) agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | list[float]) -> Column:
    if isinstance(v, list):
        return F.array(*[F.lit(float(x)) for x in v])
    return v.cast("array<double>")


def dot(a: Column | list[float], b: Column | list[float]) -> Column:
    """Sequential-order dot product in double precision."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | list[float]) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | list[float], b: Column | list[float]) -> Column:
    """Cosine similarity; NULL-safe for zero vectors (returns NULL)."""
    a, b = _as_double(a), _as_double(b)
    denom = norm(a) * norm(b)
    return F.when(denom != 0, dot(a, b) / denom)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes for sign-LSH.

    Driver-side constants (n_planes x dim floats) baked into the plan as
    literals -- no broadcast needed at any scale.
    """
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def sign_bits(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH signature: bit i = (vec . plane_i) >= 0, packed into a LONG.

    Hamming distance between signatures approximates angular distance --
    the bucketing primitive for ANN search and embedding near-dedup.
    Requires len(planes) <= 63.
    """
    assert len(planes) <= 63, "signature must fit a signed 64-bit long"
    bits = [
        F.when(dot(vec, plane) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        * F.lit(2 ** i).cast("long")
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two packed 64-bit signatures (bit_count of XOR)."""
    return F.bit_count(a.bitwiseXOR(b))
