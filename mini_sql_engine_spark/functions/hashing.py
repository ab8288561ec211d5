"""Engine-portable hashing primitives for dedup operators.

All hashes are built from md5 (present in both Spark and DuckDB with
identical output), truncated to 15 hex digits = a 60-bit non-negative
long — verified bit-for-bit equal between `F.conv(substr(md5(x),1,15),
16, 10)` and DuckDB `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
xxhash64/hash() would be faster but engine-specific; dedup correctness
is oracle-checked, so portability wins here. Everything stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

SIMHASH_BITS = 60  # md5-derived hash width; keeps simhash in a positive long


def md5_long(col: Column, salt: str | None = None) -> Column:
    """60-bit hash of a string column (optionally salted: 'salt:value')."""
    if salt is not None:
        col = F.concat(F.lit(f"{salt}:"), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signature(shingles: Column, k: int) -> Column:
    """k-permutation MinHash signature of a distinct-shingle array.

    Permutation i is simulated by salting the hash with i; the signature
    component is the min hash over the set — the standard construction.
    Returns an array<long> of length k, computed per-row in codegen.
    """
    def _component(salt: str) -> Column:
        # NB: the transform lambda must be UNARY. A two-parameter
        # lambda (e.g. `lambda s, i=i:` to capture the loop var) is
        # treated by PySpark as transform's (element, index) binary
        # form — the body's second name is then bound to the JVM
        # index Column, and str() of it leaks a session-counter-
        # dependent variable name into the salt: a wrong AND
        # nondeterministic hash family (caught as a once-per-many-runs
        # banding flake on the lowest-similarity pair).
        return F.array_min(F.transform(shingles, lambda s: md5_long(s, salt)))

    return F.array(*[_component(str(i)) for i in range(k)])


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Split a signature into `bands` bands of `rows` values; each band
    key is md5 over the comma-joined values (portable, collision-safe
    enough at 128 bits). Returns array<string> of length `bands`."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[signature[b * rows + r].cast("string") for r in range(rows)],
                )
            )
            for b in range(bands)
        ]
    )


def simhash(token_hash: Column, bits: int = SIMHASH_BITS) -> list[Column]:
    """Per-bit ±1 vote expressions for a grouped simhash aggregation.

    Usage: explode tokens → h = md5_long(token) → groupBy(doc).agg of
    these sums → combine with `simhash_from_votes`.
    """
    return [
        F.sum(
            F.when(F.shiftright(token_hash, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]


def simhash_from_votes(bits: int = SIMHASH_BITS) -> Column:
    """Combine vote columns v0..v{bits-1} into the simhash long."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_band(sim: Column, band: int, band_bits: int) -> Column:
    """Extract band `band` (15-bit default chunks) from a simhash long."""
    return F.shiftright(sim, band * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1))
