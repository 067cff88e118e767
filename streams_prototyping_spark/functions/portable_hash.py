"""Engine-portable deterministic hashing.

The dedup/fingerprint operators need a hash function that BOTH Spark
and the DuckDB oracle compute identically, so the correctness harness
can hash-compare results. Spark's ``hash()``/``xxhash64()`` and
DuckDB's ``hash()`` are different algorithms, so we build one from md5
(identical hex output everywhere): take the first 15 hex digits
(60 bits — fits a signed 64-bit int) and parse as an integer.

Spark:  conv(substring(md5(s), 1, 15), 16, 10) :: long
DuckDB: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)
Python: int(hashlib.md5(s).hexdigest()[:15], 16)

MinHash "permutations" are realized as salt-prefixed hashes
(md5(salt || s)) rather than the classic (a*h+b) mod p universal-hash
family: equally uniform, and it sidesteps 64-bit overflow semantics
that differ between engines (Spark wraps, DuckDB errors).

Scale note: md5 is ~3x slower than xxhash64 but still JVM-side and
whole-stage-codegen'd; fine for the dedup path where the shuffle, not
the hash, dominates. Hot paths that don't need oracle parity should
use xxhash64.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

# The one home of the hash formula in SQL-string form (ADVICE r8: the
# Spark/DuckDB split-hash idiom was duplicated in similarity.py and
# inlined a third time in records.py's oracle — any drift between
# copies silently breaks oracle parity). ``{expr}`` must already be a
# string-typed SQL expression in the target dialect.
PORTABLE_HASH64_SPARK_TPL = (
    "CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
)
PORTABLE_HASH64_DUCK_TPL = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def portable_hash64(col: Column) -> Column:
    """60-bit non-negative hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """Same hash as DuckDB SQL over expression ``expr``."""
    return PORTABLE_HASH64_DUCK_TPL.format(expr=expr)


def portable_hash64_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def salted_hash(col: Column, salt: int) -> Column:
    """Per-permutation minhash function: 60-bit hash of salt-prefixed
    string. Portable: md5 is identical across engines and overflow
    never occurs (result < 2^60)."""
    return portable_hash64(F.concat(F.lit(f"perm{salt}:"), col))


def salted_hash_sql(expr: str, salt: int) -> str:
    return portable_hash64_sql(f"'perm{salt}:' || {expr}")
