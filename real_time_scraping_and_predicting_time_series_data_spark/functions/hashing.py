"""Cross-engine universal hashing over a 60-bit md5-derived base hash.

The MinHash and count-min pipelines hash strings once (md5 prefix) and then
apply k integer "permutations" ``perm_i(h) = (a_i*h + b_i) mod p``. Two
requirements pull in opposite directions:

- **Quality at 100 TB**: a 32-bit base hash has birthday collisions among
  distinct shingles/tokens roughly every 2^16 values — routine at corpus
  scale — which inflates Jaccard estimates and correlates CMS counters.
  The base hash must be much wider.
- **Cross-engine bit-reproducibility**: the same arithmetic must evaluate
  identically in Spark SQL and DuckDB with only BIGINT math — no 128-bit
  intermediates, no overflow UB.

Solution: h = first 15 hex digits of md5 (60 bits, < p), p = 2^61-1 (the
Mersenne prime M61), and an overflow-safe modular multiply that exploits
2^61 ≡ 1 (mod p). For a < 2^30 and 0 ≤ h < 2^61:

    z  = a * (h >> 31)                    # < 2^60
    zm = ((z & (2^30-1)) << 31) + (z >> 30)   # ≡ z * 2^31 (mod p), < 2^61 + 2^30
    a*h ≡ zm + a * (h & (2^31-1))         # each term < 2^62 → BIGINT-safe
    perm = ((zm % p) + a*(h & (2^31-1))) % p + b, all reduced mod p

Both the Column form (Spark) and the SQL-text form (DuckDB oracle) below
compute exactly this, so signatures, buckets, and counters are bit-identical
across engines. a_i is drawn from [1, 2^30) — a restricted-universal family
(full universality would need a up to p-1, which would overflow); b_i from
[0, 2^30). The restriction costs nothing measurable for dedup/sketch use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["M61", "md5_60", "md5_60_sql", "mulmod61", "mulmod61_sql", "perm61", "perm61_sql"]

M61 = (1 << 61) - 1
_LO30 = (1 << 30) - 1
_LO31 = (1 << 31) - 1


def md5_60(s: Column | str) -> Column:
    """60-bit base hash: first 15 hex digits of md5, as a non-negative long."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def md5_60_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_60`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def mulmod61(a: int, h: Column) -> Column:
    """(a * h) mod M61 without 64-bit overflow; requires 1 <= a < 2^30."""
    if not 1 <= a < (1 << 30):
        raise ValueError(f"a must be in [1, 2^30), got {a}")
    z = F.lit(a) * F.shiftrightunsigned(h, 31)
    zm = F.shiftleft(z.bitwiseAND(F.lit(_LO30)), 31) + F.shiftrightunsigned(z, 30)
    return (zm % F.lit(M61) + F.lit(a) * h.bitwiseAND(F.lit(_LO31))) % F.lit(M61)


def mulmod61_sql(a: int, h: str) -> str:
    """DuckDB twin of :func:`mulmod61` (same op order, BIGINT-only)."""
    if not 1 <= a < (1 << 30):
        raise ValueError(f"a must be in [1, 2^30), got {a}")
    z = f"({a} * (({h}) >> 31))"
    zm = f"((({z} & {_LO30}) << 31) + ({z} >> 30))"
    return f"(({zm} % {M61} + {a} * (({h}) & {_LO31})) % {M61})"


def perm61(a: int, b: int, h: Column) -> Column:
    """Universal-hash permutation (a*h + b) mod M61, overflow-safe."""
    return (mulmod61(a, h) + F.lit(b)) % F.lit(M61)


def perm61_sql(a: int, b: int, h: str) -> str:
    return f"(({mulmod61_sql(a, h)} + {b}) % {M61})"
