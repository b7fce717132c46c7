"""Skew-handling join strategies for 100 TB scale.

A single hot key (one viral user, one null-heavy foreign key) turns a
shuffle join into one straggler task. Two remedies, both declarative:

- **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in
  session.py): Spark splits oversized partitions at runtime — free, but
  only for sort-merge joins.
- **Salting** (this module): explode the build side into ``n_salts``
  replicas and scatter the probe side with a random-ish but DETERMINISTIC
  salt (hash of a unique column, not rand() — reproducibility is a
  correctness feature in a data pipeline), so the hot key's rows spread
  over ``n_salts`` tasks. Works for any equi-join, costs |build|·n_salts
  replication — use a skew-keys-only variant (salt just the hot keys,
  broadcast the rest) when the build side is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.registry import register

__all__ = ["salted_join"]


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted across ``n_salts`` sub-keys.

    ``salt_source``: a probe column whose hash picks the salt (defaults to
    the key itself plus a per-row monotonic component via xxhash64 of all
    probe columns is NOT used — pick a unique column for even spread).
    """
    src = F.col(salt_source) if salt_source else F.col(key)
    p = probe.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(n_salts)).cast("int"))
    b = build.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = p.join(b, [key, "_salt"], how)
    return out.drop("_salt")


@register(
    "skew_salted_join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_totalprice > 300000
    """,
    tags=("skew", "join"),
)
def q_salted_join(spark, sf_dir):
    """Salted fact-dim join: result must be identical to the plain join
    (salting is a pure physical rewrite) — which is exactly what the oracle
    checks."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    out = salted_join(
        li.select("l_orderkey", "l_linenumber"),
        o.select("o_orderkey", "o_orderstatus").withColumnRenamed("o_orderkey", "l_orderkey"),
        key="l_orderkey",
        n_salts=8,
        salt_source="l_linenumber",
    )
    return out.select("l_orderkey", "l_linenumber", "o_orderstatus")
