"""Join strategies for scale: bucketed co-located joins and salted skew joins.

SURVEY.md §4.2: big joins shuffle on their keys; the two levers when that
shuffle is the bottleneck at 10^12 rows are

  1. **bucketing** — pre-shuffle both tables once at write time
     (``bucketBy`` on the join key); every later join on that key is
     exchange-free (map-side, co-located). The classic fact-to-fact pattern.
  2. **salting** — when one key is hot enough to overwhelm a single task,
     explode the *small* side into K salt replicas and spread the big side's
     hot key across K tasks. AQE's skew-join splitting usually suffices;
     explicit salting is the deterministic fallback and works for non-AQE
     aggregations too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table_name: str, key: str, buckets: int = 16,
                   sort_by: str | None = None) -> None:
    """Persist as a bucketed managed table: one shuffle now, none later."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str, key: str, how: str = "inner") -> DataFrame:
    """Join two tables bucketed on ``key`` — planner elides both exchanges
    (verify: no Exchange below the SortMergeJoin in the plan)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def salted_join(
    big: DataFrame, small: DataFrame, key: str, salt: int = 8, how: str = "inner"
) -> DataFrame:
    """Skew-defused equi-join: the big side picks a random-ish (but
    deterministic) salt per row; the small side is exploded ×``salt``.

    Shuffle key becomes (key, salt) so a hot key spreads over ``salt`` tasks.
    Cost: small side inflates ×salt — use only when ``small`` is modest and
    at least one key is pathological. Row-level results are identical to a
    plain join (property-tested).
    """
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")
