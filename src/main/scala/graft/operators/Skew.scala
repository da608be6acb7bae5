package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100TB path.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting is the
  * explicit fallback for pathological hot keys (one key >> one partition)
  * and for hash-partitioned stages AQE can't split. Correctness is
  * unaffected by the salt: the big side gets a pseudo-random salt per ROW,
  * the small side is replicated across every salt value, so each (key,
  * salt) bucket joins exactly once.
  *
  * Measured head-to-head (r16 `aqe_skew` ledger, BASELINE.md: 10M rows,
  * one 50%-hot key, SMJ forced, checksums equal): AQE split 2.3 s vs
  * 4.6 s unsplit vs **1.7 s salted** — leave AQE's split on as the
  * no-code default, reach for [[saltedJoin]] when one pathological key
  * dominates or the stage shape is one AQE cannot split. (The window-
  * based as-of/sessionize family is NOT served by AQE at all — see
  * [[Temporal.asofJoin]]'s note and the same ledger.)
  */
object Skew {

  /** Salted equi-join: decomposes each hot key's rows across `salts`
    * shuffle partitions. Use when one join key dominates (e.g. null-ish
    * defaults, celebrity entities). Small side grows x salts — keep it the
    * dimension side. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // the small side is replicated `salts`×, so any join type that preserves
    // unmatched SMALL-side rows (right/full) would emit them `salts` times
    // null-extended — silently wrong. Only big-side-preserving types are safe.
    val safe = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
    require(safe.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/semi/anti join types, not '$joinType' " +
        "(replicated small side would duplicate its unmatched rows)")
    // DETERMINISTIC salt — a hash of the row's own columns. The previous
    // spark_partition_id()+monotonically_increasing_id() salt changed
    // under partial stage recompute (fetch-failure retry re-orders rows),
    // so a row's shuffle bucket could differ between attempts and rows
    // were duplicated or lost (the SPARK-23207 class of corruption) on
    // exactly the hot-key path this operator serves. Fully identical
    // rows share a salt — acceptable: they are interchangeable, and
    // salting targets KEY-level hotness, which payload variety spreads.
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)).cast("int"))
    val expandedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(expandedSmall, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Per-key frequency profile — decide whether salting is worth it
    * (top key count vs. rows/partition budget). Ties at the `topN` cut
    * break on the key columns ascending (the vocabulary convention), so
    * a recorded profile — and any salting decision derived from it — is
    * reproducible at any parallelism. */
  def keySkewProfile(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc +: keys.map(k => col(k).asc): _*)
      .limit(topN)
}
