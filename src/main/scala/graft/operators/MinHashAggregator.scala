package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One-pass MinHash signature as a typed `Aggregator`: a single buffer of
  * k longs per document vs. k separate min() aggregate columns. At scale
  * this keeps the partial-aggregation row narrow and the codegen graph
  * small (64 aggregate expressions blow up the generated method size).
  *
  * Hash family: two murmur32 draws composed to 64 bits, salted per
  * position — deterministic across executors, independent of Spark's
  * expression hash so the aggregator is self-consistent standalone.
  */
final class MinHashAggregator(k: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    // double-hashing: two murmur draws, k cheap combinations — not 2k
    // string hashes per shingle
    val a = scala.util.hashing.MurmurHash3.stringHash(shingle, 0x9747b28c).toLong
    val b = scala.util.hashing.MurmurHash3.stringHash(shingle, 0x85ebca6b).toLong
    val h1 = (a << 32) | (b & 0xffffffffL)
    val h2 = (b << 32) | (a & 0xffffffffL) | 1L // odd step, full-period mod 2^64
    var i = 0
    while (i < k) {
      val h = h1 + i.toLong * h2
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** `collect_list` with a hard cap on the AGGREGATION BUFFER: keeps at
  * most `cap + 1` elements, so a group that overflows surfaces with
  * size `cap + 1` and the standard `size <= cap` guard drops it —
  * WITHOUT ever materializing the full list. Plain collect_list builds
  * the whole group in one buffer before any size filter runs: a
  * near-universal LSH bucket (10^8 boilerplate copies at corpus scale)
  * is a multi-GB single-task ArrayBuffer → executor OOM, in exactly the
  * skew case the bucket guard exists for. Element order is not
  * preserved (callers array_sort anyway). */
final class BoundedCollectLong(cap: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  private val lim = cap + 1
  override def zero: Array[Long] = Array.emptyLongArray
  override def reduce(b: Array[Long], v: Long): Array[Long] =
    if (b.length >= lim) b else b :+ v
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] =
    if (b1.length >= lim) b1
    else if (b2.length >= lim) b2
    else { val c = b1 ++ b2; if (c.length > lim) c.take(lim) else c }
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** String-id variant of [[BoundedCollectLong]]. */
final class BoundedCollectString(cap: Int)
    extends Aggregator[String, List[String], Seq[String]] {
  private val lim = cap + 1
  override def zero: List[String] = Nil
  override def reduce(b: List[String], v: String): List[String] =
    if (b.length >= lim) b else v :: b
  override def merge(b1: List[String], b2: List[String]): List[String] =
    if (b1.length >= lim) b1
    else if (b2.length >= lim) b2
    else { val c = b2 ::: b1; if (c.length > lim) c.take(lim) else c }
  override def finish(b: List[String]): Seq[String] = b
  override def bufferEncoder: Encoder[List[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[String]]()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}

/** (string id, hash) pair variant for the SimHash bucket aggregation
  * over non-long id columns. */
final class BoundedCollectStringPair(cap: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[(String, Long)]] {
  private val lim = cap + 1
  override def zero: List[(String, Long)] = Nil
  override def reduce(b: List[(String, Long)],
                      v: (String, Long)): List[(String, Long)] =
    if (b.length >= lim) b else v :: b
  override def merge(b1: List[(String, Long)],
                     b2: List[(String, Long)]): List[(String, Long)] =
    if (b1.length >= lim) b1
    else if (b2.length >= lim) b2
    else { val c = b2 ::: b1; if (c.length > lim) c.take(lim) else c }
  override def finish(b: List[(String, Long)]): Seq[(String, Long)] = b
  override def bufferEncoder: Encoder[List[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

/** (id, hash) pair variant for the SimHash bucket aggregation. */
final class BoundedCollectPair(cap: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
  private val lim = cap + 1
  override def zero: Array[(Long, Long)] = Array.empty
  override def reduce(b: Array[(Long, Long)], v: (Long, Long)): Array[(Long, Long)] =
    if (b.length >= lim) b else b :+ v
  override def merge(b1: Array[(Long, Long)], b2: Array[(Long, Long)]): Array[(Long, Long)] =
    if (b1.length >= lim) b1
    else if (b2.length >= lim) b2
    else { val c = b1 ++ b2; if (c.length > lim) c.take(lim) else c }
  override def finish(b: Array[(Long, Long)]): Array[(Long, Long)] = b
  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}

/** Element-wise vector sum + member count in ONE buffer
  * (`[sums(0..dim-1), count]`, sized lazily on first input) — the Lloyd
  * centroid step's aggregation: one packed row per cell instead of
  * k×dim individual (cell, pos, sum, count) rows. */
final class VecSumCount
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  override def zero: Array[Double] = Array.emptyDoubleArray
  override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
    val bb = if (b.isEmpty) new Array[Double](v.length + 1) else b
    var i = 0
    while (i < v.length) { bb(i) += v(i); i += 1 }
    bb(bb.length - 1) += 1
    bb
  }
  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    if (b1.isEmpty) b2
    else if (b2.isEmpty) b1
    else {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
  override def finish(b: Array[Double]): Seq[Double] = b.toSeq
  override def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object MinHashAggregator {
  /** Aggregator-based variant of Dedup.minhashSignatures: same output
    * shape (idCol, sig array<bigint>), one buffer instead of k columns. */
  def signatures(df: DataFrame, textCol: String, idCol: String,
                 k: Int = 64, shingleN: Int = 3): DataFrame = {
    val mh = udaf(new MinHashAggregator(k), Encoders.STRING)
    df.select(col(idCol), explode(Dedup.shingles(col(textCol), shingleN)).as("g"))
      .groupBy(col(idCol))
      .agg(mh(col("g")).as("sig"))
  }
}
