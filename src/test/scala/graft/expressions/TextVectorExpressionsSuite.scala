package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Pins the WordNgramsExpr kernel element-for-element against the
  * transform/slice/concat_ws composition it replaced — including the
  * whitespace edge cases where SQL trim (spaces only) and Java
  * Pattern.split(-1) (leading/trailing empty tokens) have sharp corners.
  * A drifted gram string would silently change every dedup bucket. */
class TextVectorExpressionsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("text-vector-expr-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** The replaced composition, inlined as the executable spec. */
  private def wordNgramsOld(text: Column, n: Int): Column = {
    val words = split(trim(text), "\\s+")
    if (n == 1) words
    else when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  private val edgeDocs = Seq(
    "the quick brown fox jumps",
    "one",
    "",
    "   ",                       // all spaces → trim → "" → [""]
    "a\n",                       // trailing \n survives SQL trim → ["a", ""]
    "\t x",                      // leading \t → leading empty token
    "  padded  with   runs  ",
    "a b  c\td\ne f",
    "exact exact exact exact",
    "ünïcode tökens здесь 中文 字")

  test("WordNgramsExpr equals the old composition for n in 1..4 on edge docs") {
    val sp = spark; import sp.implicits._
    val df = edgeDocs.toDF("t")
    (1 to 4).foreach { n =>
      val rows = df.select(
        graft.functions.TextFunctions.wordNgrams(col("t"), n).as("k"),
        wordNgramsOld(col("t"), n).as("o")).collect()
      rows.zip(edgeDocs).foreach { case (r, doc) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n doc=${doc.replace("\n", "\\n").replace("\t", "\\t")}")
      }
    }
  }

  test("kernel grams drive identical minhash shingle sets") {
    val sp = spark; import sp.implicits._
    val df = edgeDocs.filter(_.trim.nonEmpty).toDF("t")
    val rows = df.select(
      array_sort(graft.operators.Dedup.shingles(col("t"), 2)).as("k"),
      array_sort(array_distinct(wordNgramsOld(col("t"), 2))).as("o")).collect()
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
  }

  /** The historical explode → xxhash64 → groupBy(k mins) signature
    * pipeline, inlined as the spec for MinHashSig. */
  private def minhashSigsOld(df: org.apache.spark.sql.DataFrame, k: Int,
                             n: Int): Map[Long, Seq[Long]] = {
    val P = 2147483647L
    def mix(x: Long): Long = {
      var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val exploded = df
      .select(col("id"), explode(array_distinct(wordNgramsOld(col("t"), n))).as("g"))
      .select(col("id"), pmod(xxhash64(col("g")), lit(P)).as("h"))
    val minCols = (0 until k).map { i =>
      val a = java.lang.Math.floorMod(mix(i.toLong), P - 1) + 1
      val b = java.lang.Math.floorMod(mix(i.toLong + 7919), P)
      min(pmod(lit(a) * col("h") + lit(b), lit(P))).as(s"h$i")
    }
    exploded.groupBy(col("id")).agg(minCols.head, minCols.tail: _*)
      .select(col("id"), array((0 until k).map(i => col(s"h$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
  }

  test("quality kernels equal their filter/aggregate compositions bit-for-bit") {
    val sp = spark; import sp.implicits._
    import graft.functions.TextFunctions
    val docs = edgeDocs ++ Seq(
      "the cat sat on the mat with a hat for the win",
      "der hund und die katze sind nicht zu haus",
      "le chat est sur le toit et la lune est pour nous",
      "mixed the der le el words for fun und que")
    val df = docs.toDF("t")
    // old compositions inlined as the spec
    val toks = split(trim(col("t")), "\\s+")
    val swOld = size(filter(toks, x =>
        x.isin(TextFunctions.EnglishStopwords: _*))).cast("double") /
      size(toks).cast("double")
    val mtOld = aggregate(transform(toks, x => length(x)), lit(0),
      (acc, x) => acc + x).cast("double") / size(toks).cast("double")
    val lToks = split(trim(lower(col("t"))), "\\s+")
    val entries = TextFunctions.langProfiles.toSeq.sortBy(_._1).map {
      case (lang, words) => struct(
        (-size(filter(lToks, x => x.isin(words.toSeq.sorted: _*)))).as("neg"),
        lit(lang).as("lang"))
    }
    val bestOld = element_at(sort_array(array(entries: _*)), 1)
    val lidOld = when(bestOld.getField("neg") === 0, lit("und"))
      .otherwise(bestOld.getField("lang"))
    val rows = df.select(
      TextFunctions.stopwordRatio(col("t")).as("swK"), swOld.as("swO"),
      TextFunctions.meanTokenLength(col("t")).as("mtK"), mtOld.as("mtO"),
      TextFunctions.langId(col("t")).as("liK"), lidOld.as("liO")).collect()
    rows.zip(docs).foreach { case (r, d) =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), s"stopword: $d")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)), s"meanlen: $d")
      assert(r.getString(4) == r.getString(5), s"langId: $d")
    }
  }

  test("HashedGramsExpr equals the array_sort/array_distinct/xxhash64 composition") {
    val sp = spark; import sp.implicits._
    val df = edgeDocs.toDF("t")
    val bridge = org.apache.spark.sql.GraftColumnBridge
    (1 to 3).foreach { n =>
      val rows = df.select(
        bridge.column(HashedGramsExpr(bridge.expression(col("t")), n)).as("k"),
        array_sort(array_distinct(
          transform(wordNgramsOld(col("t"), n), g => xxhash64(g)))).as("o"))
        .collect()
      rows.zip(edgeDocs).foreach { case (r, doc) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n doc=${doc.replace("\n", "\\n").replace("\t", "\\t")}")
      }
    }
  }

  test("SortedIntersectCount equals size(array_intersect) on sorted sets") {
    val sp = spark; import sp.implicits._
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val rnd = new scala.util.Random(42)
    val cases = (0 until 50).map { _ =>
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    } ++ Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq.empty[Long]),
      (Seq(Long.MinValue, 0L, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    val rows = cases.toDF("a", "b").select(
      bridge.column(SortedIntersectCount(
        bridge.expression(col("a")), bridge.expression(col("b")))).as("k"),
      size(array_intersect(col("a"), col("b"))).as("o")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("PositionalEqCount equals the zip_with/filter/size composition") {
    val sp = spark; import sp.implicits._
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val rnd = new scala.util.Random(7)
    // same-length pairs (the MinHash shape: both sigs have k elements),
    // with heavy value collisions so agreement counts are non-trivial
    val cases = (0 until 60).map { _ =>
      val k = 1 + rnd.nextInt(64)
      (Seq.fill(k)(rnd.nextInt(5).toLong), Seq.fill(k)(rnd.nextInt(5).toLong))
    } ++ Seq(
      (Seq.empty[Long], Seq.empty[Long]),
      (Seq(Long.MinValue, Long.MaxValue), Seq(Long.MinValue, Long.MaxValue)))
    val rows = cases.toDF("a", "b").select(
      bridge.column(PositionalEqCount(
        bridge.expression(col("a")), bridge.expression(col("b")))).as("k"),
      size(filter(zip_with(col("a"), col("b"), (x, y) =>
        when(x === y, 1).otherwise(0)), v => v === 1)).as("o")).collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("hashed-set jaccard equals string-set jaccard on the edge corpus") {
    val sp = spark; import sp.implicits._
    val bridge = org.apache.spark.sql.GraftColumnBridge
    // every doc pair: jaccard over hashedShingles vs over string shingles
    // must produce the SAME double (same intersect/union counts feeding
    // the same division) — the verify-join rewrite's core claim
    val df = edgeDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val g = df.select(col("id"),
      graft.operators.Dedup.shingles(col("t"), 2).as("gs"),
      bridge.column(HashedGramsExpr(bridge.expression(col("t")), 2)).as("gh"))
    // both-empty pairs are excluded: union=0 divides by zero under ANSI,
    // and the production verify paths never form them (gramless docs are
    // dropped by the isNotNull signature filter / produce no index rows)
    val pairs = g.as("x").crossJoin(g.as("y"))
      .where(col("x.id") < col("y.id") &&
        size(col("x.gs")) + size(col("y.gs")) > 0)
    val cS = size(array_intersect(col("x.gs"), col("y.gs")))
    val cH = bridge.column(SortedIntersectCount(
      bridge.expression(col("x.gh")), bridge.expression(col("y.gh"))))
    val rows = pairs.select(
      (cS.cast("double") /
        (size(col("x.gs")) + size(col("y.gs")) - cS).cast("double")).as("js"),
      (cH.cast("double") /
        (size(col("x.gh")) + size(col("y.gh")) - cH).cast("double")).as("jh"))
      .collect()
    rows.foreach { r =>
      val (js, jh) = (r.getDouble(0), r.getDouble(1))
      assert(java.lang.Double.doubleToLongBits(js) ==
        java.lang.Double.doubleToLongBits(jh), s"$js vs $jh")
    }
    assert(rows.nonEmpty)
  }

  test("SortedLongPairs equals the transform/slice/flatten composition") {
    val sp = spark; import sp.implicits._
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val rnd = new scala.util.Random(99)
    val cases = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(12))(rnd.nextInt(1000).toLong).distinct.sorted) ++
      Seq(Seq.empty[Long], Seq(7L), Seq(1L, 2L))
    def lambdaPairs(s: org.apache.spark.sql.Column) =
      flatten(transform(s, (x, i) =>
        transform(
          slice(s, i.cast("int") + lit(2),
            greatest(size(s) - i.cast("int") - 1, lit(0))),
          y => struct(x.as("d1"), y.as("d2")))))
    val rows = cases.toDF("s").select(
      bridge.column(SortedLongPairs(bridge.expression(col("s")))).as("k"),
      lambdaPairs(col("s")).as("o")).collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(p => (p.getLong(0), p.getLong(1)))
      val o = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1)))
      assert(k == o, "pair emission order/content must be identical")
    }
  }

  test("SortedIdFpPairs equals the struct composition with inline hamming") {
    val sp = spark; import sp.implicits._
    val bridge = org.apache.spark.sql.GraftColumnBridge
    val rnd = new scala.util.Random(101)
    // sorted (id, fp) struct lists, incl. duplicate ids (self-pair case),
    // empty, singleton, identical fingerprints (hamming 0), and full-flip
    val cases: Seq[Seq[(Long, Long)]] = (0 until 30).map(_ =>
      Seq.fill(rnd.nextInt(12))((rnd.nextInt(50).toLong, rnd.nextLong()))
        .sorted) ++ Seq(
      Seq.empty[(Long, Long)],
      Seq((7L, 0xdeadbeefL)),
      Seq((1L, 0L), (1L, 0L), (2L, -1L)),
      Seq((3L, Long.MinValue), (4L, Long.MaxValue)))
    def lambdaPairs(s: org.apache.spark.sql.Column) =
      flatten(transform(s, (x, i) =>
        transform(
          slice(s, i.cast("int") + lit(2),
            greatest(size(s) - i.cast("int") - 1, lit(0))),
          y => struct(x.getField("i").as("d1"), y.getField("i").as("d2"),
            bit_count(x.getField("h").bitwiseXOR(y.getField("h")))
              .as("hamming")))))
    val rows = cases.map(c => Tuple1(c)).toDF("raw")
      .select(transform(col("raw"),
        x => struct(x.getField("_1").as("i"), x.getField("_2").as("h")))
        .as("s"))
      .select(
        bridge.column(SortedIdFpPairs(bridge.expression(col("s")))).as("k"),
        lambdaPairs(col("s")).as("o")).collect()
    rows.foreach { r =>
      val k = r.getSeq[org.apache.spark.sql.Row](0)
        .map(p => (p.getLong(0), p.getLong(1), p.getInt(2)))
      val o = r.getSeq[org.apache.spark.sql.Row](1)
        .map(p => (p.getLong(0), p.getLong(1), p.getInt(2)))
      assert(k == o, "pair emission order/content/hamming must be identical")
    }
  }

  test("MinHashSig kernel equals the explode/groupBy signature pipeline") {
    val sp = spark; import sp.implicits._
    val docs = edgeDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "t")
    Seq((16, 2), (64, 2), (32, 3)).foreach { case (k, n) =>
      val old = minhashSigsOld(df, k, n)
      val kern = graft.operators.Dedup
        .minhashSignatures(df.select(col("id"), col("t").as("text")), "text", "id", k, n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(kern.keySet == old.keySet, s"row sets differ (k=$k n=$n)")
      old.foreach { case (id, sig) =>
        assert(kern(id) == sig, s"signature differs for id=$id (k=$k n=$n)")
      }
    }
  }

  test("MinHashSigFromHashes over HashedGrams equals MinHashSig over text") {
    // the r20 one-pass fusion contract: deriving the signature from the
    // already-hashed (sorted DISTINCT) gram array must be bit-identical
    // to hashing the text directly — min over the distinct set = min
    // over the multiset — including the NULL-for-gramless-docs row-set
    // rule (empty array → null sig, exactly like a too-short doc)
    val sp = spark; import sp.implicits._
    val df = edgeDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Seq((16, 2), (64, 2), (32, 3), (64, 8)).foreach { case (k, n) =>
      val direct = graft.operators.Dedup
        .minhashSignatures(df, "text", "id", k, n)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val derived = df.select(col("id"),
          graft.operators.Dedup.sigFromGrams(
            graft.operators.Dedup.hashedShingles(col("text"), n), k).as("sig"))
        .where(col("sig").isNotNull)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(derived.keySet == direct.keySet,
        s"row sets differ (k=$k n=$n): gramless-doc NULL contract broken")
      direct.foreach { case (id, sig) =>
        assert(derived(id) == sig, s"signature differs for id=$id (k=$k n=$n)")
      }
    }
  }
}
