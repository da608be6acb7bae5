package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** As-of and range joins verified against brute-force references on
  * randomized data (the gate rows q36/q37 add the DuckDB oracle; this
  * suite pins the semantics the oracle can't reach — forward direction,
  * tolerance, unmatched rows, bucket-boundary cases). */
class TemporalSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[2]")
      .appName("temporal-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  // randomized (key, ts) tables with planted ties and gaps
  private def randTables(seed: Int, nl: Int, nr: Int) = {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(seed)
    val left = (0 until nl).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong))
    val right = (0 until nr).map(i =>
      (1000L + i, rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong,
        rnd.nextDouble()))
    (left, right,
      left.toDF("lid", "k", "t"),
      right.toDF("rid", "k", "t", "v"))
  }

  private def bruteAsof(left: Seq[(Long, Long, Long)],
                        right: Seq[(Long, Long, Long, Double)],
                        backward: Boolean,
                        tol: Option[Long]): Map[Long, Option[Long]] =
    left.map { case (lid, k, t) =>
      val cands = right.filter(r => r._2 == k &&
        (if (backward) r._3 <= t else r._3 >= t) &&
        tol.forall(b => math.abs(t - r._3) <= b))
      val best =
        if (cands.isEmpty) None
        else {
          val bestTs =
            if (backward) cands.map(_._3).max else cands.map(_._3).min
          Some(cands.filter(_._3 == bestTs).map(_._1).max) // tie: max rid
        }
      lid -> best
    }.toMap

  test("asofJoin backward matches brute force (ties inclusive, max-tie wins)") {
    val (l, r, ldf, rdf) = randTables(7, 120, 120)
    val got = Temporal.asofJoin(ldf, rdf, "k", "t",
        rightCols = Seq("v"), tieCol = "rid")
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    assert(got == bruteAsof(l, r, backward = true, None))
  }

  test("asofJoin forward matches brute force") {
    val (l, r, ldf, rdf) = randTables(11, 100, 90)
    val got = Temporal.asofJoin(ldf, rdf, "k", "t",
        rightCols = Seq("v"), tieCol = "rid", direction = "forward")
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    assert(got == bruteAsof(l, r, backward = false, None))
  }

  test("asofJoin tolerance drops matches beyond the bound, keeps the row") {
    val (l, r, ldf, rdf) = randTables(13, 100, 40)
    val out = Temporal.asofJoin(ldf, rdf, "k", "t",
        rightCols = Seq("v"), tieCol = "rid", toleranceMicros = Some(50L))
      .select("lid", "asof_rid").collect()
    val got = out
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
      .toMap
    assert(got == bruteAsof(l, r, backward = true, Some(50L)))
    assert(out.length == 100, "left rows must survive with null matches")
    assert(got.values.exists(_.isEmpty) && got.values.exists(_.nonEmpty),
      "tolerance case must exercise both matched and dropped rows")
  }

  test("asofJoin attaches the payload of exactly the matched row") {
    val sp = spark; import sp.implicits._
    val ldf = Seq((1L, 0L, 100L)).toDF("lid", "k", "t")
    val rdf = Seq(
      (10L, 0L, 40L, "old"), (11L, 0L, 90L, "latest"), (12L, 0L, 150L, "future"))
      .toDF("rid", "k", "t", "v")
    val row = Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"), "rid")
      .select("asof_rid", "asof_v", "asof_t").collect().head
    assert(row.getLong(0) == 11L && row.getString(1) == "latest" &&
      row.getLong(2) == 90L)
  }

  test("rangeJoin matches brute force incl. boundary points") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(17)
    val pts = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(500).toLong))
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(450).toLong
      (1000L + i, rnd.nextInt(3).toLong, s, s + rnd.nextInt(120).toLong)
    }
    // plant exact boundary hits: a point AT a start and AT an end
    val pts2 = pts ++ Seq((900L, ivs.head._2, ivs.head._3),
      (901L, ivs.head._2, ivs.head._4))
    val got = Temporal.rangeJoin(
        pts2.toDF("pid", "k", "p"), ivs.toDF("iid", "k", "s", "e"),
        "k", "p", "s", "e", bucketWidth = 37L)
      .select("iid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = (for {
      (pid, pk, p) <- pts2; (iid, ik, s, e) <- ivs
      if pk == ik && p >= s && p <= e
    } yield (iid, pid)).toSet
    assert(got == exp)
    assert(got.contains((1000L, 900L)) && got.contains((1000L, 901L)),
      "inclusive boundaries")
  }

  test("rangeJoin emits each qualifying pair exactly once") {
    val sp = spark; import sp.implicits._
    // interval spanning many buckets; several points inside one interval
    val pts = Seq((1L, 0L, 5L), (2L, 0L, 250L), (3L, 0L, 499L))
      .toDF("pid", "k", "p")
    val ivs = Seq((10L, 0L, 0L, 500L)).toDF("iid", "k", "s", "e")
    val rows = Temporal.rangeJoin(pts, ivs, "k", "p", "s", "e",
      bucketWidth = 10L).collect()
    assert(rows.length == 3, s"expected 3 unique pairs, got ${rows.length}")
  }

  test("rangeJoin drops malformed intervals before the bucket fan-out") {
    val sp = spark; import sp.implicits._
    // sequence(a, b) with a > b DESCENDS in Spark — a malformed interval
    // must be filtered out, not exploded into phantom buckets
    val pts = Seq((1L, 0L, 50L)).toDF("pid", "k", "p")
    val ivs = Seq((10L, 0L, 100L, 0L), (11L, 0L, 40L, 60L))
      .toDF("iid", "k", "s", "e")
    val got = Temporal.rangeJoin(pts, ivs, "k", "p", "s", "e",
      bucketWidth = 10L).select("iid").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(11L), s"only the well-formed interval matches: $got")
  }

  test("asofJoin rejects rightCols repeating the ts/tie columns") {
    val sp = spark; import sp.implicits._
    val df = Seq((1L, 0L, 1L)).toDF("rid", "k", "t")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(df.toDF("lid", "k", "t"), df, "k", "t",
        rightCols = Seq("t"), tieCol = "rid")
    }
    assert(e.getMessage.contains("rightCols"))
  }

  test("rangeJoin rejects intervals wider than the bucket guard") {
    val sp = spark; import sp.implicits._
    val pts = Seq((1L, 0L, 5L)).toDF("pid", "k", "p")
    val ivs = Seq((10L, 0L, 0L, 1000000L)).toDF("iid", "k", "s", "e")
    val e = intercept[Exception] {
      Temporal.rangeJoin(pts, ivs, "k", "p", "s", "e", bucketWidth = 10L,
        maxBucketsPerInterval = 100).collect()
    }
    assert(e.getMessage.contains("rangeJoin") ||
      e.getCause != null && e.getCause.getMessage.contains("rangeJoin"))
  }

  test("asofJoinBroadcast equals the shuffle path in every mode") {
    val (_, _, ldf, rdf) = randTables(31, 120, 120)
    for ((dir, tol) <- Seq(("backward", None), ("forward", None),
        ("backward", Some(60L)), ("forward", Some(40L)))) {
      val a = Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"), "rid",
          direction = dir, toleranceMicros = tol)
        .select("lid", "asof_rid", "asof_t", "asof_v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      val b = Temporal.asofJoinBroadcast(ldf, rdf, "k", "t", Seq("v"), "rid",
          direction = dir, toleranceMicros = tol)
        .select("lid", "asof_rid", "asof_t", "asof_v").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getLong(2))).toSet
      assert(a == b, s"paths diverge for direction=$dir tol=$tol")
    }
  }

  test("null-ts rows never match — shuffle and broadcast paths agree") {
    val sp = spark; import sp.implicits._
    // null LEFT ts: forward's desc ordering must not let the row trail
    // every right row and pick up a phantom payload (desc default is
    // nulls LAST); null RIGHT ts rows are dropped on both paths.
    val ldf = Seq[(Long, Long, java.lang.Long)](
      (1L, 0L, 100L), (2L, 0L, null), (3L, 1L, null), (4L, 1L, 500L))
      .toDF("lid", "k", "t")
    val rdf = Seq[(Long, Long, java.lang.Long, Double)](
      (10L, 0L, 50L, 1.0), (11L, 0L, 150L, 2.0),
      (12L, 1L, 400L, 3.0), (13L, 1L, null, 9.0))
      .toDF("rid", "k", "t", "v")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("lid", "asof_rid", "asof_t", "asof_v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    for (dir <- Seq("backward", "forward")) {
      val a = run(Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"), "rid",
        direction = dir))
      val b = run(Temporal.asofJoinBroadcast(ldf, rdf, "k", "t", Seq("v"),
        "rid", direction = dir))
      assert(a == b, s"paths diverge for direction=$dir:\n a=$a\n b=$b")
      // every null-ts left row survives with NO payload at all — a
      // phantom match would populate asof_v while asof_t stays null,
      // slipping past the documented IS NOT NULL inner filter
      for (t <- a if t._1 == 2L || t._1 == 3L)
        assert(t._2.isEmpty && t._3.isEmpty && t._4.isEmpty,
          s"null-ts left row got a phantom match in direction=$dir: $t")
      assert(a.map(_._1) == Set(1L, 2L, 3L, 4L), s"left rows lost: $a")
    }
  }

  test("asofJoinSkew equals asofJoin in every mode at several widths") {
    val (_, _, ldf, rdf) = randTables(41, 150, 130)
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid", "asof_t", "asof_v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    for ((dir, tol) <- Seq(("backward", None), ("forward", None),
           ("backward", Some(60L)), ("forward", Some(40L)));
         width <- Seq(1L, 7L, 100L, 1000000L)) {
      val base = shape(Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"),
        "rid", direction = dir, toleranceMicros = tol))
      val skew = shape(Temporal.asofJoinSkew(ldf, rdf, "k", "t", Seq("v"),
        "rid", chunkWidth = width, direction = dir, toleranceMicros = tol))
      assert(skew == base,
        s"skew path diverges at dir=$dir tol=$tol width=$width")
    }
  }

  test("asofJoinSkew null-ts rows behave like the base paths") {
    val sp = spark; import sp.implicits._
    val ldf = Seq[(Long, Long, java.lang.Long)](
      (1L, 0L, 100L), (2L, 0L, null), (3L, 1L, null), (4L, 1L, 500L))
      .toDF("lid", "k", "t")
    val rdf = Seq[(Long, Long, java.lang.Long, Double)](
      (10L, 0L, 50L, 1.0), (11L, 0L, 150L, 2.0),
      (12L, 1L, 400L, 3.0), (13L, 1L, null, 9.0))
      .toDF("rid", "k", "t", "v")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select("lid", "asof_rid", "asof_v").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    for (dir <- Seq("backward", "forward")) {
      val base = run(Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"), "rid",
        direction = dir))
      val skew = run(Temporal.asofJoinSkew(ldf, rdf, "k", "t", Seq("v"),
        "rid", chunkWidth = 64L, direction = dir))
      assert(skew == base, s"null-ts handling diverges for $dir")
    }
  }

  test("asofJoinSkew handles a hot key identically (many chunks)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(47)
    // one key holds 90% of left events on a long timeline
    val left = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) rnd.nextInt(5).toLong + 1 else 0L
      (i.toLong, k, rnd.nextInt(100000).toLong)
    }
    val right = (0 until 300).map(i =>
      (9000L + i, rnd.nextInt(6).toLong, rnd.nextInt(100000).toLong,
        rnd.nextDouble()))
    val ldf = left.toDF("lid", "k", "t")
    val rdf = right.toDF("rid", "k", "t", "v")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid", "asof_t").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    for (dir <- Seq("backward", "forward")) {
      val base = shape(Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"),
        "rid", direction = dir))
      val skew = shape(Temporal.asofJoinSkew(ldf, rdf, "k", "t", Seq("v"),
        "rid", chunkWidth = 1000L, direction = dir))
      assert(skew == base, s"hot-key skew path diverges for $dir")
    }
    assert(Temporal.chunkWidthFor(ldf, "t", targetChunks = 100) >= 1L)
  }

  test("auto operators pick the skew path only under a hot key") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(61)
    val uniform = (0 until 400).map(i =>
      (i.toLong, (i % 37).toLong, rnd.nextInt(5000).toLong))
      .toDF("lid", "k", "t")
    val hot = (0 until 400).map(i =>
      (i.toLong, if (i < 350) 0L else i.toLong, rnd.nextInt(5000).toLong))
      .toDF("lid", "k", "t")
    val rdf = (0 until 80).map(i =>
      (1000L + i, (i % 37).toLong, rnd.nextInt(5000).toLong, 1.0))
      .toDF("rid", "k", "t", "v")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString
    // uniform keys: the plain single-window plan (no chunk column)
    val u = Temporal.asofJoinAuto(uniform, rdf, "k", "t", Seq("v"), "rid")
    assert(!planOf(u).contains("__chunk"), "uniform input took the skew path")
    // one key at 87%: the chunked plan
    val h = Temporal.asofJoinAuto(hot, rdf, "k", "t", Seq("v"), "rid",
      skewFactor = 1.5) // 2 test shuffle partitions: mean=200, hot key=350
    assert(planOf(h).contains("__chunk"), "hot input missed the skew path")
    // both choices produce asofJoin's exact semantics
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    assert(shape(h) == shape(
      Temporal.asofJoin(hot, rdf, "k", "t", Seq("v"), "rid")))
    // sessionize mirrors
    val su = Temporal.sessionizeAuto(uniform, "k", "t", gapMicros = 300L)
    val sh = Temporal.sessionizeAuto(hot, "k", "t", gapMicros = 300L,
      skewFactor = 1.5)
    assert(!planOf(su).contains("__chunk") && planOf(sh).contains("__chunk"))
    def sshape(d: org.apache.spark.sql.DataFrame) =
      d.select("lid", "session_seq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sshape(sh) == sshape(
      Temporal.sessionize(hot, "k", "t", gapMicros = 300L)))
  }

  test("skew variants handle negative timelines (floor division sign)") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(59)
    // timestamps straddle zero: floorDiv must floor (not truncate
    // toward zero) or chunk -1..-w would alias chunk 0..w
    val left = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(2000).toLong - 1000L))
    val right = (0 until 120).map(i =>
      (1000L + i, rnd.nextInt(3).toLong, rnd.nextInt(2000).toLong - 1000L,
        rnd.nextDouble()))
    val ldf = left.toDF("lid", "k", "t")
    val rdf = right.toDF("rid", "k", "t", "v")
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "asof_rid", "asof_t").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    for (dir <- Seq("backward", "forward"); width <- Seq(7L, 128L)) {
      val base = shape(Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"),
        "rid", direction = dir))
      val skew = shape(Temporal.asofJoinSkew(ldf, rdf, "k", "t", Seq("v"),
        "rid", chunkWidth = width, direction = dir))
      assert(skew == base, s"negative-timeline divergence dir=$dir w=$width")
    }
    def sshape(d: org.apache.spark.sql.DataFrame) =
      d.select("lid", "session_seq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (width <- Seq(7L, 128L)) {
      val base = sshape(Temporal.sessionize(ldf, "k", "t", gapMicros = 50L))
      val skew = sshape(Temporal.sessionizeSkew(ldf, "k", "t",
        gapMicros = 50L, chunkWidth = width))
      assert(skew == base, s"negative-timeline sessionize divergence w=$width")
    }
  }

  test("sessionizeSkew equals sessionize incl. boundary ties") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(53)
    // clustered timestamps with planted duplicates, one hot key
    val rows = (0 until 3000).map { i =>
      val k = if (i % 5 == 0) rnd.nextInt(4).toLong + 1 else 0L
      val t = rnd.nextInt(300) * 100L + (if (rnd.nextBoolean()) 0L else 7L)
      (i.toLong, k, t)
    }
    val df = rows.toDF("eid", "k", "t")
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.select("eid", "session_seq").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (width <- Seq(1L, 50L, 100L, 999L, 100000L)) {
      val base = shape(Temporal.sessionize(df, "k", "t", gapMicros = 150L))
      val skew = shape(Temporal.sessionizeSkew(df, "k", "t",
        gapMicros = 150L, chunkWidth = width))
      assert(skew == base, s"sessionizeSkew diverges at width=$width")
    }
  }

  test("asofJoinBroadcast never shuffles the left side") {
    val sp = spark; import sp.implicits._
    val ldf = (0 until 50).map(i => (i.toLong, i % 3L, i.toLong * 7))
      .toDF("lid", "k", "t")
    val rdf = (0 until 50).map(i => (100L + i, i % 3L, i.toLong * 5, 0.5))
      .toDF("rid", "k", "t", "v")
    val phys = Temporal.asofJoinBroadcast(ldf, rdf, "k", "t", Seq("v"), "rid")
      .queryExecution.executedPlan.toString
    // the join must be broadcast — a sort-merge or shuffled-hash join
    // would shuffle the (corpus-scale) left side; the only permitted
    // hash exchange is the RIGHT side's dimension-size history packing
    assert(phys.contains("BroadcastHashJoin"),
      s"broadcast as-of must plan a BroadcastHashJoin:\n$phys")
    assert(!phys.contains("SortMergeJoin") &&
      !phys.contains("ShuffledHashJoin"),
      s"left side shuffled in the broadcast as-of path:\n$phys")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(phys).length
    assert(hashEx <= 1, s"unexpected extra shuffles ($hashEx):\n$phys")
  }

  test("intervalOverlapJoin matches brute force, one row per pair") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(29)
    val as = (0 until 80).map { i =>
      val s = rnd.nextInt(400).toLong
      (i.toLong, rnd.nextInt(3).toLong, s, s + rnd.nextInt(100).toLong)
    }
    val bs = (0 until 80).map { i =>
      val s = rnd.nextInt(400).toLong
      (500L + i, rnd.nextInt(3).toLong, s, s + rnd.nextInt(100).toLong)
    }
    val got = Temporal.intervalOverlapJoin(
        as.toDF("aid", "k", "as0", "ae0"), bs.toDF("bid", "k", "bs0", "be0"),
        "k", "as0", "ae0", "bs0", "be0", bucketWidth = 33L)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val exp = (for {
      (aid, ak, s1, e1) <- as; (bid, bk, s2, e2) <- bs
      if ak == bk && s1 <= e2 && s2 <= e1
    } yield (aid, bid)).toSet
    assert(got.toSet == exp)
    assert(got.length == got.toSet.size, "each pair must appear exactly once")
    assert(exp.nonEmpty)
  }

  test("sessionize matches brute force and tags every row") {
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(2000).toLong))
    val got = Temporal.sessionize(rows.toDF("id", "k", "t"), "k", "t", 50L)
      .select("id", "session_seq").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exp = rows.groupBy(_._2).flatMap { case (_, g) =>
      val sorted = g.sortBy(r => (r._3, r._1))
      var seq = 0L; var prev = Long.MinValue
      sorted.map { case (id, _, t) =>
        if (prev == Long.MinValue || t - prev > 50L) seq += 1
        prev = t
        id -> seq
      }
    }
    assert(got.size == 300)
    // session BOUNDARIES must agree (ordinals are order-dependent only
    // through the boundary rule, so they agree too given unique (k,t))
    assert(got == exp)
  }

  test("temporal plans stay free of nested-loop joins") {
    val sp = spark; import sp.implicits._
    val ldf = (0 until 50).map(i => (i.toLong, i % 3L, i.toLong * 7))
      .toDF("lid", "k", "t")
    val rdf = (0 until 50).map(i => (100L + i, i % 3L, i.toLong * 5, 0.5))
      .toDF("rid", "k", "t", "v")
    val plans = Seq(
      Temporal.asofJoin(ldf, rdf, "k", "t", Seq("v"), "rid"),
      Temporal.rangeJoin(ldf.select(col("lid"), col("k"), col("t").as("p")),
        rdf.select(col("rid"), col("k"), col("t").as("s"),
          (col("t") + 40L).as("e")),
        "k", "p", "s", "e", bucketWidth = 16L))
    plans.foreach { df =>
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"),
        s"nested-loop join leaked into a temporal plan:\n$phys")
    }
  }

  test("sampled key profile decides like the full pass (skewed + uniform)") {
    // 400k rows so the 5% sample (~20k) clears the trust floor and the
    // sampled path actually engages (small inputs fall back to exact)
    val n = 400000L
    val skewed = spark.range(n).select(col("id").as("eid"),
      when(col("id") % 10 < 9, 0L) // one key at 90%
        .otherwise(pmod(col("id"), lit(97L)) + 1L).as("k"))
    val uniform = spark.range(n).select(col("id").as("eid"),
      pmod(col("id"), lit(100L)).as("k"))
    for (frac <- Seq(0.05, 0.2)) {
      assert(Temporal.profileIsHot(skewed, "k", 1.5, frac) ==
        Temporal.profileIsHot(skewed, "k", 1.5, 1.0),
        s"skewed decision flipped at fraction $frac")
      assert(Temporal.profileIsHot(uniform, "k", 1.5, frac) ==
        Temporal.profileIsHot(uniform, "k", 1.5, 1.0),
        s"uniform decision flipped at fraction $frac")
    }
    assert(Temporal.profileIsHot(skewed, "k", 1.5, 1.0))
    assert(!Temporal.profileIsHot(uniform, "k", 1.5, 1.0))
  }

  test("asofJoinBroadcast refuses an over-limit right side, loudly") {
    val sp = spark; import sp.implicits._
    val ldf = (0 until 20).map(i => (i.toLong, i % 3L, i.toLong * 7))
      .toDF("lid", "k", "t")
    val rdf = (0 until 50).map(i => (100L + i, i % 3L, i.toLong * 5, 0.5))
      .toDF("rid", "k", "t", "v")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoinBroadcast(ldf, rdf, "k", "t", Seq("v"), "rid",
        broadcastLimitRows = Some(10L))
    }
    assert(e.getMessage.contains("broadcastLimitRows") &&
      e.getMessage.contains("asofJoinSkew"),
      s"guard message must name the limit and the fix: ${e.getMessage}")
    // session-conf override is honored
    spark.conf.set("graft.asof.broadcastLimitRows", "10")
    try intercept[IllegalArgumentException] {
      Temporal.asofJoinBroadcast(ldf, rdf, "k", "t", Seq("v"), "rid")
    } finally spark.conf.unset("graft.asof.broadcastLimitRows")
    // within the limit: runs
    assert(Temporal.asofJoinBroadcast(ldf, rdf, "k", "t", Seq("v"), "rid",
      broadcastLimitRows = Some(1000L)).count() == 20L)
  }

  test("sessionize family: null-ts rows kept with null session_seq on every path") {
    val sp = spark; import sp.implicits._
    val rows: Seq[(Long, Long, Option[Long])] = Seq(
      (1L, 0L, Some(100L)), (2L, 0L, None), (3L, 0L, Some(500L)),
      (4L, 1L, None), (5L, 1L, Some(10L)), (6L, 0L, Some(120L)))
    val df = rows.toDF("eid", "k", "t")
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.select("eid", "session_seq").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
    // key 0: ts 100,120 co-session (gap 20), 500 starts session 2;
    // key 1: ts 10 is session 1; null-ts rows carry NULL, not an
    // arbitrary ordinal, and do not perturb the others
    val want = Set((1L, 1L), (6L, 1L), (3L, 2L), (5L, 1L),
      (2L, -1L), (4L, -1L))
    assert(shape(Temporal.sessionize(df, "k", "t", 100L)) == want)
    for (w <- Seq(7L, 1000L))
      assert(shape(Temporal.sessionizeSkew(df, "k", "t", 100L, w)) == want,
        s"skew path diverges on null ts at width=$w")
    // the auto operator's physical choice can never change row counts
    assert(shape(Temporal.sessionizeAuto(df, "k", "t", 100L)) == want)
  }

  test("sessionize family: string timelines order NUMERICALLY and agree on every path") {
    val sp = spark; import sp.implicits._
    // the window orders by the POST-CAST timeline value: a numeric-
    // string column must session by its numeric order ("9" < "100"),
    // not lexicographically ("100" < "9"), and the skew path (which
    // keys chunks on the cast value) must agree exactly
    val rows = Seq(
      (1L, 0L, "9"), (3L, 0L, "100"), (4L, 0L, "500"), (5L, 1L, "42"))
    val df = rows.toDF("eid", "k", "t")
    def shape(d: org.apache.spark.sql.DataFrame) =
      d.select("eid", "session_seq").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
    // key 0 at gap 100: 9 and 100 co-session (diff 91), 500 opens
    // session 2 — lexicographic ordering would visit 100, 500, 9 and
    // split 9 into its own session
    val want = Set((1L, 1L), (3L, 1L), (4L, 2L), (5L, 1L))
    assert(shape(Temporal.sessionize(df, "k", "t", 100L)) == want)
    for (w <- Seq(7L, 1000L))
      assert(shape(Temporal.sessionizeSkew(df, "k", "t", 100L, w)) == want,
        s"skew path diverges on string ts at width=$w")
    assert(shape(Temporal.sessionizeAuto(df, "k", "t", 100L)) == want)
    // an UNPARSEABLE value fails loudly (ANSI cast) on BOTH paths —
    // never a silent per-path divergence in row counts or ordinals
    val bad = (rows :+ (2L, 0L, "n/a")).toDF("eid", "k", "t")
    def castError(body: => Unit): Unit = {
      val e = intercept[Exception](body)
      val msgs = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString(" | ")
      assert(msgs.contains("CAST_INVALID_INPUT"), msgs)
    }
    castError(Temporal.sessionize(bad, "k", "t", 100L).collect())
    castError(Temporal.sessionizeSkew(bad, "k", "t", 100L, 7L).collect())
  }
}
