package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Scale-guard over the whole query surface: no relational or pipeline
  * query may plan an all-pairs join (BroadcastNestedLoopJoin /
  * CartesianProduct) — those are O(n²) scale-killers that stay invisible
  * at test scale factors. Every pair-producing operator must go through a
  * bucketed / banded candidate path instead.
  */
class PlanCheckSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def planOf(name: String): String =
    (graft.queries.Relational.queries ++ graft.queries.Relational2.queries)(name)(
      spark, sfDir).queryExecution.executedPlan.toString

  test("q01: two-phase aggregation with pruned column scan") {
    val plan = planOf("q01_agg_pricing")
    assert(plan.contains("partial_sum"), "map-side combine missing")
    // projection pruning reaches the parquet scan: the 16-column lineitem
    // scan must read only the aggregation's columns
    assert(plan.contains("ReadSchema: struct<l_quantity"), plan.take(500))
    assert(!plan.contains("l_orderkey"), "q01 scan reads columns it never uses")
  }

  test("q02: filters push to the scan, dimension side broadcasts") {
    val plan = planOf("q02_join_agg_topk")
    assert(plan.contains("BroadcastHashJoin"))
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      "segment filter not pushed to the customer scan")
    assert(plan.contains("TakeOrdered"), "top-k should avoid a full sort")
  }

  test("q03: star joins broadcast every dimension") {
    val plan = planOf("q03_star_join")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      "star dimensions should broadcast, not shuffle")
    assert(!plan.contains("SortMergeJoin"), "no shuffle join expected in the star")
  }

  test("q18: IN-list predicate pushes into the scan") {
    val plan = planOf("q18_in_pruning")
    assert(plan.contains("In(n_name"), "IN-list not pushed to the nation scan")
  }

  private def pipelinePlanOf(name: String): String =
    graft.queries.PipelineOps.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  test("p34: vocabulary combines map-side and takes top-k without a full sort") {
    val plan = pipelinePlanOf("p34_vocabulary")
    assert(plan.contains("partial_count"), "map-side combine missing")
    assert(plan.contains("TakeOrdered"), "top-k should avoid a full sort")
  }

  test("p31: the source aggregate broadcasts back onto the documents") {
    val plan = pipelinePlanOf("p31_source_filter")
    assert(plan.contains("BroadcastHashJoin"),
      "per-source means should broadcast, not shuffle the documents")
    assert(!plan.contains("SortMergeJoin"), plan.take(800))
  }

  test("public Similarity ANN surface never plans an all-pairs join") {
    // sweep the entry points a user reaches for at scale: every lshTopKJoin
    // form (recompute / in-memory index / durable index, broadcast and
    // shuffle variants) and the single-query index probes. cosineTopKJoin
    // is deliberately absent — it is the documented brute-force baseline
    // (an intentional crossJoin, capped by maxQueries).
    val sp = spark; import sp.implicits._
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 30L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.where(org.apache.spark.sql.functions.col("vec_id") < 3)
    val idx = graft.operators.Similarity.buildIndex(corpus, "embedding",
      "vec_id", planes = 4, persist = false)
    val ivf = graft.operators.Similarity.buildIvfIndex(corpus, "embedding",
      "vec_id", k = 4, iters = 1, persist = false)
    val qv = Seq.fill(8)(0.5f)
    val surface: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "lshTopKJoin/recompute/broadcast" -> graft.operators.Similarity
        .lshTopKJoin(queries, corpus, "embedding", "vec_id", k = 2,
          planes = 4, probeBits = 2),
      "lshTopKJoin/recompute/shuffle" -> graft.operators.Similarity
        .lshTopKJoin(queries, corpus, "embedding", "vec_id", k = 2,
          planes = 4, probeBits = 2, broadcastQueries = false),
      "lshTopKJoin/index/broadcast" -> graft.operators.Similarity
        .lshTopKJoin(queries, idx, k = 2, probeBits = 2,
          broadcastQueries = true),
      "lshTopKJoin/index/shuffle" -> graft.operators.Similarity
        .lshTopKJoin(queries, idx, k = 2, probeBits = 2,
          broadcastQueries = false),
      "AnnIndex.topK" -> idx.topK(qv, k = 2, probeBits = 1),
      "IvfIndex.topK" -> ivf.topK(qv, k = 2, nProbe = 2),
      "ivfTopKJoin/broadcast" -> graft.operators.Similarity
        .ivfTopKJoin(queries, ivf, k = 2, nProbe = 2),
      "ivfTopKJoin/shuffle" -> graft.operators.Similarity
        .ivfTopKJoin(queries, ivf, k = 2, nProbe = 2,
          broadcastQueries = false),
      "lshTopK" -> graft.operators.Similarity.lshTopK(corpus, "embedding",
        "vec_id", qv, k = 2, planes = 4))
    val offenders = surface.flatMap { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"all-pairs join planned in Similarity surface: ${offenders.mkString(", ")}")
  }

  test("no p-/q-query plans an all-pairs join") {
    val queries = (graft.queries.Relational.queries ++
      graft.queries.Relational2.queries ++
      graft.queries.PipelineOps.queries ++
      graft.queries.TemporalQueries.queries)
    val offenders = queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val plan = q(spark, sfDir).queryExecution.executedPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"all-pairs join planned in: ${offenders.mkString(", ")}")
  }

  test("spread: idempotent directly above the scan, but re-spreads when " +
    "a buried repartition no longer governs output partitioning") {
    import org.apache.spark.sql.catalyst.plans.logical.Repartition
    import org.apache.spark.sql.functions._
    val target = spark.sparkContext.defaultParallelism
    val df = spark.range(100).toDF("id")
    val once = Dedup.spread(df)
    assert(once.queryExecution.analyzed.isInstanceOf[Repartition])
    // wrapping again (even under narrow ops) must not add a second
    // exchange — the governing repartition is visible through them
    val twice = Dedup.spread(once.select(col("id") * 2 as "id2")
      .filter(col("id2") >= 0))
    assert(twice.queryExecution.analyzed.collect {
      case r: Repartition => r }.size == 1,
      "spread re-shuffled a plan already governed by a wide repartition")
    // an aggregation ABOVE the spread resets the output partitioning;
    // the buried Repartition must not suppress re-spreading (the old
    // plan-wide exists() falsely skipped here)
    val agg = once.groupBy((col("id") % 7).as("k")).count().coalesce(1)
    val respread = Dedup.spread(agg)
    respread.queryExecution.analyzed match {
      case r: Repartition => assert(r.shuffle && r.numPartitions >= target)
      case other => fail(s"buried repartition suppressed the spread: $other")
    }
  }
}
