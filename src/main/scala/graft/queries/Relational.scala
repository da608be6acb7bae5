package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface (SURVEY.md §2.b): the full delegated Spark
  * surface the reference guarantees to user code — joins (inner/left/semi/
  * anti), aggregations, windows, set ops, distinct/top-k, scalar functions,
  * rollup, pivot, subquery patterns. Each query has a DuckDB oracle with
  * IDENTICAL column names and deterministic ordering.
  *
  * Numeric-determinism policy: sums over `double` columns are computed on
  * `DECIMAL(18,n)` casts (exact, associative — immune to partial-aggregation
  * order differences between Spark and DuckDB) and cast back to `double` at
  * the end, yielding bit-identical results.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** On-storage size of a table — driver-side FS metadata, no job.
    * 0 on any failure (gates that consume this must fail CLOSED to the
    * un-optimized path). */
  private def parquetBytes(dir: String, name: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      fs.getContentSummary(p).getLength
    } catch { case _: Exception => 0L }

  /** EXACT row count from the parquet footer (row-group metadata) —
    * driver-side, no Spark job. */
  private def parquetRows(s: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val conf = s.sparkContext.hadoopConfiguration
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getRecordCount finally r.close()
  }

  /** q02's bloom gate (guide §3.2): below this orders-table size the
    * customer⋈orders side broadcasts and lineitem never shuffles, so the
    * bloom build would be pure overhead. Data-size-adaptive (same plan
    * at any core count); env-overridable for deployments with different
    * broadcast budgets. */
  private val bloomMinOrdersBytes: Long =
    org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      sys.env.getOrElse("SPARK_GRAFT_Q02_BLOOM_MIN_ORDERS_BYTES", "200m"))

  /** Exact sum of a double column: sum over DECIMAL(18,scale), as double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation (TPC-H Q1 shape: full-scan groupBy w/ map-side combine)
    "q01_agg_pricing" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- 3-way join + agg + top-k (Q3 shape). customer is deliberately
    // NOT hint-broadcast: it is SF-proportional (150k rows × SF), so a
    // pinned hint would FORCE a broadcast at 100× scale — tripping the
    // 8 GB broadcast hard cap or OOMing the driver — where AQE, left to
    // its size estimate, broadcasts it at small SF and degrades cleanly
    // to a shuffle join at large SF. PlanCheckSuite still pins the BHJ
    // at sf0.1 sizes (now AQE-chosen, not forced).
    "q02_join_agg_topk" -> ((s, dir) => {
      val cust  = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord   = t(s, dir, "orders")
      val li0   = t(s, dir, "lineitem")
      val co = cust.join(ord, col("c_custkey") === col("o_custkey"))
      // Bloom pre-filter of the lineitem side (r21, guide §3.2 / VERDICT
      // r20 #4), SCALE-GATED: the BUILDING filter keeps ~1/5 of
      // customers, so ~4/5 of lineitem rows have no matching order — yet
      // once orders outgrows the broadcast threshold the join shuffles
      // ALL of lineitem. A Bloom filter over the surviving o_orderkeys
      // (one cheap extra pass over the customer⋈orders join, 2 narrow
      // columns) drops definitely-non-matching lineitem rows BEFORE the
      // exchange. False positives just ride to the inner join and fail
      // there; no false negatives — the RESULT is bit-identical (the
      // oracle replay pins it). Spark's own runtime bloom
      // (SPARK-32268) does not fire here: the creation side's estimate
      // exceeds its 10 MB threshold.
      // The gate is DATA-size-adaptive, not core-count-tuned: below
      // `SPARK_GRAFT_Q02_BLOOM_MIN_ORDERS_BYTES` (default 200 MB of
      // orders parquet — sf0.1 is 2.6 MB, the 100× rig 260 MB) AQE
      // broadcasts one side and lineitem never shuffles, so the bloom
      // would be pure overhead; past it the shuffle it prunes dwarfs the
      // build pass. At a fixed SF the query runs the same plan at any
      // core count.
      if (parquetBytes(dir, "orders") < bloomMinOrdersBytes)
        // small-SF shape (historical): AQE broadcasts, nothing to prune
        co.join(li0, col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_orderkey")
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      else {
        // Bloom sizing: expectedItems = orders rows × the BUILDING
        // customer fraction (one narrow pushed-down count over the
        // customer table — ~1/10 of orders rows — instead of sizing for
        // ALL orders, which made each map task's partial filter 5×
        // larger and the treeAggregate merge shuffle with it), ×1.25
        // slack because order-per-customer counts are not exactly
        // uniform; an undersized filter only raises fpp (extra rows ride
        // to the join and fail there — still correct).
        // putLong(o_orderkey) on the build side, raw l_orderkey on the
        // probe side: same 64-bit value domain by construction.
        import org.apache.spark.util.sketch.BloomFilter
        val nOrders = math.max(1L, parquetRows(s, dir, "orders"))
        val nCust = math.max(1L, parquetRows(s, dir, "customer"))
        val nBuilding = math.max(1L, cust.count())
        val expected = math.max(1L,
          (nOrders.toDouble * nBuilding / nCust * 1.25).toLong)
        val keys = co.select(col("o_orderkey"))
          .where(col("o_orderkey").isNotNull)
          .queryExecution.toRdd.map(_.getLong(0))
        val bf = keys.treeAggregate(BloomFilter.create(expected, 0.02))(
          (f, v) => { f.putLong(v); f },
          (a, b) => a.mergeInPlace(b),
          depth = 2)
        val bos = new java.io.ByteArrayOutputStream()
        bf.writeTo(bos)
        val bridge = org.apache.spark.sql.GraftColumnBridge
        // codegen'd predicate (no per-row UDF): the same
        // BloomFilterMightContain the runtime-filter rule injects
        val might = bridge.column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            bridge.expression(lit(bos.toByteArray)),
            bridge.expression(col("l_orderkey"))))
        // Aggregate BEFORE the join (guide §2.3 "aggregate before you
        // shuffle"): every aggregated column comes from lineitem and
        // customer⋈orders is UNIQUE per o_orderkey (o_orderkey is the
        // orders key; each order has one customer), so the join is a
        // pure key filter and sum-per-key commutes with it — the
        // shuffle carries one partially-summed DECIMAL row per
        // (orderkey × map task) instead of every line row. The sum is
        // DECIMAL(18,4) (exact, associative), so the regrouping cannot
        // change a single bit of the revenue. Proven against the DuckDB
        // oracle with the gate forced on (OPTIMIZATION_r21.md).
        val liAgg = li0.where(might)
          .groupBy(col("l_orderkey"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4).as("revenue"))
        co.select(col("o_orderkey"))
          .join(liAgg, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey"), col("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      }
    }),

    // ---- star join through region→nation→customer→orders (Q5 shape).
    // nation/region keep their hints (constant-size: 25 / 5 rows at ANY
    // SF); customer must NEVER be hint-broadcast — it grows with SF and
    // the pinned hint would force a 100×-scale broadcast past the 8 GB
    // cap. AQE broadcasts it while small and shuffles it when not.
    "q03_star_join" -> ((s, dir) => {
      val reg = t(s, dir, "region")
      val nat = t(s, dir, "nation")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      ord
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("o_totalprice")).as("total_sales"),
             count(lit(1)).as("order_cnt"))
        .orderBy("r_name", "n_name")
    }),

    // ---- left outer join preserving zero-order customers
    "q04_left_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("order_cnt"),
             coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
        .orderBy("c_custkey")
    }),

    // ---- left-semi join (EXISTS)
    "q05_semi_join" -> ((s, dir) => {
      val cust = t(s, dir, "customer")
      val bigOrders = t(s, dir, "orders").filter(col("o_totalprice") > 100000.0)
      cust.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // ---- left-anti join (NOT EXISTS)
    "q06_anti_join" -> ((s, dir) => {
      val part = t(s, dir, "part")
      val li = t(s, dir, "lineitem")
      part.join(li, col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    }),

    // ---- window: top-2 orders per customer by price (rank in partition)
    "q07_window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // ---- window: running total per customer over time
    "q08_window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_total",
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "running_total")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- set ops: UNION (distinct) then EXCEPT
    "q09_set_ops" -> ((s, dir) => {
      val building = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("custkey"))
      val withOrders = t(s, dir, "orders").select(col("o_custkey").as("custkey"))
      val bigBal = t(s, dir, "customer").filter(col("c_acctbal") > 9000.0)
        .select(col("c_custkey").as("custkey"))
      building.union(withOrders).distinct().except(bigBal).orderBy("custkey")
    }),

    // ---- set op: INTERSECT
    "q10_intersect" -> ((s, dir) => {
      val f = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .select(col("o_custkey").as("custkey"))
      f.intersect(o).orderBy("custkey")
    }),

    // ---- distinct + order + limit (top-k dedup)
    "q11_distinct_topk" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .distinct()
        .orderBy("o_orderpriority", "o_orderstatus")
        .limit(20)
    }),

    // ---- scalar string/date/math functions (codegen'd built-ins, no UDFs)
    "q12_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          (col("p_retailprice") * 1.1).cast(DecimalType(18, 2)).cast("double").as("inflated"),
          (col("p_size") % 7).as("size_mod"))
        .orderBy("p_partkey")
    }),

    // ---- date functions + aggregation by year/month
    "q13_date_agg" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("o_year"),
                 month(col("o_orderdate")).as("o_month"))
        .agg(count(lit(1)).as("order_cnt"), dsum(col("o_totalprice")).as("total"))
        .orderBy("o_year", "o_month")
    }),

    // ---- rollup with grouping-null coalesce
    "q14_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("cnt"))
        .orderBy("returnflag", "linestatus")
    }),

    // ---- CASE WHEN + HAVING
    "q15_case_having" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("finished"),
          sum(when(col("o_orderstatus") =!= "F", 1).otherwise(0)).as("unfinished"))
        .filter(col("finished") > 5)
        .orderBy("o_orderpriority")
    }),

    // ---- decorrelated "above customer average" (Q17 shape), exact via
    //      cross-multiplication: price*cnt > sum  (no float avg compare)
    "q16_above_avg" -> ((s, dir) => {
      val ord = t(s, dir, "orders")
      val custAgg = ord.groupBy(col("o_custkey").as("ck"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("tot"),
             count(lit(1)).as("cnt"))
      ord.join(custAgg, col("o_custkey") === col("ck"))
        .filter(col("o_totalprice").cast(DecimalType(18, 2)) * col("cnt") > col("tot"))
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey")
    }),

    // ---- pivot (conditional aggregation), null → 0
    "q17_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("cnt_f"),
          coalesce(col("O"), lit(0L)).as("cnt_o"),
          coalesce(col("P"), lit(0L)).as("cnt_p"))
        .orderBy("o_orderpriority")
    }),

    // ---- IN-list filter + join (partition-pruning shape, §2.a S2)
    "q18_in_pruning" -> ((s, dir) => {
      val nat = t(s, dir, "nation").filter(col("n_name").isin("CHINA", "INDIA", "JAPAN"))
      val sup = t(s, dir, "supplier")
      sup.join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    }),

    // ---- UNION ALL keeping duplicates, then agg
    "q19_union_all" -> ((s, dir) => {
      val o1 = t(s, dir, "orders").filter(col("o_totalprice") > 150000.0)
        .select("o_orderstatus")
      val o2 = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderstatus")
      o1.union(o2).groupBy("o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderstatus")
    }),

    // ---- event-stream time bucketing (date_trunc agg over events)
    // events.ts parquet resolution varies by generation — see EventTables.
    "q20_event_buckets" -> ((s, dir) => {
      EventTables.events(s, dir)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"),
                 col("event_type"))
        .agg(count(lit(1)).as("cnt"), dsum(col("value"), 4).as("total_value"))
        .orderBy("day", "event_type")
    }),

    // ---- exact count distinct (delegated distinct-agg surface)
    "q21_count_distinct" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
             countDistinct(col("l_suppkey")).as("distinct_supps"))
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_join_agg_topk" ->
      """SELECT o_orderkey,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY o_orderkey ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q03_star_join" ->
      """SELECT r_name, n_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales,
         COUNT(*) AS order_cnt
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q04_left_join" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS order_cnt,
         COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 100000.0)
         ORDER BY c_custkey""",
    "q06_anti_join" ->
      """SELECT p_partkey, p_name FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",
    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, rn FROM (
           SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) x
         WHERE rn <= 2 ORDER BY o_custkey, rn""",
    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q09_set_ops" ->
      """SELECT custkey FROM (
           SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
           UNION
           SELECT o_custkey AS custkey FROM orders
         ) u
         EXCEPT SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000.0
         ORDER BY custkey""",
    "q10_intersect" ->
      """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
         INTERSECT
         SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
         ORDER BY custkey""",
    "q11_distinct_topk" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders
         ORDER BY o_orderpriority, o_orderstatus LIMIT 20""",
    "q12_scalar_funcs" ->
      """SELECT p_partkey,
         UPPER(p_brand) AS brand_uc,
         SUBSTRING(p_name, 1, 8) AS name_prefix,
         LENGTH(p_name) AS name_len,
         CONCAT(p_brand, '/', p_type) AS brand_type,
         CAST(CAST(p_retailprice * 1.1 AS DECIMAL(18,2)) AS DOUBLE) AS inflated,
         p_size % 7 AS size_mod
         FROM part ORDER BY p_partkey""",
    "q13_date_agg" ->
      """SELECT YEAR(o_orderdate) AS o_year, MONTH(o_orderdate) AS o_month,
         COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2 ORDER BY o_year, o_month""",
    "q14_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         COALESCE(l_linestatus, 'ALL') AS linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         COUNT(*) AS cnt
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",
    "q15_case_having" ->
      """SELECT o_orderpriority,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished,
         CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS unfinished
         FROM orders GROUP BY o_orderpriority
         HAVING SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) > 5
         ORDER BY o_orderpriority""",
    "q16_above_avg" ->
      """SELECT o_orderkey, o_custkey
         FROM orders JOIN (
           SELECT o_custkey AS ck,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS tot,
                  COUNT(*) AS cnt
           FROM orders GROUP BY o_custkey) a ON o_custkey = ck
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) * cnt > tot
         ORDER BY o_orderkey""",
    "q17_pivot" ->
      """SELECT o_orderpriority,
         COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS cnt_f,
         COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS cnt_o,
         COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS cnt_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q18_in_pruning" ->
      """SELECT s_suppkey, s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         WHERE n_name IN ('CHINA', 'INDIA', 'JAPAN')
         ORDER BY s_suppkey""",
    "q19_union_all" ->
      """SELECT o_orderstatus, COUNT(*) AS cnt FROM (
           SELECT o_orderstatus FROM orders WHERE o_totalprice > 150000.0
           UNION ALL
           SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
         ) u GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q20_event_buckets" ->
      """SELECT STRFTIME(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day, event_type,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
    "q21_count_distinct" ->
      """SELECT l_returnflag,
         COUNT(DISTINCT l_partkey) AS distinct_parts,
         COUNT(DISTINCT l_suppkey) AS distinct_supps
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
