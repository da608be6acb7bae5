package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.app._
import graft.compute._
import graft.dimension._
import graft.signal.{DimRef, DimensionLink}

/** Framework-implemented operators (SURVEY.md §2.a) driven END-TO-END
  * through the orchestrator and checked against DuckDB oracles: each query
  * stages the sf tables as day-partitioned external datasets, declares a
  * node DAG, executes it, and returns the node's managed output. The oracle
  * replays the same semantics as plain SQL over the unpartitioned tables.
  *
  * Covered: S1/S3 partition-range union with missing-path tolerance,
  * S4 nearest-in-range, S5 temp views, S6 managed sink, S9/S10 SQL slot +
  * {dim} parametrization, J1 coincidence join, J2 reference inputs,
  * J6 output materialization, B1 recursive backfill, F2 range expansion.
  */
object Framework {

  private val daySpec = DimSpec.pretty(
    "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))

  private def fmt(d: java.time.LocalDate): String = d.toString

  /** Stage rows of `table` whose `dateCol` falls in the last `windowDays`
    * calendar days (of the table max) as `scratch/<yyyy-MM-dd>/` parquet
    * partitions. Idempotent per (sfDir, table). Returns the max day. */
  private def stage(spark: SparkSession, sfDir: String, table: String,
                    dateCol: String, scratch: String, windowDays: Int,
                    anchor: Option[java.time.LocalDate] = None): java.time.LocalDate = {
    val df = spark.read.parquet(s"$sfDir/$table.parquet")
      .withColumn("__day", date_format(col(dateCol), "yyyy-MM-dd"))
    // ONE distinct-day scan serves both the max-day anchor and the
    // window membership (r20: the old agg(max) + windowed distinct ran
    // two collect jobs over the table per query construction — every
    // timed bench rep paid both; the distinct-day set is tiny at any
    // scale, and the max/window filter are driver-side over it).
    // isNotNull (r21, ADVICE r20 #2): a null dateCol yields a null
    // __day, which the pre-r20 shape excluded implicitly (max() skips
    // nulls; the window filter dropped them before distinct) but the
    // collected `.sorted` NPE'd on — restore the null-safe behavior.
    val allDays = df.select("__day").where(col("__day").isNotNull)
      .distinct().collect().map(_.getString(0)).sorted
    val maxDay = anchor.getOrElse(java.time.LocalDate.parse(allDays.last))
    val lo = fmt(maxDay.minusDays(windowDays - 1L))
    val days = allDays.filter(d => d >= lo && d <= fmt(maxDay))
    val fs = new org.apache.hadoop.fs.Path(scratch)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    days.foreach { d =>
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$scratch/$d/_SUCCESS")))
        df.where(col("__day") === d).drop("__day")
          .coalesce(1).write.mode("overwrite").parquet(s"$scratch/$d")
    }
    maxDay
  }

  /** Content fingerprint of an sf dir's table files: (name, length,
    * mtime) per parquet, hashed. Staging dirs are KEYED on it so
    * regenerated source data can never silently reuse stale staging —
    * the r16 sf1-gate trap where fw14 kept exactly 1/10 of the oracle's
    * docs because `_SUCCESS`-guarded staging survived a data regen
    * (VERDICT r16 Next #1; BASELINE r16 "sf1 gate" finding 2). Any
    * regeneration rewrites the files, so mtime+length is sufficient and
    * needs no data read (uncached — a dozen File.length calls per query;
    * a mid-JVM regen is therefore also caught). Deriving the staging dir
    * also evicts this sf basename's stale-fingerprint dirs (best-effort,
    * once per fingerprint per JVM) so /tmp stays bounded across regens. */
  private[graft] def sourceFingerprint(sfDir: String): String = {
    val files =
      Option(new java.io.File(sfDir).listFiles()).getOrElse(Array.empty)
    val sig = files.filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString
  }

  private def evictStale(prefix: String, keep: String): Unit =
    try {
      def rmRecursive(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRecursive)
        f.delete(); ()
      }
      Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix) && f.getName != keep)
        .foreach(rmRecursive)
    } catch { case scala.util.control.NonFatal(_) => () }

  private val evicted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[graft] def work(sfDir: String): String = {
    val base = new java.io.File(sfDir).getName
    val name = s"graft_fw_${base}_${sourceFingerprint(sfDir)}"
    if (evicted.add(name)) evictStale(s"graft_fw_${base}_", name)
    s"/tmp/$name"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- S3: ranged input = ONE multi-path scan over last-3-calendar-days
    // partitions, missing days tolerated; S9/S10 SQL slot with {day} param
    "fw01_range_union" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 3)
      val app = new Application("fw01", s, s"$w/app_fw01")
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val node = app.createData("range_agg", Seq(src.latest(3)), Seq(SqlSlot(
        """SELECT o_orderstatus, COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_daily GROUP BY o_orderstatus""")))
      app.activate()
      app.execute(node(fmt(maxDay)))
      app.load(node(fmt(maxDay))).orderBy("o_orderstatus")
    }),

    // ---- FileCheck ALTERNATIVES (reference analysis.py:27-38, protocol
    // signal.py:118-135): the oldest ranged partition is completed by a
    // vendor `manifest.json` with NO `_SUCCESS` — the multi-name protocol
    // must pass the range/integrity check and the union must read it
    "fw20_alt_marker" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_altm", 3)
      val fs = new org.apache.hadoop.fs.Path(w)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val oldest = s"$w/orders_altm/${fmt(maxDay.minusDays(2))}"
      val succ = new org.apache.hadoop.fs.Path(oldest, "_SUCCESS")
      val mani = new org.apache.hadoop.fs.Path(oldest, "manifest.json")
      // idempotent vendor re-mark: stage() recreates _SUCCESS when it
      // (re)writes the partition, which also clears any prior manifest
      if (fs.exists(succ)) fs.delete(succ, false)
      // zero-byte on purpose: Spark's scan planning skips empty files, so
      // a non-underscore marker never reaches the parquet footer reader
      if (!fs.exists(mani)) fs.create(mani, true).close()
      val app = new Application("fw20", s, s"$w/app_fw20")
      val src = app.marshalExternalData("orders_daily", s"$w/orders_altm",
        daySpec, protocol =
          graft.signal.IntegrityProtocol.FileCheck("_SUCCESS", "manifest.json"))
      val node = app.createData("alt_range_agg",
        Seq(src.latest(3).rangeCheck()), Seq(SqlSlot(
          """SELECT o_orderstatus, COUNT(*) AS order_cnt,
                    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM orders_daily GROUP BY o_orderstatus""")))
      app.activate()
      app.execute(node(fmt(maxDay)))
      app.load(node(fmt(maxDay))).orderBy("o_orderstatus")
    }),

    // ---- versioned REPLACE output (r17): the node's partition commits
    // via data_v<N> + pointer PUT; a RE-execution (recompute) flips the
    // pointer instead of clearing in place, and the managed read
    // resolves the committed version — driven end-to-end through the
    // orchestrator, including the recompute
    "fw21_versioned_output" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      val app = new Application("fw21", s, s"$w/app_fw21")
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily",
        daySpec)
      val node = app.createData("vers_agg", Seq(src.latest(1)), Seq(SqlSlot(
        """SELECT o_orderpriority, COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_daily GROUP BY o_orderpriority""")),
        attrs = graft.signal.DatasetAttrs(versioned = true))
      app.activate()
      val part = s"$w/app_fw21/internal_data/vers_agg/${fmt(maxDay)}"
      val partP = new org.apache.hadoop.fs.Path(part)
      val fs = partP.getFileSystem(s.sparkContext.hadoopConfiguration)
      def seqNow: Int = graft.compute.Compaction.VersionedDir
        .newest(fs, partP, graft.compute.OutputWriter.DataPtrPrefix)
        .map(_._1).getOrElse(0)
      app.execute(node(fmt(maxDay)))
      val seq1 = seqNow
      // recompute the same partition: the pointer must ADVANCE (older
      // versions GC to current + previous — compare seqs, not names)
      app.execute(node(fmt(maxDay)))
      require(seqNow == seq1 + 1,
        s"recompute did not commit a new version (seq $seq1 -> $seqNow)")
      app.load(node(fmt(maxDay))).orderBy("o_orderpriority")
    }),

    // ---- S4: nearest-the-tip — anchor 2 days past the data tip; the probe
    // walks back and reads exactly the newest existing partition
    "fw02_nearest" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 3)
      val anchor = fmt(maxDay.plusDays(2))
      val app = new Application("fw02", s, s"$w/app_fw02")
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      // a nearest input is a dependent — a timer is the trigger (T1)
      val timer = app.createTimer("daily_tick", dimName = "day")
      val node = app.createData("nearest_agg", Seq(timer, src.latest(7).nearest), Seq(SqlSlot(
        """SELECT COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_daily""")))
      app.activate()
      app.execute(node(anchor))
      app.load(node(anchor))
    }),

    // ---- J2: reference input (dimension-less lookup) joined to the
    // triggering partition through temp views (S5)
    "fw03_reference_join" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      // customer staged as a single dimension-less dataset
      val custRoot = s"$w/customer_all"
      val fs = new org.apache.hadoop.fs.Path(custRoot)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$custRoot/_SUCCESS")))
        s.read.parquet(s"$dir/customer.parquet").coalesce(1)
          .write.mode("overwrite").parquet(custRoot)
      val app = new Application("fw03", s, s"$w/app_fw03")
      val orders = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val cust = app.marshalExternalData("customer_all", custRoot, DimSpec.empty)
      val node = app.createData("seg_rev", Seq(orders.latest(1), cust.ref), Seq(SqlSlot(
        """SELECT c_mktsegment, COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_daily JOIN customer_all ON o_custkey = c_custkey
           GROUP BY c_mktsegment""")))
      app.activate()
      app.execute(node(fmt(maxDay)))
      app.load(node(fmt(maxDay))).orderBy("c_mktsegment")
    }),

    // ---- J1/J6: two partitioned sources coincidence-joined on the same
    // day dimension (tips aligned), then equi-joined row-wise in the slot
    "fw04_coincidence_join" -> ((s, dir) => {
      val w = work(dir)
      val maxOrd = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 5)
      // anchor the item window at the orders tip (shipdates run ~3 months past)
      stage(s, dir, "lineitem", "l_shipdate", s"$w/lineitem_daily", 14, Some(maxOrd))
      val app = new Application("fw04", s, s"$w/app_fw04")
      val orders = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val items = app.marshalExternalData("lineitem_daily", s"$w/lineitem_daily", daySpec)
      val node = app.createData("same_day", Seq(orders.latest(1), items.latest(14)), Seq(SqlSlot(
        """SELECT o_orderpriority, COUNT(*) AS item_cnt,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           FROM orders_daily JOIN lineitem_daily ON l_orderkey = o_orderkey
           GROUP BY o_orderpriority""")))
      app.activate()
      app.execute(node(fmt(maxOrd)))
      app.load(node(fmt(maxOrd))).orderBy("o_orderpriority")
    }),

    // ---- B1: recursive backfill — stage2 depends on stage1's managed
    // output; executing stage2 materializes the missing ancestor first
    "fw05_backfill" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 2)
      val app = new Application("fw05", s, s"$w/app_fw05_${System.nanoTime()}", Map.empty)
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val stage1 = app.createData("by_status", Seq(src.latest(2)), Seq(SqlSlot(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
           FROM orders_daily GROUP BY o_orderstatus, o_orderpriority""")))
      val stage2 = app.createData("by_priority", Seq(stage1), Seq(SqlSlot(
        """SELECT o_orderpriority, CAST(SUM(cnt) AS BIGINT) AS order_cnt
           FROM by_status GROUP BY o_orderpriority""")))
      app.activate()
      app.execute(stage2(fmt(maxDay)), recursive = true)
      app.load(stage2(fmt(maxDay))).orderBy("o_orderpriority")
    }),

    // ---- nested 2-level dimension spec (flag/day) through the
    // orchestrator: concrete value on the first level, range on the second
    "fw07_two_level_dims" -> ((s, dir) => {
      val w = work(dir)
      val flagDaySpec = DimSpec.pretty(
        "flag" -> (DimType.STRING, Map.empty[String, Any]),
        "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
      // stage lineitem as flag/day partitions over the last 5 ship days
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .withColumn("__day", date_format(col("l_shipdate"), "yyyy-MM-dd"))
      val maxDay = java.time.LocalDate.parse(
        li.agg(max("__day")).collect().head.getString(0))
      val lo = fmt(maxDay.minusDays(4))
      val fs = new org.apache.hadoop.fs.Path(s"$w/li_fd")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      li.where(col("__day") >= lo)
        .select(col("l_returnflag"), col("__day")).distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).foreach { case (f, d) =>
          if (!fs.exists(new org.apache.hadoop.fs.Path(s"$w/li_fd/$f/$d/_SUCCESS")))
            li.where(col("__day") === d && col("l_returnflag") === f).drop("__day")
              .coalesce(1).write.mode("overwrite").parquet(s"$w/li_fd/$f/$d")
        }
      val app = new Application("fw07", s, s"$w/app_fw07")
      val src = app.marshalExternalData("li_fd", s"$w/li_fd", flagDaySpec)
      val node = app.createData("flag_window",
        Seq(src("N", "_:-3")), Seq(SqlSlot(
          """SELECT '{flag}' AS flag, l_linestatus, COUNT(*) AS cnt,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
             FROM li_fd GROUP BY l_linestatus""")))
      app.activate()
      app.execute(node("N", fmt(maxDay)))
      app.load(node("N", fmt(maxDay))).orderBy("l_linestatus")
    }),

    // ---- end-to-end curation DAG: documents partitioned by lang; stage 1
    // quality-filters and exact-dedups, stage 2 aggregates per source —
    // recursive execute materializes the chain (training-data pipeline
    // composed through the orchestrator)
    "fw08_curation_pipeline" -> ((s, dir) => {
      val w = work(dir)
      val langSpec = DimSpec.pretty("lang" -> (DimType.STRING, Map.empty[String, Any]))
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val fs = new org.apache.hadoop.fs.Path(s"$w/docs_lang")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      docs.select("lang").distinct().collect().map(_.getString(0)).foreach { l =>
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$w/docs_lang/$l/_SUCCESS")))
          docs.where(col("lang") === l).coalesce(1)
            .write.mode("overwrite").parquet(s"$w/docs_lang/$l")
      }
      val app = new Application("fw08", s, s"$w/app_fw08")
      val src = app.marshalExternalData("docs", s"$w/docs_lang", langSpec)
      val curated = app.createData("curated", Seq(src("en")), Seq(SqlSlot(
        """SELECT MD5(text) AS text_hash, MIN(doc_id) AS doc_id,
                  MIN(source) AS source, MIN(n_chars) AS n_chars
           FROM docs WHERE n_chars >= 100 GROUP BY MD5(text)""")))
      val stats = app.createData("source_stats", Seq(curated), Seq(SqlSlot(
        """SELECT source, COUNT(*) AS kept_docs,
                  CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM curated GROUP BY source""")))
      app.activate()
      app.execute(stats("en"), recursive = true)
      app.load(stats("en")).orderBy("source")
    }),

    // ---- full curation DAG with SEMANTIC dedup composed through the
    // orchestrator (fw08 + the SemDeDup stage): quality filter → exact
    // dedup → semanticDedupDrops (ScalaSlot — embedding-space k-means
    // cells, not SQL-expressible) → per-source stats, materialized by ONE
    // recursive execute. Oracle-ability uses the p21 construction: planted
    // 1.5×-scaled copies (text suffixed so exact dedup keeps them) are
    // colinear with their source, so at minCosine=0.999 the semantic drop
    // set is EXACTLY "planted rows whose source survived the earlier
    // stages" (max real-real cosine ≈ 0.51) — a DuckDB CTE replays every
    // stage including that drop rule. Planted exact copies (2e7+id) check
    // the dedup stage drops them before semantic dedup ever sees them.
    "fw14_semantic_curation" -> ((s, dir) => {
      val w = work(dir)
      val langSpec = DimSpec.pretty("lang" -> (DimType.STRING, Map.empty[String, Any]))
      val fs = new org.apache.hadoop.fs.Path(s"$w/fw14_corpus")
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val base = s.read.parquet(s"$dir/documents.parquet")
        .join(s.read.parquet(s"$dir/embeddings.parquet"),
          col("doc_id") === col("vec_id"))
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"), col("embedding"))
      val planted = base.where(col("doc_id") < 30).select(
        (col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" (v2)")).as("text"),
        col("lang"), col("source"), (col("n_chars") + 5).as("n_chars"),
        transform(col("embedding"), x => x * lit(1.5f)).as("embedding"))
      val exactDups = base.where(col("doc_id") >= 30 && col("doc_id") < 60)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text"),
          col("lang"), col("source"), col("n_chars"), col("embedding"))
      val corpus = base.unionByName(planted).unionByName(exactDups)
      corpus.select("lang").distinct().collect().map(_.getString(0)).foreach { l =>
        if (!fs.exists(new org.apache.hadoop.fs.Path(s"$w/fw14_corpus/$l/_SUCCESS")))
          corpus.where(col("lang") === l).coalesce(1)
            .write.mode("overwrite").parquet(s"$w/fw14_corpus/$l")
      }
      val app = new Application("fw14", s, s"$w/app_fw14")
      val src = app.marshalExternalData("corpus", s"$w/fw14_corpus", langSpec)
      val filtered = app.createData("filtered", Seq(src("en")), Seq(SqlSlot(
        """SELECT doc_id, text, source, n_chars, embedding
           FROM corpus WHERE n_chars >= 100""")))
      val deduped = app.createData("deduped", Seq(filtered), Seq(SqlSlot(
        """SELECT f.doc_id, f.text, f.source, f.n_chars, f.embedding
           FROM filtered f
           JOIN (SELECT MD5(text) AS h, MIN(doc_id) AS m
                 FROM filtered GROUP BY MD5(text)) g
             ON MD5(f.text) = g.h AND f.doc_id = g.m""")))
      val curated = app.createData("curated", Seq(deduped),
        Seq(graft.compute.ScalaSlot { ctx =>
          val in = ctx.input("deduped")
          val drops = graft.operators.Dedup.semanticDedupDrops(
            in, "embedding", "doc_id", minCosine = 0.999, k = 8, iters = 2)
          in.join(drops.select(col("dropped").as("doc_id")),
              Seq("doc_id"), "left_anti")
            .select(col("doc_id"), col("source"), col("n_chars"))
        }))
      val stats = app.createData("source_stats", Seq(curated), Seq(SqlSlot(
        """SELECT source, COUNT(*) AS kept_docs,
                  CAST(SUM(n_chars) AS BIGINT) AS total_chars
           FROM curated GROUP BY source""")))
      app.activate()
      app.execute(stats("en"), recursive = true)
      app.load(stats("en")).orderBy("source")
    }),

    // ---- S2 catalog input: day-partitioned table read through
    // spark.table with isin partition pruning (the catalog analog of the
    // fw01 ranged union)
    "fw10_catalog" -> ((s, dir) => {
      val sfTag = new java.io.File(dir).getName.replace(".", "_")
      val db = "graft_cat"
      // per-JVM warehouse location: the in-memory catalog is per-JVM, so
      // the location must be too — a fixed shared /tmp path let two
      // concurrent runs (separate JVMs, same SF) delete each other's live
      // table dirs out from under their catalogs
      val wh = s"${work(dir)}/cat_wh_${ProcessHandle.current().pid()}"
      s.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$wh'")
      val tbl = s"$db.orders_$sfTag"
      if (!s.catalog.tableExists(tbl)) {
        s.read.parquet(s"$dir/orders.parquet")
          .withColumn("day", date_format(col("o_orderdate"), "yyyy-MM-dd"))
          .write.mode("overwrite").partitionBy("day").saveAsTable(tbl)
      }
      val maxDay = s.table(tbl).agg(max("day")).collect().head.getString(0)
      val app = new Application("fw10", s, s"${work(dir)}/app_fw10")
      val src = app.marshalCatalogTable("orders_cat", db, s"orders_$sfTag", daySpec)
      val node = app.createData("cat_agg", Seq(src.latest(2)), Seq(SqlSlot(
        """SELECT o_orderstatus, COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_cat GROUP BY o_orderstatus""")))
      app.activate()
      app.execute(node(maxDay))
      app.load(node(maxDay)).orderBy("o_orderstatus")
    }),

    // ---- T1 scheduled timer: a cron(0 0 * * ? *) midnight schedule,
    // advanced across two midnights by the driver scheduler with a
    // manually ticked clock — each fire feeds the routing table like any
    // other event and triggers the node for that day's partition
    // (reference application.py:1023-1052: schedule_expression parsed and
    // fired by the platform's scheduled-event rules)
    "fw11_scheduled_timer" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 3)
      val app = new Application("fw11", s, s"$w/app_fw11")
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val timer = app.createTimer("midnight", dimName = "day",
        scheduleExpression = "cron(0 0 * * ? *)")
      // the timer is the sole trigger; the day partition is a dependent
      // (ref) materialized through the day link — no orders event needed
      val node = app.createData("sched_agg", Seq(timer, src.latest(1).ref), Seq(SqlSlot(
        """SELECT '{day}' AS day, o_orderpriority, COUNT(*) AS order_cnt
           FROM orders_daily GROUP BY o_orderpriority""")))
      app.activate()
      // clock starts just before the first midnight; advancing to the
      // second midnight owes the routes BOTH ticks (catch-up semantics)
      val utc = java.time.ZoneOffset.UTC
      val sched = app.scheduler(
        startAt = maxDay.minusDays(1).atStartOfDay.minusMinutes(1).toInstant(utc))
      val fired = sched.advanceTo(maxDay.atStartOfDay.toInstant(utc))
      require(fired.map(_._1) == List("midnight", "midnight"),
        s"expected two cron fires, got $fired")
      Seq(maxDay.minusDays(1), maxDay)
        .map(d => app.load(node(fmt(d))))
        .reduce(_ unionAll _).orderBy("day", "o_orderpriority")
    }),

    // ---- input fan-out (reference app.project, application.py:4544-4640):
    // ONE timer tick projects onto two region branches; each branch is a
    // completed pseudo-partition that triggers the downstream node — one
    // event, N regionalized executions
    "fw12_projection" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      val app = new Application("fw12", s, s"$w/app_fw12")
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val timer = app.createTimer("tick", dimName = "day")
      val projSpec = DimSpec.pretty(
        "region" -> (DimType.STRING, Map.empty[String, Any]),
        "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")))
      import graft.dimension.DimFilter.RawFilter
      val projected = app.project("regional_tick", timer, projSpec,
        RawFilter(List(
          "EU" -> RawFilter(List("*" -> RawFilter.empty)),
          "NA" -> RawFilter(List("*" -> RawFilter.empty)))))
      val node = app.createData("regional_agg",
        Seq(projected, src.latest(1).ref), Seq(SqlSlot(
          """SELECT '{region}' AS region, o_orderstatus, COUNT(*) AS order_cnt
             FROM orders_daily GROUP BY o_orderstatus""")))
      app.activate()
      val fired = app.fireTimer(timer, fmt(maxDay))
      require(fired.nonEmpty, "projection fan-out produced no completions")
      Seq("EU", "NA").map(r => app.load(node(r, fmt(maxDay))))
        .reduce(_ unionAll _).orderBy("region", "o_orderstatus")
    }),

    // ---- dev-context persistence (reference save/load_dev_state +
    // attach, application.py:164-180): the DAG is declared once, saved,
    // and a NEW SparkSession attaches it from disk — zero re-declaration —
    // then executes through the recovered definitions. The downstream
    // node's compute is a ClassSlot (reference scala_module external
    // compute, api_ext.py:1197-1213): only the class NAME persists, the
    // attached process re-resolves the implementation from its
    // classpath and EXECUTES it — the round-trip a ScalaSlot closure
    // cannot make.
    "fw13_attach" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      val root = s"$w/app_fw13"
      val app1 = new Application("fw13", s, root)
      val src = app1.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val agg = app1.createData("day_agg", Seq(src.latest(1)), Seq(SqlSlot(
        """SELECT o_orderstatus, COUNT(*) AS order_cnt
           FROM orders_daily GROUP BY o_orderstatus""")))
      app1.createData("status_share", Seq(agg),
        Seq(graft.compute.ClassSlot("graft.queries.Fw13StatusShare")))
      app1.saveDevState()
      val app2 = Application.attach("fw13", s.newSession(), root)
      val node = app2.getData("status_share").getOrElse(
        sys.error("attached dev state lost node 'status_share'"))
      // recursive: the upstream day_agg partition is materialized first,
      // then the reflectively-resolved ClassSlot computes the share
      app2.execute(node(fmt(maxDay)), recursive = true)
      app2.load(node(fmt(maxDay))).orderBy("o_orderstatus")
    }),

    // ---- model-artifact signal (reference marshal_external_model,
    // api_ext.py:1127-1166): a version-partitioned NON-dataset artifact
    // tree rides a nearest-reference input through the orchestrator —
    // the trigger day has no artifact, so the probe resolves the newest
    // EXISTING version (the "model live when this data was logged"
    // shape); the slot reads the artifact PATH + declared metadata from
    // its SlotContext (never a DataFrame) and stamps the aggregation
    // with the resolved version and the artifact's true byte size
    "fw18_model_attach" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      val mRoot = s"$w/models_fw18"
      val mDay = fmt(maxDay.minusDays(1))
      val fs = new org.apache.hadoop.fs.Path(mRoot)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val mDir = new org.apache.hadoop.fs.Path(s"$mRoot/$mDay")
      if (!fs.exists(new org.apache.hadoop.fs.Path(mDir, "_SUCCESS"))) {
        val out = fs.create(new org.apache.hadoop.fs.Path(mDir, "model.bin"), true)
        out.write(Array.fill[Byte](16)(0x5A)); out.close()
        fs.create(new org.apache.hadoop.fs.Path(mDir, "_SUCCESS"), true).close()
      }
      val app = new Application("fw18", s, s"$w/app_fw18")
      val orders = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val models = app.marshalExternalModel("models", mRoot, daySpec,
        modelMetadata = Map("algorithm" -> "xgboost"),
        modelFormat = "sagemaker_training_job")
      val node = app.createData("scored_agg",
        Seq(orders.latest(1), models.latest(5).nearest),
        Seq(ScalaSlot { ctx =>
          val ms = ctx.inputSignals("models")
          val mPath = ms.materializedPaths.head
          val ver = ms.tip.head.transform().value.toString
          val bin = new org.apache.hadoop.fs.Path(mPath, "model.bin")
          val nBytes = bin.getFileSystem(
            ctx.spark.sparkContext.hadoopConfiguration)
            .getFileStatus(bin).getLen
          ctx.input("orders_daily").groupBy("o_orderstatus")
            .agg(count(lit(1)).as("order_cnt"))
            .withColumn("model_version", lit(ver))
            .withColumn("model_algo",
              lit(ms.source.attrs.modelMetadata("algorithm")))
            .withColumn("model_bytes", lit(nBytes))
        }))
      app.activate()
      app.execute(node(fmt(maxDay)))
      app.load(node(fmt(maxDay))).orderBy("o_orderstatus")
    }),

    // ---- DATETIME timezone: an hour-granularity UTC timer fires at
    // 03:00 UTC; the node's output dimension is declared in PST, linked
    // through DateValue.toTimezone — the materialized partition lands on
    // the PREVIOUS local day (2026-08-11), which load() must find when
    // addressed by the PST day value. A wrong/no conversion writes to
    // 2026-08-12 and load() returns zero rows.
    "fw09_timezone" -> ((s, dir) => {
      val w = work(dir)
      val ordersRoot = s"$w/orders_all"
      val fs = new org.apache.hadoop.fs.Path(ordersRoot)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$ordersRoot/_SUCCESS")))
        s.read.parquet(s"$dir/orders.parquet").coalesce(1)
          .write.mode("overwrite").parquet(ordersRoot)
      val app = new Application("fw09", s, s"$w/app_fw09_${System.nanoTime()}")
      val timer = app.createTimer("utc_tick", format = "%Y-%m-%d %H",
        dimName = "utc_hour")
      val orders = app.marshalExternalData("orders_all", ordersRoot, DimSpec.empty)
      val pstDaySpec = DimSpec.pretty("day" -> (DimType.DATETIME,
        Map[String, Any]("format" -> "%Y-%m-%d", "timezone" -> "PST")))
      val node = app.createData("pst_report", Seq(timer, orders.ref),
        Seq(SqlSlot(
          """SELECT '{day}' AS pst_day, o_orderstatus, COUNT(*) AS order_cnt
             FROM orders_all GROUP BY o_orderstatus""")),
        outputSpec = pstDaySpec,
        outputLinks = List(DimensionLink.mapped(DimRef("output", "day"),
          DimRef("utc_tick", "utc_hour"), DateValue.toTimezone("PST"))))
      app.activate()
      app.fireTimer(timer, "2026-08-12 03")
      app.load(node("2026-08-11")).orderBy("o_orderstatus")
    }),

    // ---- J8/B2 multi-driver END-TO-END: the DAG splits across two
    // driver INSTANCES over a shared store — the upstream SqlSlot
    // executes on driver A (managed write + _SUCCESS), its completion
    // crosses shards through the at-least-once inbox, and driver B runs
    // the downstream over the real managed output on its poll cycle
    // (reference composition: Lambda processor + DynamoDB routing +
    // Glue compute, constructs.py:3293-3433 + processor/aws.py:2746-2803)
    "fw15_multi_driver" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      val root = s"$w/app_fw15"
      // fresh multi-driver state per run: leases/WALs/inboxes from an
      // earlier run must not leak into this one
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      // route ids pinned to opposite shards of a 2-shard ring
      val upId = (0 to 99).map(i => s"up_agg_$i")
        .find(id => graft.routing.Sharding.shardOf(id, 2) == 0).get
      val downId = (0 to 99).map(i => s"down_sum_$i")
        .find(id => graft.routing.Sharding.shardOf(id, 2) == 1).get
      // every driver declares the SAME dev context (the ShardedDriver
      // contract); only runtime shard ownership differs
      def mkDriver(): Application = {
        val app = new Application("fw15", s, root)
        val src = app.marshalExternalData("orders_daily",
          s"$w/orders_daily", daySpec)
        val up = app.createData(upId, Seq(src.latest(1)), Seq(SqlSlot(
          """SELECT o_orderpriority, COUNT(*) AS order_cnt
             FROM orders_daily GROUP BY o_orderpriority""")))
        app.createData(downId, Seq(up), Seq(SqlSlot(
          s"""SELECT CAST(SUM(order_cnt) AS BIGINT) AS total_orders,
                     COUNT(*) AS n_priorities FROM $upId""")))
        app
      }
      val dA = mkDriver(); val dB = mkDriver()
      dA.activateSharded("A", 2, shards = Some(Set(0)))
      dB.activateSharded("B", 2, shards = Some(Set(1)))
      // the source event lands on A → upstream executes there; B folds
      // the cross-shard completion on its cycle → downstream executes
      dA.processPath(s"$w/orders_daily/${fmt(maxDay)}")
      dB.shardedCycle()
      val out = dB.load(dB.getData(downId).get(fmt(maxDay)))
      dA.terminate(); dB.terminate()
      out
    }),

    // ---- F4 N->1 dimension link, end-to-end: the trigger's (day, hour)
    // resolve a REFERENCE input partitioned by a combined "%Y-%m-%d-%H"
    // stamp through a 2-ary mapper (reference advanced-dimension-linking).
    // The error stream stages as day/hour partitions, the view stream as
    // stamp partitions; the pick (max error day, its max hour) is
    // recomputed identically by the oracle.
    "fw16_n_to_1_link" -> ((s, dir) => {
      val w = work(dir)
      val ev = EventTables.events(s, dir)
        .withColumn("__d", date_format(col("ts"), "yyyy-MM-dd"))
        .withColumn("__h", hour(col("ts")))
      val pick = ev.where(col("event_type") === "error")
        .select("__d", "__h").distinct()
        .orderBy(col("__d").desc, col("__h").desc).limit(1)
        .collect().head
      val (day, hr) = (pick.getString(0), pick.getInt(1))
      val stamp = f"$day-$hr%02d"
      val fs = new org.apache.hadoop.fs.Path(w)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$w/n1_err/$day/$hr/_SUCCESS")))
        ev.where(col("event_type") === "error" &&
            col("__d") === day && col("__h") === hr)
          .select("event_type", "value", "ts")
          .coalesce(1).write.mode("overwrite").parquet(s"$w/n1_err/$day/$hr")
      if (!fs.exists(new org.apache.hadoop.fs.Path(s"$w/n1_view/$stamp/_SUCCESS")))
        ev.where(col("event_type") === "view" &&
            col("__d") === day && col("__h") === hr)
          .select("event_type", "value", "ts")
          .coalesce(1).write.mode("overwrite").parquet(s"$w/n1_view/$stamp")
      val dayHourSpec = DimSpec.pretty(
        "day" -> (DimType.DATETIME, Map[String, Any]("format" -> "%Y-%m-%d")),
        "hour" -> (DimType.LONG, Map.empty[String, Any]))
      val stampSpec = DimSpec.pretty(
        "stamp" -> (DimType.DATETIME,
          Map[String, Any]("format" -> "%Y-%m-%d-%H")))
      val app = new Application("fw16", s, s"$w/app_fw16")
      val errs = app.marshalExternalData("errs", s"$w/n1_err", dayHourSpec)
      val views = app.marshalExternalData("views", s"$w/n1_view", stampSpec)
      val node = app.createData("hourly_join",
        Seq(errs, views.ref),
        Seq(SqlSlot(
          """SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS err_sum,
                    (SELECT COUNT(*) FROM views) AS view_cnt
             FROM errs""")),
        inputLinks = List(DimensionLink.mappedN(DimRef("views", "stamp"),
          Seq(DimRef("errs", "day"), DimRef("errs", "hour")),
          { case Seq(d: DateValue, h) =>
            d.copy(date = d.date.plusHours(h.rawValue.toString.toLong),
              params = d.params + ("format" -> "%Y-%m-%d-%H"))
            case vs => vs.head
          })))
      app.activate()
      val done = app.processPath(s"$w/n1_err/$day/$hr")
      require(done.exists(_.endsWith(s"hourly_join/$day/$hr")),
        s"N->1 join did not trigger: $done")
      app.load(node(day, hr.toLong))
    }),

    // ---- §2.c gated end-to-end: a Structured Streaming micro-batch
    // ingest — the binaryFile marker stream observes the staged partition
    // backlog, gates on _SUCCESS, and drives the routing table (markers →
    // coincidence trigger → SQL slot → managed write); the node's managed
    // output is replayed against the batch oracle. AvailableNow drains
    // the backlog then stops, so the row is deterministic per SF.
    "fw17_streaming_ingest" -> ((s, dir) => {
      val w = work(dir)
      val maxDay = stage(s, dir, "orders", "o_orderdate", s"$w/orders_daily", 1)
      val root = s"$w/app_fw17"
      // fresh app + stream checkpoint per run: the staged backlog must be
      // re-observed as THIS run's micro-batches
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val app = new Application("fw17", s, root)
      val src = app.marshalExternalData("orders_daily", s"$w/orders_daily", daySpec)
      val node = app.createData("stream_agg", Seq(src.latest(1)), Seq(SqlSlot(
        """SELECT o_orderpriority, COUNT(*) AS order_cnt,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders_daily GROUP BY o_orderpriority""")))
      app.activate()
      val q = new graft.streaming.MarkerStream(app, Seq(s"$w/orders_daily"),
        s"$root/stream_ckpt").start()
      q.awaitTermination(120000)
      require(app.poll(node(fmt(maxDay))).isDefined,
        "streamed completion marker did not trigger the node")
      app.load(node(fmt(maxDay))).orderBy("o_orderpriority")
    }),

    // ---- F2: relative-range expansion itself, oracle'd against DuckDB's
    // calendar arithmetic (30 days ending at the orders tip)
    // ---- S6 (r15): APPEND accumulation -> object-store-safe compaction
    // (rename-free KV-guarded swap) -> managed-partition READ-BACK, hash-
    // matched against DuckDB over the source table. The rewrite semantics
    // (not just the suites' kill matrix) are under the correctness gate:
    // three disjoint lineitem slices APPEND as wide writes, the compactor
    // collapses the partition, and the read-back must equal the whole
    // table.
    "fw19_compaction_readback" -> ((s, dir) => {
      import graft.signal.{DatasetAttrs, DatasetType, Signal, SignalSource}
      val w = work(dir)
      val root = s"$w/fw19_cmp"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      // fresh every run: the compaction must rewrite THIS run's appends
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val sig = Signal("li_app", SignalSource.internal(root, "li_app")
          .copy(attrs = DatasetAttrs(datasetType = DatasetType.APPEND)),
        daySpec, DimFilter.branchOf(daySpec, Seq("2026-08-10")))
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_returnflag"), col("l_quantity"))
      (0 until 3).foreach { b =>
        OutputWriter.write(s,
          li.where(pmod(col("l_orderkey"), lit(3)) === b).repartition(8), sig)
      }
      val part = s"$root/internal_data/li_app/2026-08-10"
      val before = fs.listStatus(new org.apache.hadoop.fs.Path(part))
        .count(st => st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
      val stats = Compaction.compactPartitionKv(s, sig, 256L << 20,
        new graft.routing.InMemoryConditionalKv)
      require(!stats.skipped && stats.filesAfter < before,
        s"compaction did not engage: $stats (before=$before)")
      s.read.parquet(part)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("item_cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("qty"))
        .orderBy("l_returnflag")
    }),

    "fw06_range_expansion" -> ((s, dir) => {
      import s.implicits._
      val maxDay = s.read.parquet(s"$dir/orders.parquet")
        .agg(max(date_format(col("o_orderdate"), "yyyy-MM-dd")))
        .collect().head.getString(0)
      val datum = DimValue.resolve(maxDay,
        Dim(Some("day"), Some(DimType.DATETIME), Map("format" -> "%Y-%m-%d")))
      val expanded = RelativeValue(-30).range(datum).map(_.value.toString)
      expanded.toDF("day").orderBy("day")
    })
  )

  val oracles: Map[String, String] = Map(
    "fw19_compaction_readback" ->
      """SELECT l_returnflag, COUNT(*) AS item_cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "fw01_range_union" ->
      """SELECT o_orderstatus, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >=
           (SELECT MAX(CAST(o_orderdate AS DATE)) - 2 FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "fw20_alt_marker" ->
      """SELECT o_orderstatus, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >=
           (SELECT MAX(CAST(o_orderdate AS DATE)) - 2 FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "fw21_versioned_output" ->
      """SELECT o_orderpriority, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE CAST(o_orderdate AS DATE) =
           (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "fw17_streaming_ingest" ->
      """SELECT o_orderpriority, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE CAST(o_orderdate AS DATE) =
           (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "fw02_nearest" ->
      """SELECT COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE CAST(o_orderdate AS DATE) = (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)""",
    "fw11_scheduled_timer" ->
      """SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS day,
         o_orderpriority, COUNT(*) AS order_cnt
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >=
           (SELECT MAX(CAST(o_orderdate AS DATE)) - 1 FROM orders)
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "fw12_projection" ->
      """SELECT r.region, o_orderstatus, COUNT(*) AS order_cnt
         FROM orders, (SELECT 'EU' AS region UNION ALL SELECT 'NA') r
         WHERE CAST(o_orderdate AS DATE) =
           (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
         GROUP BY r.region, o_orderstatus ORDER BY 1, 2""",
    "fw13_attach" ->
      """WITH agg AS (
           SELECT o_orderstatus, COUNT(*) AS order_cnt
           FROM orders
           WHERE CAST(o_orderdate AS DATE) =
             (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
           GROUP BY 1)
         SELECT o_orderstatus, order_cnt,
                CAST(order_cnt AS DOUBLE)
                  / CAST(SUM(order_cnt) OVER () AS DOUBLE) AS share
         FROM agg ORDER BY o_orderstatus""",
    "fw18_model_attach" ->
      """SELECT o_orderstatus, COUNT(*) AS order_cnt,
                CAST((SELECT MAX(CAST(o_orderdate AS DATE)) - 1 FROM orders)
                  AS VARCHAR) AS model_version,
                'xgboost' AS model_algo,
                CAST(16 AS BIGINT) AS model_bytes
         FROM orders
         WHERE CAST(o_orderdate AS DATE) =
           (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
         GROUP BY 1 ORDER BY 1""",
    "fw03_reference_join" ->
      """SELECT c_mktsegment, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         WHERE CAST(o_orderdate AS DATE) = (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "fw04_coincidence_join" ->
      """SELECT o_orderpriority, COUNT(*) AS item_cnt,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         WHERE CAST(o_orderdate AS DATE) = (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
           AND CAST(l_shipdate AS DATE) >= (SELECT MAX(CAST(o_orderdate AS DATE)) - 13 FROM orders)
           AND CAST(l_shipdate AS DATE) <= (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "fw05_backfill" ->
      """SELECT o_orderpriority, COUNT(*) AS order_cnt
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >=
           (SELECT MAX(CAST(o_orderdate AS DATE)) - 1 FROM orders)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "fw07_two_level_dims" ->
      """SELECT 'N' AS flag, l_linestatus, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem
         WHERE l_returnflag = 'N'
           AND CAST(l_shipdate AS DATE) >= (SELECT MAX(CAST(l_shipdate AS DATE)) - 2 FROM lineitem)
         GROUP BY l_linestatus ORDER BY l_linestatus""",
    "fw08_curation_pipeline" ->
      """WITH curated AS (
           SELECT MD5(text) AS text_hash, MIN(doc_id) AS doc_id,
                  MIN(source) AS source, MIN(n_chars) AS n_chars
           FROM documents WHERE lang = 'en' AND n_chars >= 100
           GROUP BY MD5(text))
         SELECT source, COUNT(*) AS kept_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM curated GROUP BY source ORDER BY source""",
    "fw14_semantic_curation" ->
      """WITH base AS (
           SELECT d.doc_id, d.text, d.source, d.n_chars
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
           WHERE d.lang = 'en'),
         corpus AS (
           SELECT doc_id, text, source, n_chars FROM base
           UNION ALL
           SELECT doc_id + 10000000, text || ' (v2)', source, n_chars + 5
           FROM base WHERE doc_id < 30
           UNION ALL
           SELECT doc_id + 20000000, text, source, n_chars
           FROM base WHERE doc_id >= 30 AND doc_id < 60),
         filtered AS (SELECT * FROM corpus WHERE n_chars >= 100),
         deduped AS (
           SELECT f.doc_id, f.text, f.source, f.n_chars FROM filtered f
           JOIN (SELECT md5(text) AS h, MIN(doc_id) AS m
                 FROM filtered GROUP BY md5(text)) g
             ON md5(f.text) = g.h AND f.doc_id = g.m),
         curated AS (
           SELECT * FROM deduped dd
           WHERE NOT (dd.doc_id >= 10000000 AND dd.doc_id < 20000000
             AND EXISTS (SELECT 1 FROM deduped s
                         WHERE s.doc_id = dd.doc_id - 10000000)))
         SELECT source, COUNT(*) AS kept_docs,
                CAST(SUM(n_chars) AS BIGINT) AS total_chars
         FROM curated GROUP BY source ORDER BY source""",
    "fw10_catalog" ->
      """SELECT o_orderstatus, COUNT(*) AS order_cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders
         WHERE CAST(o_orderdate AS DATE) >=
           (SELECT MAX(CAST(o_orderdate AS DATE)) - 1 FROM orders)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "fw09_timezone" ->
      """SELECT '2026-08-11' AS pst_day, o_orderstatus, COUNT(*) AS order_cnt
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "fw15_multi_driver" ->
      """WITH up AS (
           SELECT o_orderpriority, COUNT(*) AS order_cnt
           FROM orders
           WHERE CAST(o_orderdate AS DATE) =
             (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)
           GROUP BY o_orderpriority)
         SELECT CAST(SUM(order_cnt) AS BIGINT) AS total_orders,
                COUNT(*) AS n_priorities
         FROM up""",
    "fw06_range_expansion" ->
      """SELECT STRFTIME(d, '%Y-%m-%d') AS day
         FROM (SELECT UNNEST(GENERATE_SERIES(
                 (SELECT MAX(CAST(o_orderdate AS DATE)) - 29 FROM orders),
                 (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders),
                 INTERVAL 1 DAY)) AS d)
         ORDER BY day""",
    "fw16_n_to_1_link" ->
      """WITH pick AS (
           SELECT DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS d,
                  EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS h
           FROM events WHERE event_type = 'error'
           ORDER BY d DESC, h DESC LIMIT 1)
         SELECT
           (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
            FROM events, pick
            WHERE event_type = 'error'
              AND DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) = pick.d
              AND EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) = pick.h) AS err_sum,
           (SELECT COUNT(*)
            FROM events, pick
            WHERE event_type = 'view'
              AND DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) = pick.d
              AND EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) = pick.h) AS view_cnt"""
  )
}

/** External-module compute for the fw13 gate row — the [[graft.compute.ClassSlot]]
  * analog of the reference's `scala_module` descriptor (api_ext.py:1197-1213):
  * the persisted DAG stores only this class's NAME; the attaching process
  * resolves it reflectively and executes it. Input `day_agg` =
  * (o_orderstatus, order_cnt); output adds each status's share of the day's
  * orders. */
final class Fw13StatusShare extends SlotFunction {
  override def apply(ctx: SlotContext): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    ctx.input("day_agg")
      .withColumn("share", col("order_cnt").cast("double") /
        sum(col("order_cnt")).over(
          Window.partitionBy()).cast("double"))
  }
}
