package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Second block of the delegated relational surface (SURVEY.md §2.b):
  * cube/grouping sets, analytic windows (lag/lead/ntile/percent_rank),
  * string/math/array/JSON/conditional/regexp scalar functions. Math sticks
  * to operations with exact cross-engine parity (sqrt is correctly-rounded
  * IEEE; integer pow via multiplication; no libm exp/log whose last ulp
  * differs between runtimes).
  */
object Relational2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- CUBE: all grouping combinations with grouping-null coalesce
    "q22_cube" -> ((s, dir) => {
      t(s, dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("total"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("cnt"), col("total"))
        .orderBy("status", "priority")
    }),

    // ---- GROUPING SETS via SQL on a temp view
    "q23_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
      s.sql("""
        SELECT COALESCE(l_returnflag, 'ALL') AS rf,
               COALESCE(l_linestatus, 'ALL') AS ls,
               COUNT(*) AS cnt
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY rf, ls""")
    }),

    // ---- analytic window: lag/lead over order history per customer
    "q24_lag_lead" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .where(col("prev_order").isNotNull)
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- ntile + percent_rank + cume_dist — via the distributed
    // global-rank operator, NOT Window.orderBy with no partition: the
    // single-window form drags the whole table onto one partition
    // (WindowExec's own warning), a scale-killer for an SF-proportional
    // input. The order is total (o_orderkey tiebreak), so the derived
    // ranks match the single-window answer exactly (RankingSuite pins).
    "q25_ntile" -> ((s, dir) => {
      import graft.operators.Ranking
      val (ranked, total) = Ranking.withGlobalRowNumber(
        t(s, dir, "orders"),
        Seq(col("o_totalprice").desc, col("o_orderkey")))
      ranked.select(col("o_orderkey"),
          Ranking.ntileOf(col("rn"), total, 4).as("quartile"),
          round(Ranking.percentRankOf(col("rn"), total), 6).as("pct_rank"),
          round(Ranking.cumeDistOf(col("rn"), total), 6).as("cume"))
        .orderBy("o_orderkey")
    }),

    // ---- string functions
    "q26_string_funcs" -> ((s, dir) => {
      t(s, dir, "customer")
        .select(col("c_custkey"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
          regexp_replace(col("c_name"), "Customer", "Cust").as("renamed"),
          reverse(col("c_mktsegment")).as("seg_rev"),
          substring(col("c_name"), -5, 5).as("name_tail"),
          instr(col("c_name"), "#").as("hash_pos"),
          repeat(lit("x"), col("c_nationkey")).as("xs"))
        .orderBy("c_custkey")
    }),

    // ---- exact-parity math
    "q27_math_funcs" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .orderBy("l_orderkey", "l_linenumber").limit(2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          ceil(col("l_quantity")).cast("double").as("ceil_q"),
          floor(col("l_extendedprice")).cast("double").as("floor_p"),
          (col("l_extendedprice") * col("l_extendedprice")).as("p_sq"),
          sqrt(col("l_quantity")).as("sqrt_q"),
          signum(col("l_discount") - 0.05).as("sign_d"),
          pmod(col("l_orderkey"), lit(97)).as("mod_ok"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- array functions over tokenized text
    "q28_array_funcs" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).as("n_words"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct_words"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"),
          concat_ws(",", slice(sort_array(array_distinct(split(col("text"), " "))), 1, 5))
            .as("first5_sorted"))
        .orderBy("doc_id")
    }),

    // ---- JSON extraction from the events.props payload
    "q29_json" -> ((s, dir) => {
      EventTables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("cnt"), sum(col("k")).as("k_sum"))
        .orderBy("k_mod")
    }),

    // ---- conditionals: nullif/coalesce/greatest/least/case
    "q30_conditionals" -> ((s, dir) => {
      t(s, dir, "supplier")
        .select(col("s_suppkey"),
          coalesce(nullif(col("s_acctbal"), lit(0.0)), lit(-1.0)).as("bal_or_neg"),
          greatest(col("s_acctbal"), lit(1000.0)).as("floor_1k"),
          least(col("s_nationkey"), lit(10)).as("nat_cap"),
          when(col("s_acctbal") > 5000, "high")
            .when(col("s_acctbal") > 1000, "mid")
            .otherwise("low").as("tier"))
        .orderBy("s_suppkey")
    }),

    // ---- min-per-group correlated lookup (TPC-H Q2 shape): cheapest
    // supplier per nation via join-with-min (decorrelated)
    "q32_min_per_group" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
      val minBal = sup.groupBy(col("s_nationkey").as("nk"))
        .agg(min(col("s_acctbal")).as("min_bal"))
      sup.join(minBal, col("s_nationkey") === col("nk") &&
          col("s_acctbal") === col("min_bal"))
        .select("s_nationkey", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_nationkey", "s_suppkey")
    }),

    // ---- double-EXISTS / NOT-EXISTS combination (TPC-H Q21 shape)
    "q33_exists_combo" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("ord33")
      t(s, dir, "lineitem").createOrReplaceTempView("li33")
      s.sql("""
        SELECT o_orderkey, o_orderstatus FROM ord33 o
        WHERE EXISTS (SELECT 1 FROM li33 l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
          AND NOT EXISTS (SELECT 1 FROM li33 l2
                          WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity > 45)
        ORDER BY o_orderkey""")
    }),

    // ---- regexp extraction/matching
    "q31_regexp" -> ((s, dir) => {
      t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("type_head"),
          col("p_brand").rlike("Brand#[0-9]+").as("brand_ok"),
          size(regexp_extract_all(col("p_name"), lit("[aeiou]"), lit(0))).as("n_vowels"))
        .orderBy("p_partkey")
    }),

    // ---- lateral explode (UNNEST family): one row per word token with
    // its position, re-aggregated — the generator/flatten surface
    "q34_lateral_explode" -> ((s, dir) => {
      t(s, dir, "documents").where(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(trim(col("text")), "\\s+")).as(Seq("pos", "word")))
        .groupBy("word")
        .agg(count(lit(1)).as("occurrences"),
          min(col("doc_id")).as("first_doc"),
          min(col("pos")).cast("long").as("min_pos"))
        .where(col("occurrences") >= 10)
        .orderBy("word")
    }),

    // ---- RANGE-frame window: value-based frame (orders within 50k price
    // below the current row), vs the row-based frames of q08
    // RANGE-frame count via the distributed prefix-count rewrite, NOT a
    // native RANGE window: Spark's sliding range frame re-aggregates the
    // frame buffer per row AND parallelizes only across the 3 statuses —
    // the sf1 gate measured 850 s for this one row (BASELINE r16) vs
    // seconds for the rewrite. Results are bit-identical (RankingSuite).
    "q35_range_frame" -> ((s, dir) => {
      graft.operators.Ranking.rangeCountPreceding(
          t(s, dir, "orders")
            .select("o_orderkey", "o_orderstatus", "o_totalprice"),
          Seq("o_orderstatus"), "o_totalprice", 50000.0,
          keyCol = "o_orderkey", outCol = "peers_within_50k")
        .select("o_orderkey", "o_orderstatus", "o_totalprice",
          "peers_within_50k")
        .orderBy("o_orderkey")
    })
  )

  val oracles: Map[String, String] = Map(
    "q22_cube" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         COALESCE(o_orderpriority, 'ALL') AS priority,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q23_grouping_sets" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
         COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS cnt
         FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY rf, ls""",
    "q24_lag_lead" ->
      """SELECT o_custkey, o_orderkey, prev_order, next_order FROM (
           SELECT o_custkey, o_orderkey,
             LAG(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
             LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
           FROM orders) x
         WHERE prev_order IS NOT NULL ORDER BY o_custkey, o_orderkey""",
    "q25_ntile" ->
      """SELECT o_orderkey,
         NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS quartile,
         ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice DESC, o_orderkey), 6) AS pct_rank,
         ROUND(CUME_DIST() OVER (ORDER BY o_totalprice DESC, o_orderkey), 6) AS cume
         FROM orders ORDER BY o_orderkey""",
    "q26_string_funcs" ->
      """SELECT c_custkey,
         LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
         REPLACE(c_name, 'Customer', 'Cust') AS renamed,
         REVERSE(c_mktsegment) AS seg_rev,
         SUBSTRING(c_name, LENGTH(c_name) - 4, 5) AS name_tail,
         INSTR(c_name, '#') AS hash_pos,
         REPEAT('x', c_nationkey) AS xs
         FROM customer ORDER BY c_custkey""",
    "q27_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
         ABS(l_discount - 0.05) AS abs_d,
         CAST(CEIL(l_quantity) AS DOUBLE) AS ceil_q,
         CAST(FLOOR(l_extendedprice) AS DOUBLE) AS floor_p,
         l_extendedprice * l_extendedprice AS p_sq,
         SQRT(l_quantity) AS sqrt_q,
         CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_d,
         l_orderkey % 97 AS mod_ok
         FROM (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000) t
         ORDER BY l_orderkey, l_linenumber""",
    "q28_array_funcs" ->
      """SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_words,
         list_contains(string_split(text, ' '), 'spark') AS has_spark,
         array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], ',')
           AS first5_sorted
         FROM documents ORDER BY doc_id""",
    "q29_json" ->
      """SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
         COUNT(*) AS cnt,
         CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
         FROM events GROUP BY 1 ORDER BY k_mod""",
    "q30_conditionals" ->
      """SELECT s_suppkey,
         COALESCE(NULLIF(s_acctbal, 0.0), -1.0) AS bal_or_neg,
         GREATEST(s_acctbal, 1000.0) AS floor_1k,
         LEAST(s_nationkey, 10) AS nat_cap,
         CASE WHEN s_acctbal > 5000 THEN 'high'
              WHEN s_acctbal > 1000 THEN 'mid' ELSE 'low' END AS tier
         FROM supplier ORDER BY s_suppkey""",
    "q32_min_per_group" ->
      """SELECT s_nationkey, s_suppkey, s_name, s_acctbal
         FROM supplier s JOIN (
           SELECT s_nationkey AS nk, MIN(s_acctbal) AS min_bal
           FROM supplier GROUP BY s_nationkey) m
         ON s.s_nationkey = m.nk AND s.s_acctbal = m.min_bal
         ORDER BY s_nationkey, s_suppkey""",
    "q33_exists_combo" ->
      """SELECT o_orderkey, o_orderstatus FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
           AND NOT EXISTS (SELECT 1 FROM lineitem l2
                           WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity > 45)
         ORDER BY o_orderkey""",
    "q31_regexp" ->
      """SELECT p_partkey,
         REGEXP_EXTRACT(p_type, '^([A-Z]+)', 1) AS type_head,
         REGEXP_MATCHES(p_brand, 'Brand#[0-9]+') AS brand_ok,
         len(REGEXP_EXTRACT_ALL(p_name, '[aeiou]')) AS n_vowels
         FROM part ORDER BY p_partkey""",
    "q34_lateral_explode" ->
      """WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
                        FROM documents WHERE doc_id < 50),
         pos AS (SELECT doc_id, UNNEST(w) AS word,
                        generate_subscripts(w, 1) - 1 AS pos FROM words)
         SELECT word, COUNT(*) AS occurrences, MIN(doc_id) AS first_doc,
                CAST(MIN(pos) AS BIGINT) AS min_pos
         FROM pos GROUP BY word HAVING COUNT(*) >= 10 ORDER BY word""",
    "q35_range_frame" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice,
         COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
           RANGE BETWEEN 50000.0 PRECEDING AND CURRENT ROW) AS peers_within_50k
         FROM orders ORDER BY o_orderkey"""
  )
}
