package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ckpt._

/** Duplicate-cluster resolution + deterministic sampling for corpus
  * curation.
  *
  * Near-dup detection yields PAIRS; curation needs CLUSTERS with one
  * canonical survivor each. [[connectedComponents]] runs min-label
  * propagation over the pair graph — each iteration is one self-join +
  * aggregate (shuffle on ids only), converging in O(graph diameter)
  * rounds, with localCheckpoint cutting lineage growth. This is the
  * standard large-graph CC shape (no driver-side graph).
  */
object Clustering {

  /** (id, component) for every id in `ids`; component = min id reachable
    * through `pairs` (columns d1, d2). Isolated ids form their own
    * singleton components.
    *
    * PRECONDITION (load-bearing since the r20 round-1 shortcut, ADVICE
    * r20 #1): every endpoint of `pairs` must appear in `ids`. Round 1
    * computes neighbor-min over RAW edges without the labels join the
    * later rounds do, so an out-of-`ids` endpoint — which the old inner
    * join silently dropped every round — would become a permanent,
    * nonexistent component label. All repo callers derive pairs from the
    * id table itself (pair emitters join docs to docs), so this is a
    * contract note, not a behavior change; callers with foreign pairs
    * must semi-join them against `ids` first. */
  def connectedComponents(ids: DataFrame, idCol: String,
                          pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // Edge-table build (r20, three changes):
    // - both directions come from ONE explode pass — the historical
    //   union(pairs, swap(pairs)) executed the caller's whole
    //   pair-generation pipeline twice at cache fill;
    // - no distinct(): every repo caller passes already-distinct pairs
    //   (d1 < d2 by construction), and min-aggregation is
    //   duplicate-insensitive anyway — a duplicated edge can only
    //   repeat a min operand, never change it — so the distinct
    //   exchange bought nothing (callers with heavily-duplicated pairs
    //   should dedupe before calling: dupes inflate every round's join
    //   input, though never the result);
    // - pre-partitioned by the PER-ROUND join key `dst`: the loop joins
    //   edges on dst EVERY round, and the old (src,dst)-hashed table
    //   paid a fresh full shuffle of the largest table in the loop each
    //   round. One build-time repartition gives the cache a partitioning
    //   every round's join reuses; only the (smaller) label table
    //   shuffles per round. Rounds >= 2 always — net win at any scale.
    val edges = pairs.select(explode(array(
        struct(col("d1").as("src"), col("d2").as("dst")),
        struct(col("d2").as("src"), col("d1").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
      .repartition(col("dst")).cache()
    var labels = ids.select(col(idCol).as("id"), col(idCol).as("component"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each node adopts the min of (its label, neighbors' labels).
      // Round 1 skips the labels join entirely: labels are pristine
      // (label(id) == id), so the neighbor minimum is just min(dst) per
      // src — one aggregation instead of join + aggregation (r20).
      val neighborMin =
        if (iter == 0)
          edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("nmin"))
        else edges
          .join(labels.withColumnRenamed("id", "dst2"),
            col("dst") === col("dst2"))
          .groupBy(col("src").as("id"))
          .agg(min(col("component")).as("nmin"))
      // checkpoint BEFORE the self-join: both sides of the pointer-jump
      // read `propagated`, and without materialization each re-executed
      // the heavy edges-join + min aggregation above — double the
      // dominant per-round cost on a large pair graph.
      // Ckpt policy storage: two longs/row but O(nodes) ROWS — at 600M
      // docs ~10 GB per round of blocks; the deserialized memory-first
      // unroll is the q35 kill shape, and the loop holds TWO
      // generations live across the pointer jump.
      //
      // Convergence rides the SAME job as the checkpoint via observe()
      // (r21, VERDICT r20 #5 — the loop was driver-round-trip bound at
      // ~50 jobs per call at bench SF): the changed-row count is
      // collected by a CollectMetrics node evaluated WHILE the
      // checkpoint job materializes the blocks, so the separate
      // probe-count job per round disappears — and with it the need to
      // STORE the previous label: `old` is consumed by the metric below
      // the projection and never reaches the checkpoint, cutting the
      // stored row from three longs to two (guide §2.3, projection
      // before materialization).
      //
      // The probe targets the PROPAGATE step, not the jump (r20): a
      // fixed point of neighbor-min propagation already has constant
      // labels along every edge (any edge with unequal labels would
      // change its larger end), i.e. per-component-constant labels =
      // converged — and the pointer jump can never change a fixed point
      // (it only reads labels the propagate left stable). Labels are
      // monotone non-increasing, so a round whose propagate DID change
      // something can never be undone by the jump either. Probing here
      // skips the final round's jump join + checkpoint outright — one
      // full O(nodes) join + materialization saved per call.
      val obs = new org.apache.spark.sql.Observation(s"cc_round_$iter")
      val propagated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"))
        .observe(obs,
          count(when(col("component") =!= col("old"), 1)).as("changed"))
        .drop("old")
        .diskCheckpoint()
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      if (converged) {
        labels = propagated
      } else {
        // pointer-jump (2-hop min): adopt your label's own label — labels
        // always point at in-component ids, so this halves chain depth each
        // round and makes convergence O(log diameter), not O(diameter)
        labels = propagated.as("a")
          .join(propagated.select(col("id").as("cid"), col("component").as("ccomp")),
            col("component") === col("cid"), "left")
          .select(col("id"),
            least(col("component"), coalesce(col("ccomp"), col("component")))
              .as("component"))
          .diskCheckpoint() // cut iterative lineage (DISK_ONLY: O(nodes))
      }
      iter += 1
    }
    edges.unpersist()
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations — " +
        "components would be silently split; raise maxIter")
    labels.withColumnRenamed("id", idCol)
  }

  /** Cluster each document by near-dup pairs and keep the canonical (min
    * id) representative per component: pairs → dedup decision in one call. */
  def canonicalize(docs: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(docs.select(idCol), idCol, pairs)
    docs.join(cc, idCol)
      .withColumn("is_canonical", col(idCol) === col("component"))
  }
}

/** Deterministic sampling / source mixing: hash thresholds instead of RNG —
  * reproducible across runs, engines, and cluster sizes, and expressible
  * in plain SQL for verification (`md5(key) < hex-threshold` keeps
  * ~threshold/2^16 of rows uniformly). */
object Sampling {

  /** md5 hex is lowercase; an uppercase threshold would compare against
    * the wrong code points and silently sample at the wrong rate. */
  private def requireHex4(thr: String): Unit =
    require(thr.matches("[0-9a-f]{4}"),
      s"threshold must be 4 LOWERCASE hex chars (md5 output is lowercase), got '$thr'")

  /** Keep rows whose md5(key) falls under `hexThreshold` (4 hex chars:
    * "2000" ≈ 12.5%). Uniform, deterministic, join-stable. */
  def deterministicSample(df: DataFrame, keyCol: String, hexThreshold: String): DataFrame = {
    requireHex4(hexThreshold)
    df.where(substring(md5(col(keyCol).cast("string")), 1, 4) < hexThreshold)
  }

  /** Mix sources at different deterministic rates: (sourceValue →
    * 4-hex-char threshold); rows of unlisted sources are dropped. */
  def mixByWeight(df: DataFrame, sourceCol: String, keyCol: String,
                  thresholds: Map[String, String]): DataFrame = {
    thresholds.values.foreach(requireHex4)
    val cases = thresholds.foldLeft(lit("0000")) { case (acc, (src, thr)) =>
      when(col(sourceCol) === src, lit(thr)).otherwise(acc)
    }
    df.where(substring(md5(col(keyCol).cast("string")), 1, 4) < cases)
  }

  /** Deterministic token-budget selection — the training-mix assembly
    * step: order documents by (orderCol DESC, id) and keep the prefix
    * whose RUNNING token total (inclusive of the row itself) stays
    * within `budget`. Returns kept rows plus `cum_tokens`.
    *
    * Scale shape: a single global `Window.orderBy` would drag the corpus
    * onto one partition, so this is the classic distributed prefix sum
    * instead — range-repartition by the total order, per-partition
    * running totals under a partition-local window, then one tiny
    * (numPartitions-row) offset table broadcast back in. The total order
    * (orderCol DESC, id ASC) is unique, so the kept SET is identical to
    * the single-window answer and to a SQL `SUM OVER (ORDER BY ...)`
    * replay, independent of partitioning. */
  /** Distributed GLOBAL running total of `tokenCol` under a unique total
    * order — the scale-safe replacement for `Window.orderBy(...)` (which
    * drags everything onto one partition): range-repartition by the
    * order, partition-local running totals, one numPartitions-row offset
    * table folded back in (broadcast-joined on the partition id — O(1)
    * plan size at any partition count). Adds `cum_tokens` (inclusive of
    * the row); negative token values are fine (partition totals are true
    * sums, not running maxima). The order MUST be total (include a
    * unique tiebreaker) or the result is partition-dependent. */
  private[operators] def runningTotal(df: DataFrame, tokenCol: String,
                                      order: Seq[org.apache.spark.sql.Column],
                                      partitions: Int = 0,
                                      retain: Seq[String] = Nil): DataFrame = {
    val n = if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    // the checkpoint pins ONE range partitioning for both the offset
    // pass and the final projection (range boundaries come from
    // sampling — two independent evaluations must not disagree on
    // pids). This call site is where the r19 sf100 bench found the
    // memory-first unroll failure (q35's 3n-row events table, 32
    // concurrent ~1.2 GB unrolls, UNABLE_TO_ACQUIRE_MEMORY) — the
    // post-mortem and the repo-wide DISK_ONLY policy it produced live
    // in [[Ckpt]]; r20 applied it to every corpus-proportional
    // checkpoint, not just this one.
    // `retain` (r20): columns to KEEP through the checkpoint (plus
    // tokenCol, which the offset fold reads). The checkpoint stores FULL
    // rows and downstream column pruning cannot reach back through it,
    // so order-only columns a caller never reads again (q35's partition
    // strings and the probe value `__v`) would otherwise be serialized,
    // written and re-read twice for nothing — at 100x the events table
    // is 45M rows and the checkpoint serde is the row's dominant cost.
    // Nil (the default) retains everything, the historical behavior.
    // The projection happens AFTER the window (same plan, pre-storage):
    // the range partitioning and the order still see every order column.
    val keep: Option[Seq[org.apache.spark.sql.Column]] =
      if (retain.isEmpty) None
      else Some((retain :+ tokenCol).distinct.map(col) ++
        Seq(col("__pid"), col("__local")))
    val staged = df
      .repartitionByRange(n, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__local", sum(col(tokenCol)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__pid"))
          .orderBy(order: _*)))
    val local = keep.map(cs => staged.select(cs: _*)).getOrElse(staged)
      .diskCheckpoint()
    // one row per non-empty partition; range partitions ascend with the
    // total order, so the exclusive prefix over pid order is the offset.
    // sum(tokenCol) — not max(__local) — is the partition total, which
    // stays correct for NEGATIVE token values (a running max ≠ the total
    // when the running sum dips)
    // coalesce: a partition whose token values are ALL null sums to null
    // — it contributes nothing to the running total (matching the window
    // sum's null-skipping), so fold it as 0 instead of NPE-ing on getLong
    // per-partition totals fold in the COLUMN'S OWN numeric family: the
    // old unconditional cast-to-long truncated fractional token columns
    // at every partition boundary, drifting cum_tokens from the single-
    // window answer (and varying with partition count)
    val tokenType = df.schema(tokenCol).dataType
    val integral = tokenType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // decimals fold exactly too: routing them through the double path
    // made the OFFSETS float while the window's __local stayed exact
    // decimal — cum_tokens then varied with the partition count at the
    // budget boundary, the drift this family-preserving fold exists to
    // prevent
    val isDecimal =
      tokenType.isInstanceOf[org.apache.spark.sql.types.DecimalType]
    val totalRows = local.groupBy("__pid")
      .agg(coalesce(sum(col(tokenCol)), lit(0))
        .cast(if (integral) "long"
              else if (isDecimal) "decimal(38,18)"
              else "double").as("__ptotal"))
      .collect().sortBy(_.getInt(0))
    // fold the offsets back in via a BROADCAST JOIN on __pid, never a
    // when-chain: an O(numPartitions)-deep when(...).otherwise(...) tree
    // blows up codegen/analysis once `partitions` reaches the thousands
    // (the scale this operator exists for)
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf =
      if (integral) {
        var acc = 0L
        totalRows.toSeq.map { r =>
          val e = (r.getInt(0), acc); acc += r.getLong(1); e
        }.toDF("__pid", "__offset")
      } else if (isDecimal) {
        var acc = java.math.BigDecimal.ZERO
        totalRows.toSeq.map { r =>
          val e = (r.getInt(0), acc); acc = acc.add(r.getDecimal(1)); e
        }.toDF("__pid", "__offset")
      } else {
        var acc = 0.0
        totalRows.toSeq.map { r =>
          val e = (r.getInt(0), acc); acc += r.getDouble(1); e
        }.toDF("__pid", "__offset")
      }
    local.join(broadcast(offsetDf), Seq("__pid"), "left")
      .withColumn("cum_tokens",
        col("__local") + coalesce(col("__offset"), lit(0L)))
      .drop("__pid", "__local", "__offset")
  }

  def takeByTokenBudget(df: DataFrame, tokenCol: String, orderCol: String,
                        idCol: String, budget: Long,
                        partitions: Int = 0): DataFrame =
    runningTotal(df, tokenCol,
      Seq(col(orderCol).desc, col(idCol).asc), partitions)
      .where(col("cum_tokens") <= budget)

  /** Deterministic stratified sampling: EXACT per-group quotas (unlike
    * threshold sampling, which is only proportional in expectation). Rows
    * rank by md5(key) inside each group — a reproducible, engine-agnostic
    * shuffle order — and the first `quota` survive. One hash-partitioned
    * window per group; no driver-side collection. */
  def stratifiedSample(df: DataFrame, groupCol: String, keyCol: String,
                       quota: Int): DataFrame = {
    // final tiebreaker = hash of the WHOLE row: rows sharing a keyCol
    // value are exact peers under (md5(key), key) and row_number would
    // break the tie by partition arrival order — the quota-boundary
    // survivors would change run to run. Exact duplicate rows remain
    // interchangeable (identical hash), which is harmless: either copy
    // is the same sample.
    val rowTie = xxhash64(struct(df.columns.map(col).toSeq: _*))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(keyCol).cast("string")), col(keyCol), rowTie)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= quota)
      .drop("__rk")
  }
}

/** Training-sequence preparation: per-document chunking and corpus-level
  * sequence-packing assignment. */
object Packing {

  /** Sliding-window chunks of `chunkTokens` whitespace tokens with
    * `overlapTokens` overlap — context-window preparation for training /
    * embedding. Chunk starts are multiples of (chunkTokens − overlap)
    * below the token count, so tail chunks may be short; one row per
    * chunk: (idCol, chunk_idx, chunk_text, n_chunk_tokens). Empty,
    * whitespace-only, and null documents yield ZERO chunks (split of ""
    * is [""], which would otherwise fabricate a phantom 1-token chunk).
    * Pure narrow per-row fan-out — no shuffle at all. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens > overlapTokens && overlapTokens >= 0,
      s"need chunkTokens > overlapTokens >= 0, got $chunkTokens/$overlapTokens")
    val stride = chunkTokens - overlapTokens
    // filter empty tokens: SQL trim strips SPACES only, so a tab or
    // newline at either edge leaves "" entries in the split — phantom
    // tokens that shift every chunk boundary and inflate the counts
    // (the unigramLogProbScore __t =!= "" rule, applied to the array)
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    // posexplode of an empty array emits no row, dropping degenerate docs;
    // the guard is "contains any non-whitespace" (SQL trim strips SPACES
    // only, so a tabs/newlines-only doc would survive a trim = "" check)
    val chunks = when(coalesce(col(textCol), lit("")).rlike("\\S"),
        transform(
          sequence(lit(0), size(toks) - 1, lit(stride)),
          s => concat_ws(" ", slice(toks, s + 1, lit(chunkTokens)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), posexplode(chunks))
      .select(col(idCol), col("pos").as("chunk_idx"),
        col("col").as("chunk_text"),
        size(split(col("col"), "\\s+")).as("n_chunk_tokens"))
  }

  /** Concat-and-split sequence-packing ASSIGNMENT (the GPT-style
    * training layout: documents concatenated in id order, cut into
    * fixed `seqLen`-token sequences): for each document, its global
    * token offset and the first/last sequence it lands in. The global
    * offsets are a distributed prefix sum ([[Sampling.runningTotal]] —
    * no single-partition window), so this assigns sequences for a
    * corpus of any size; the actual token materialization is a narrow
    * follow-up join per training shard. Output: (idCol, n_tokens,
    * start_tok, first_seq, last_seq). */
  def packSequences(df: DataFrame, tokenCol: String, idCol: String,
                    seqLen: Int, partitions: Int = 0): DataFrame = {
    require(seqLen > 0)
    Sampling.runningTotal(df, tokenCol, Seq(col(idCol).asc), partitions)
      .where(col(tokenCol) > 0)
      .select(col(idCol), col(tokenCol).cast("long").as("n_tokens"),
        (col("cum_tokens") - col(tokenCol)).as("start_tok"))
      .withColumn("first_seq", floor(col("start_tok") / seqLen))
      .withColumn("last_seq",
        floor((col("start_tok") + col("n_tokens") - 1) / seqLen))
  }
}

/** Benchmark-contamination detection for training corpora: a document is
  * contaminated when it shares at least one word n-gram with the benchmark
  * set. The check is an inverted-index LEFT SEMI join on grams — only
  * documents that share a gram ever meet, never an all-pairs comparison —
  * so it scales like the dedup operators. */
object Contamination {

  /** Ids of `df` documents sharing >= 1 n-gram with `benchmark`. The
    * inverted index joins on 64-bit gram hashes ([[Dedup.hashedShingles]])
    * — 8-byte shuffle keys instead of gram strings; a false positive
    * needs a corpus gram colliding with a benchmark gram in 64 bits
    * (~2⁻⁶⁴ per gram pair — negligible against the harm model, which is
    * over-EXCLUSION of a training doc, not leakage). */
  def contaminatedIds(df: DataFrame, textCol: String, idCol: String,
                      benchmark: DataFrame, benchTextCol: String,
                      n: Int = 3): DataFrame = {
    val docGrams = df.select(col(idCol),
      explode(Dedup.hashedShingles(col(textCol), n)).as("__g"))
    val benchGrams = benchmark
      .select(explode(Dedup.hashedShingles(col(benchTextCol), n)).as("__g"))
      .distinct()
    docGrams.join(benchGrams, Seq("__g"), "left_semi")
      .select(idCol).distinct()
  }
}
