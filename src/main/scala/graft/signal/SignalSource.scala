package graft.signal

import graft.dimension._

/** How a dataset/resource is laid out and validated.
  * Reference: core/signal_processing/signal_source.py (attrs 481-560,
  * integrity protocols 790-815).
  */
sealed trait IntegrityProtocol
object IntegrityProtocol {
  /** Resource (partition dir) presence is enough. */
  case object None_ extends IntegrityProtocol
  /** Completion marker: ANY of `files` existing in the partition
    * completes it, probed in order. The reference's FILE_CHECK accepts a
    * list of acceptable completion resource names for exactly this case
    * (mixed upstream conventions — a Hive writer's `_SUCCESS` next to a
    * vendor's `manifest.json`): signal_processing/analysis.py:27-38,
    * protocol at signal.py:118-135. Internal sinks always WRITE the
    * first name; alternatives matter on marshaled external data. */
  final case class FileCheck(files: Seq[String]) extends IntegrityProtocol {
    require(files.nonEmpty, "FileCheck needs at least one marker name")
  }
  object FileCheck {
    def apply(): FileCheck = FileCheck(Seq("_SUCCESS"))
    /** Single-name (common) + alternatives as trailing varargs. */
    def apply(file: String, alternatives: String*): FileCheck =
      FileCheck(file +: alternatives.toSeq)
  }
}

/** REPLACE → SaveMode.Overwrite, APPEND → SaveMode.Append
  * (reference: signal_source.py:550-560). */
sealed trait DatasetType
object DatasetType {
  case object REPLACE extends DatasetType
  case object APPEND extends DatasetType
}

/** Dataset-level attributes (reference: signal_source.py:481-560; CSV with
  * '|' delimiter + header is the reference default, we default to parquet —
  * the Spark-native choice — while supporting the same surface). */
final case class DatasetAttrs(
    format: String = "parquet",
    delimiter: String = "|",
    header: Boolean = true,
    /** Charset of text formats (csv/json/text) — reference
      * DATASET_ENCODING_KEY, signal_source.py:483-484 (default utf-8);
      * None delegates to Spark's own UTF-8 default. */
    encoding: Option[String] = None,
    compression: Option[String] = None,
    schemaJson: Option[String] = None,
    partitionKeys: Seq[String] = Nil,
    primaryKeys: Seq[String] = Nil,
    datasetType: DatasetType = DatasetType.REPLACE,
    dataFolder: Option[String] = None,
    /** Versioned REPLACE (r17): each rewrite lands in a fresh
      * `data_v<N>/` dir inside the partition and commits with ONE
      * immutable pointer PUT (`data_ptr.v<N>` —
      * [[graft.compute.Compaction.VersionedDir]] semantics). A reader
      * mid-scan of the previous version keeps reading intact files (the
      * current + one previous version survive each write), so a
      * RECOMPUTE (backfill, corrected upstream) can never present a
      * half-cleared partition to a concurrent consumer — the in-place
      * overwrite's unavoidable window on object stores without atomic
      * dir swap. REPLACE-only (an APPEND never clears, so it has no
      * such window); composes with every format; excludes `dataFolder`
      * (the version dirs ARE the data indirection). */
    versioned: Boolean = false,
    /** Trigger-only pseudo-dataset (reference DataType.RAW_CONTENT,
      * application.py:4686): partitions carry a completion marker but no
      * loadable data — compute must not register it as an input view. */
    rawContent: Boolean = false,
    /** Model-artifact attributes (reference DataType.MODEL_ARTIFACT +
      * MODEL_METADATA/model_format, signal_source.py:107,148-152;
      * marshal_external_model api_ext.py:1127-1166): artifact signals
      * are rawContent (opaque bytes, never a DataFrame) — compute reads
      * the artifact PATH from its SlotContext.inputSignals and these
      * attrs carry the declared metadata with the signal. */
    modelMetadata: Map[String, String] = Map.empty,
    modelFormat: Option[String] = None,
    /** Managed-write file-size governance: target on-disk bytes per part
      * file. When set, [[graft.compute.OutputWriter]] derives a file
      * count from the plan's size estimate and repartitions before the
      * write, so a wide upstream shuffle (1000s of tasks) cannot spray
      * 1000s of tiny files into the partition — at 100 TB the
      * small-file problem dominates NameNode/list/open costs long
      * before query cost does. The reference's sink has no such control
      * (glueetl_default_ABI.py:380-446 writes one file per task); this
      * is a deliberate improvement. */
    targetFileBytes: Option[Long] = None,
    /** Hard per-file record cap, applied as Spark's `maxRecordsPerFile`
      * write option: files roll WITHIN a task, so this bounds the skewed
      * task's output file size without a shuffle — the backstop when
      * the size estimate behind [[targetFileBytes]] is off. */
    maxRecordsPerFile: Option[Long] = None)

/** Where a signal's resources live. The path⇄dimension codec lives here:
  * `materializePath` renders `root/dim1/dim2/...` from a value tuple;
  * `extractDims` parses a physical path back into dimension values.
  * Reference: signal_source.py:171-430 (extract at 282-340).
  */
sealed trait SignalSourceKind
object SignalSourceKind {
  case object EXTERNAL extends SignalSourceKind // S3/FS-style external dataset
  case object INTERNAL extends SignalSourceKind // managed output dataset
  case object CATALOG extends SignalSourceKind  // catalog table w/ partition keys
  case object TIMER extends SignalSourceKind
  case object METRIC extends SignalSourceKind
  case object ALARM extends SignalSourceKind
}

final case class SignalSource(
    kind: SignalSourceKind,
    rootPath: String,
    attrs: DatasetAttrs = DatasetAttrs(),
    protocol: IntegrityProtocol = IntegrityProtocol.None_,
    /** optional `name=` style partition prefixes per depth, e.g.
      * Seq("", "partition_day=") renders root/NA/partition_day=2021-01-13 */
    partitionPrefixes: Seq[String] = Nil) {

  private def prefixAt(i: Int): String =
    if (i < partitionPrefixes.length) partitionPrefixes(i) else ""

  /** Render one concrete partition path from a value tuple. */
  def materializePath(values: Seq[DimValue]): String = {
    val parts = values.zipWithIndex.map { case (v, i) => prefixAt(i) + v.transform().value }
    (rootPath +: parts).mkString("/")
  }

  /** All concrete paths of a materialized filter, tip first. */
  def materializePaths(filter: DimFilter): Seq[String] =
    filter.tuples.map(materializePath(_))

  /** Parse a physical resource path back into raw dimension value strings.
    * Returns None if the path is not under this source's root. */
  def extractDims(path: String, depth: Int): Option[Seq[String]] = {
    val normalized = path.stripSuffix("/")
    // boundary-aware prefix: "/data/ab" must NOT match root "/data/a"
    if (normalized != rootPath && !normalized.startsWith(rootPath + "/")) None
    else {
      val rest = normalized.drop(rootPath.length).stripPrefix("/")
      if (rest.isEmpty) Some(Nil)
      else {
        val segs = rest.split('/').toSeq
        if (segs.length < depth) None
        else Some(segs.take(depth).zipWithIndex.map { case (s, i) =>
          s.stripPrefix(prefixAt(i))
        })
      }
    }
  }
}

object SignalSource {
  /** Managed internal dataset path layout `/internal_data/{id}/{dims...}`
    * with _SUCCESS completion (reference: signal_source.py:790-815,
    * internal/nodes.py:43). */
  def internal(rootDir: String, nodeId: String): SignalSource =
    SignalSource(SignalSourceKind.INTERNAL, s"$rootDir/internal_data/$nodeId",
      protocol = IntegrityProtocol.FileCheck("_SUCCESS"))

  def external(rootPath: String, attrs: DatasetAttrs = DatasetAttrs(),
               protocol: IntegrityProtocol = IntegrityProtocol.None_,
               partitionPrefixes: Seq[String] = Nil): SignalSource =
    SignalSource(SignalSourceKind.EXTERNAL, rootPath.stripSuffix("/"), attrs,
      protocol, partitionPrefixes)

  /** Timer signal: `<timer_id>/<date>` (reference: signal_source.py:1103-1160). */
  def timer(timerId: String): SignalSource =
    SignalSource(SignalSourceKind.TIMER, timerId)

  /** Alarm signal: `<alarm_id>/<state_transition>/<time>` (reference
    * AlarmDimension, metric_alarm_defs.py:195-205 — STATE_TRANSITION
    * string + TIME datetime). */
  def alarm(alarmId: String): SignalSource =
    SignalSource(SignalSourceKind.ALARM, alarmId)

  /** Catalog table (reference S2, glueetl_default_ABI.py:146-158 +
    * glue/catalog.py): reads go through `spark.table(db.tbl)` with `isin`
    * partition-key predicates — Catalyst prunes partitions, the direct
    * analog of the reference's `WHERE pk IN (...)` pushdown query. */
  def catalog(database: String, table: String): SignalSource =
    SignalSource(SignalSourceKind.CATALOG, s"catalog://$database.$table")
}

object CatalogSource {
  /** "catalog://db.tbl" → "db.tbl" */
  def tableName(source: SignalSource): String =
    source.rootPath.stripPrefix("catalog://")
}
