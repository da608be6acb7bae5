package graft.compute

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.signal.Signal

/** Unit of compute attached to a data node. The reference ships user code to
  * Glue/EMR/Athena (slot.py:16-174); Spark-native slots run in-process:
  *
  * - [[ScalaSlot]]: `Map[alias -> DataFrame] => DataFrame` — the idiomatic
  *   form; full Dataset API available.
  * - [[SqlSlot]]: multi-statement SQL with `{dim}` placeholders interpolated
  *   from output dimension values (reference aws_athena.py:542-561 +
  *   api_ext.py:192-227). Inputs are registered as temp views under their
  *   alias and `inputN` before execution; the last statement's result is the
  *   output.
  * - [[InlinedSlot]]: driver-side callback (reference SYNC_INLINED,
  *   constructs.py:4369-4436) — side effects, no output DataFrame.
  */
sealed trait Slot
final case class ScalaSlot(f: SlotContext => DataFrame) extends Slot
final case class SqlSlot(sql: String) extends Slot
final case class InlinedSlot(f: SlotContext => Unit) extends Slot

/** Compute resolved by CLASS NAME at run time — the reference's
  * external-module compute descriptors (`scala_module` api_ext.py:1197,
  * `python_module` :1168, `sql_module` :1214): the DAG stores only the
  * name, so a persisted app ([[graft.app.Application!.saveDevState]])
  * round-trips Scala compute — unlike a [[ScalaSlot]] closure, which
  * cannot travel across JVMs — and a fresh process re-resolves the
  * implementation from its own classpath. The named class must
  * implement [[SlotFunction]] and have a no-arg constructor, or be a
  * Scala `object` extending it. Resolution is probed at declaration
  * time (`createData` fails fast on a missing/mistyped class) and
  * happens again in the executing JVM. */
final case class ClassSlot(className: String) extends Slot

/** Implemented by user compute classes named in a [[ClassSlot]]. */
trait SlotFunction extends Serializable {
  def apply(ctx: SlotContext): DataFrame
}

object ClassSlot {
  /** Load + instantiate the named [[SlotFunction]]: a plain class via
    * its no-arg constructor, or a Scala `object` via its singleton
    * (both `my.Obj` and `my.Obj$` spellings accepted). */
  def resolve(className: String): SlotFunction = {
    def load(n: String): Option[Class[_]] =
      try Some(Class.forName(n))
      catch { case _: ClassNotFoundException => None }
    def instantiate(cls: Class[_]): Option[Any] =
      // assignability gates INSTANTIATION: running arbitrary no-arg
      // constructors of classes that are not SlotFunctions executes
      // side effects (and surfaces raw reflection errors) for nothing
      if (!classOf[SlotFunction].isAssignableFrom(cls)) None
      else if (cls.getName.endsWith("$"))
        try Some(cls.getField("MODULE$").get(null))
        catch { case _: NoSuchFieldException => None }
      else
        try Some(cls.getDeclaredConstructor().newInstance())
        catch { case _: NoSuchMethodException => None }
    // a Scala `object Foo` compiles to BOTH a static-forwarder class
    // `Foo` (no usable constructor) and the `Foo$` singleton — try the
    // given spelling first, then the singleton
    val classes = Seq(className, className + "$").flatMap(load(_))
    if (classes.isEmpty)
      throw new IllegalArgumentException(
        s"ClassSlot: class '$className' not found on the classpath")
    classes.flatMap(instantiate(_))
      .collectFirst { case f: SlotFunction => f }
      .getOrElse(throw new IllegalArgumentException(
        s"ClassSlot: '${classes.map(_.getName).mkString("' / '")}' does " +
          "not implement graft.compute.SlotFunction (with a no-arg " +
          "constructor or as a Scala object)"))
  }
}

/** What user code receives (reference glueetl_default_ABI.py:41-62 reserved
  * keywords: spark, inputs by alias and positional inputN, output dimensions
  * map, args). `log` appends to the execution's compute-record log buffer
  * (reference get_compute_record_logs, application.py:2268-2308 — remote
  * drivers stream slot output to a log repository; in-process slots write
  * straight into the record), so a failed run's diagnostics travel WITH
  * its ComputeRecord instead of vanishing into driver stderr. */
final case class SlotContext(
    spark: SparkSession,
    inputs: Map[String, DataFrame],
    inputList: List[DataFrame],
    dimensions: Map[String, Any],
    args: Map[String, Any],
    inputSignals: Map[String, Signal],
    outputSignal: Signal,
    log: String => Unit = _ => ()) {
  def input(alias: String): DataFrame = inputs(alias)
}

object SqlSlot {
  /** `{dim}` → materialized output dimension value (format_map semantics:
    * unknown placeholders are left untouched).
    *
    * Values are data-driven (decoded from event PATHS), so they refuse
    * SQL metacharacters loudly: a partition segment like
    * `x'; DROP TABLE t; --` would otherwise splice straight into the
    * statement text. Splitting happens BEFORE interpolation (runOnce),
    * so a ';' can never mint a new statement regardless — this guard
    * closes the within-statement cases (quote breakout, comment-out).
    * Legitimate dimension values (dates, ids, regions, numerics) never
    * carry these characters. */
  def interpolate(sql: String, dims: Map[String, Any]): String =
    dims.foldLeft(sql) { case (acc, (k, v)) =>
      val s = v.toString
      if (s.exists(c => c == '\'' || c == '"' || c == ';' || c == '\\') ||
          s.contains("--") || s.contains("/*"))
        throw new IllegalArgumentException(
          s"SqlSlot: dimension '$k' value ${s.take(60)} contains SQL " +
            "metacharacters — refusing to interpolate it into a statement")
      acc.replace(s"{$k}", s)
    }

  /** Split a multi-statement body on top-level ';'. Aware of the dialect
    * it feeds: quotes ('' and "") with backslash escapes (Spark's default
    * non-ANSI parser supports `\'` inside literals), `--` line comments,
    * and C-style block comments — a ';' inside any of those is content,
    * not a statement boundary. */
  def statements(sql: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var lineComment = false
    var blockComment = false
    var i = 0
    def next: Option[Char] =
      if (i + 1 < sql.length) Some(sql.charAt(i + 1)) else None
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (lineComment) {
        cur.append(c); if (c == '\n') lineComment = false
      } else if (blockComment) {
        cur.append(c)
        if (c == '*' && next.contains('/')) {
          cur.append('/'); i += 1; blockComment = false
        }
      } else if (quote != 0) {
        cur.append(c)
        if (c == '\\' && next.isDefined) { cur.append(next.get); i += 1 }
        else if (c == quote) quote = 0
      } else c match {
        case '\'' | '"' => quote = c; cur.append(c)
        case '-' if next.contains('-') => lineComment = true; cur.append(c)
        case '/' if next.contains('*') =>
          blockComment = true; cur.append(c); cur.append('*'); i += 1
        case ';' => out += cur.toString; cur.clear()
        case other => cur.append(other)
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.toList.map(_.trim).filter(_.nonEmpty)
  }
}
