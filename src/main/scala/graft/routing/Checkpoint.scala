package graft.routing

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Durable routing state (reference RouteRecord persistence,
  * constructs.py:3293-3433 + drivers/routing/aws.py — DynamoDB there, one
  * JSON file under the app root here). The routing table is a deterministic
  * function of its event log, so the checkpoint persists RECEIVED EVENTS
  * (+ completed paths) and recovery REPLAYS them: pending nodes are
  * reconstructed by the exact code path that built them originally, which
  * keeps the persisted format independent of in-memory class shapes.
  */
final class RoutingCheckpoint(path: String, conf: Configuration) {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  private def unesc(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  def save(events: Seq[(String, Boolean)], completed: Seq[String]): Unit = {
    val sb = new StringBuilder("{\"events\":[")
    sb.append(events.map { case (p, b) =>
      s"""{"path":"${esc(p)}","blocked":$b}"""
    }.mkString(","))
    sb.append("],\"completed\":[")
    sb.append(completed.map(p => "\"" + esc(p) + "\"").mkString(","))
    sb.append("]}")
    val f = new Path(path)
    val fs = f.getFileSystem(conf)
    val out = fs.create(f, true)
    try out.write(sb.toString.getBytes("UTF-8")) finally out.close()
  }

  def load(): Option[(List[(String, Boolean)], List[String])] = {
    val f = new Path(path)
    val fs = f.getFileSystem(conf)
    if (!fs.exists(f)) return None
    val in = fs.open(f)
    val raw = try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toString("UTF-8")
    } finally in.close()

    val eventRe = """\{"path":"((?:[^"\\]|\\.)*)","blocked":(true|false)\}""".r
    val eventsPart = raw.substring(raw.indexOf("\"events\":["),
      raw.indexOf("],\"completed\":"))
    val events = eventRe.findAllMatchIn(eventsPart)
      .map(m => (unesc(m.group(1)), m.group(2).toBoolean)).toList
    val completedPart = raw.substring(raw.indexOf("\"completed\":["))
    val pathRe = """"((?:[^"\\]|\\.)*)"""".r
    val completed = pathRe.findAllMatchIn(completedPart)
      .map(m => unesc(m.group(1))).toList.filterNot(_ == "completed")
    Some((events, completed))
  }
}
