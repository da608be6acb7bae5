package graft.app

import org.apache.hadoop.fs.Path
import graft.compute.{RetryPolicy, Slot}
import graft.signal.{DimensionLink, Signal, SignalLinkNode}

/** Dev-context persistence (reference save/load_dev_state + `attach`,
  * application.py:164-180): the declared DAG — node definitions, dim
  * specs, links, slots, timers — survives the JVM, so a new process can
  * `Application.attach(...)` and keep executing without re-declaring.
  *
  * Format: Java serialization of this case-class tree. Everything in the
  * dev context is case classes (signals, specs, filters, links, SQL
  * slots) or serializable Scala lambdas (Scala/inlined slots and mapper
  * funcs that don't capture runtime handles). A slot closure that
  * captures a SparkSession or DataFrame fails fast at save time with the
  * offending node named. Runtime-only state is NOT here: hooks are
  * restored as no-ops, metric-alarm series (closures over live
  * DataFrames) must be re-declared, and routing/pending state has its own
  * WAL ([[Application.recover]]).
  */
final case class PersistedNode(
    id: String,
    linkNode: SignalLinkNode,
    output: Signal,
    outputLinks: List[DimensionLink],
    slots: Seq[Slot],
    ttlMillis: Long,
    retry: RetryPolicy)

final case class PersistedTimer(signal: Signal, schedule: Option[Schedule])

final case class DevState(appName: String,
                          nodes: List[PersistedNode],
                          timers: List[PersistedTimer])

object DevState {

  def fileFor(rootDir: String): Path = new Path(rootDir, "dev_state.bin")

  def save(state: DevState, rootDir: String,
           conf: org.apache.hadoop.conf.Configuration): String = {
    // serialize each node separately first so an unserializable slot
    // closure (captured SparkSession etc.) names its node instead of
    // failing the whole write opaquely
    state.nodes.foreach { n =>
      try {
        val probe = new java.io.ObjectOutputStream(
          java.io.OutputStream.nullOutputStream())
        probe.writeObject(n); probe.close()
      } catch {
        case e: java.io.NotSerializableException =>
          throw new IllegalArgumentException(
            s"node '${n.id}' is not persistable: a slot or link closure " +
              s"captures a runtime object (${e.getMessage}); use SqlSlot or " +
              "capture-free functions for persistable DAGs", e)
      }
    }
    val f = fileFor(rootDir)
    val fs = f.getFileSystem(conf)
    AtomicFile.replace(fs, f) { raw =>
      val out = new java.io.ObjectOutputStream(raw)
      out.writeObject(state); out.flush()
    }
    f.toString
  }

  def load(rootDir: String,
           conf: org.apache.hadoop.conf.Configuration): Option[DevState] = {
    val f = fileFor(rootDir)
    val fs = f.getFileSystem(conf)
    AtomicFile.read(fs, f) { p =>
      val in = new java.io.ObjectInputStream(fs.open(p))
      try in.readObject().asInstanceOf[DevState] finally in.close()
    }
  }
}
