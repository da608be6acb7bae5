package graft.routing

import graft.dimension._
import graft.signal._

/** Pluggable existence probe for completion ("range/integrity") checks.
  * Single point of I/O for the orchestrator — production impl uses Hadoop
  * FileSystem; tests use an in-memory set.
  * Reference: _SignalRangeAnalyzer, routing_runtime_constructs.py:47-221. */
trait PathProbe {
  def exists(path: String): Boolean
  /** Resource is complete when its protocol resource exists. */
  def isComplete(path: String, protocol: IntegrityProtocol): Boolean = protocol match {
    case IntegrityProtocol.None_ => exists(path)
    // alternatives in order: ANY listed marker completes the partition
    case IntegrityProtocol.FileCheck(fs) => fs.exists(f => exists(s"$path/$f"))
  }
}

/** Memoizing wrapper: completed paths never get re-probed (reference
  * completed-path cache, routing_runtime_constructs.py:317-330). */
final class CachingProbe(underlying: PathProbe) extends PathProbe {
  private val completed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def exists(path: String): Boolean =
    completed.contains(path) || {
      val ok = underlying.exists(path)
      if (ok) completed.add(path)
      ok
    }
  /** Delegate protocol-less completeness to the UNDERLYING probe (which
    * may be stricter than bare existence — see FsProbe's mid-write
    * guard), still honoring the pre-seeded completion cache; marker
    * protocols keep probing the marker through the memoized exists. */
  override def isComplete(path: String, protocol: IntegrityProtocol): Boolean =
    protocol match {
      case IntegrityProtocol.None_ =>
        completed.contains(path) || {
          val ok = underlying.isComplete(path, protocol)
          if (ok) completed.add(path)
          ok
        }
      case IntegrityProtocol.FileCheck(fs) =>
        fs.exists(f => exists(s"$path/$f"))
    }
  /** Cross-node range transfer: pre-seed known-complete resources
    * (reference transfer_ranges, routing_runtime_constructs.py:370-395). */
  def markComplete(paths: Iterable[String]): Unit = paths.foreach(completed.add)
}

/** Runtime instantiation of a SignalLinkNode: accumulates ready signals
  * until every non-reference input's linked dimension tips align, then the
  * node is ready to trigger. This is the engine's N-way *event-coincidence
  * join*. Reference: RuntimeLinkNode, routing_runtime_constructs.py:228-722.
  */
final class RuntimeLinkNode(
    val node: SignalLinkNode,
    val output: Signal,
    val outputLinks: List[DimensionLink],
    val createdAtMillis: Long = System.currentTimeMillis()) {

  /** Stable-for-this-process handle for the introspection/delete surface
    * (reference pending node ids, persisted in DynamoDB RouteRecords;
    * here regenerated on WAL replay — a restart re-lists before deleting). */
  val id: String = java.util.UUID.randomUUID().toString.take(8)

  private var readySignals: List[Signal] = Nil
  private val processedPaths = scala.collection.mutable.Set.empty[String]
  private val blockedPaths = scala.collection.mutable.Set.empty[String]
  var isZombie: Boolean = false
  /** Highest pending-node checkpoint mark (secs) already fired for this
    * node (reference last_checkpoint_mark, constructs.py:2812-2817). */
  private[routing] var lastCheckpointMark: Long = 0L

  def ready: List[Signal] = readySignals

  /** Tips aligned check (J1): every link between an already-ready signal and
    * the candidate must map to the candidate's tip value.
    * Reference: _check_links, routing_runtime_constructs.py:474-500. */
  private def checkLinks(candidate: Signal): Boolean = {
    readySignals.forall { rs =>
      node.linksBetween(rs.alias, candidate.alias).forall { link =>
        val tgtDim = link.target.dim
        val mappedOpt: Option[DimValue] = link.source match {
          case LinkSource.FromDim(r) => rs.tipValue(r.dim).map(link.func)
          case LinkSource.FromDims(refs, f) =>
            // N->1: every source dim's tip must be present to evaluate
            val vs = refs.map(r => rs.tipValue(r.dim))
            if (vs.forall(_.isDefined)) Some(f(vs.map(_.get))) else None
          // unknown/literal link sources impose no tip constraint; None
          // falls through to the pass case below — a non-local `return`
          // here would skip validating every REMAINING link and signal
          case _ => None
        }
        (mappedOpt, candidate.tipValue(tgtDim)) match {
          case (Some(mapped), Some(cv)) =>
            cv.matchesValue(mapped) || mapped.matchesValue(cv)
          case (_, None) =>
            throw new IllegalStateException(
              s"candidate ${candidate.alias} lacks linked dim $tgtDim")
          case _ => true
        }
      }
    }
  }

  /** Zombie prediction (J3): if the inputs reverse-materialized from the
    * partially-materialized output violate any input's declared filter, the
    * node can never complete. Reference: predict_if_zombie,
    * routing_runtime_constructs.py:547-614. */
  private def predictZombie(): Boolean = {
    try {
      node.materializedInputsForOutput(
        materializeOutput(force = true), outputLinks,
        alreadyMaterialized = readySignals, enforceAll = false) match {
        case Some(inputs) =>
          // an input materialized to an empty filter = declared filter
          // rejected it. Dimension-less inputs (reference lookups) have an
          // empty filter BY CONSTRUCTION — they can never be rejected.
          inputs.exists(i => i.dimNames.nonEmpty && i.filter.isEmpty)
        case None => false
      }
    } catch { case _: Exception => true }
  }

  /** Offer an incoming concrete signal (J7 receive). Returns true if
    * consumed. Reference: receive, routing_runtime_constructs.py:616-675. */
  def receive(incoming: Signal): Boolean = receive(incoming, isBlocked = false)

  /** `isBlocked` marks the event's resources as blocked (reference
    * _update_blocked_ranges, routing_runtime_constructs.py:397-472): the
    * signal is admitted but the node won't fire while any ready resource is
    * blocked; a later un-blocked event for the same path clears it. */
  def receive(incoming: Signal, isBlocked: Boolean): Boolean = {
    if (isBlocked) blockedPaths ++= incoming.materializedPaths
    else blockedPaths --= incoming.materializedPaths.toSet
    if (incoming.materializedPaths.toSet.subsetOf(processedPaths)) return true

    var consumed = false
    // every declared input sharing the resource sees the event (multi-alias
    // inputs over one dataset are legal, reference advanced_input_modes)
    node.signals.filter(_.sameResource(incoming)).foreach { declared =>
      declared.applyEvent(incoming) match {
        case None => // declared filter rejected this event for this alias
        case Some(candidate) =>
          // containment for the THIRD user-mapper path (resolveDependents
          // and predictZombie already have theirs): a throwing link
          // mapper — or a malformed link target — escaping here kills the
          // driver's event-ingestion loop AND wedges WAL recovery forever
          // (the event is already logged; replay re-throws on every
          // restart). The node can never fire consistently with its
          // links: zombie it so the sweep reaps it.
          val linksOk =
            try checkLinks(candidate)
            catch { case scala.util.control.NonFatal(_) =>
              isZombie = true
              false
            }
          if (linksOk) {
            if (readySignals.exists(_.alias == candidate.alias)) {
              // duplicate for an already-ready input (e.g. reference auto-added)
              if (candidate.isReference || candidate.nearestTheTip) consumed = true
            } else {
              readySignals :+= candidate
              processedPaths ++= incoming.materializedPaths
              isZombie = isZombie || predictZombie()
              resolveDependents()
              consumed = true
            }
          }
      }
    }
    consumed
  }

  /** Reference/dependent input resolution (J2): once the output can be
    * (partially) materialized from ready signals, derive the remaining
    * reference/nearest inputs transitively — they never get events.
    * Reference: _check_dependents, routing_runtime_constructs.py:502-545. */
  private def resolveDependents(): Unit = {
    if (readySignals.isEmpty) return
    val dependents = node.signals.filter(s => s.isReference || s.nearestTheTip)
    if (dependents.isEmpty) return
    try {
      val out = materializeOutput(force = true)
      node.materializedInputsForOutput(out, outputLinks,
        alreadyMaterialized = readySignals, enforceAll = false).foreach { inputs =>
        inputs.foreach { m =>
          if ((m.isReference || m.nearestTheTip) &&
              !readySignals.exists(_.alias == m.alias) && m.isMaterialized)
            readySignals :+= m
        }
      }
    } catch {
      // any failure here (missing linked dim, but also a user-supplied
      // link mapper throwing on an unexpected tip value) marks the node
      // zombie instead of escaping into — and killing — the driver's
      // event-ingestion loop; predictZombie uses the same breadth
      case scala.util.control.NonFatal(_) => isZombie = true
    }
  }

  /** All non-reference inputs ready (references resolved transitively)? */
  def allSignalsReady: Boolean =
    node.signals.forall(s => readySignals.exists(_.alias == s.alias))

  /** Full readiness: signals ready + completion checks pass (J5).
    * `nearestTheTip` inputs narrow to the first existing partition. */
  def isReady(probe: PathProbe): Boolean = {
    if (isZombie || !allSignalsReady) false
    else readySignals.forall { s =>
      val unblocked = s.materializedPaths.forall(p => !blockedPaths.contains(p))
      unblocked && {
        if (s.nearestTheTip) nearestExisting(s, probe).isDefined
        else if (s.rangeCheckRequired)
          s.materializedPaths.forall(p => probe.isComplete(p, s.source.protocol))
        else true
      }
    }
  }

  /** First existing partition in range (S4/nearest semantics, fail-fast
    * ordered probe; reference glueetl_default_ABI.py:283-284). */
  def nearestExisting(s: Signal, probe: PathProbe): Option[String] =
    RuntimeLinkNode.nearestExisting(s, probe)

  /** The (path, protocol) pairs [[isReady]] (and the subsequent
    * nearest-narrowing) would probe — enumerated WITHOUT any I/O, so the
    * table sweep can run the probes outside its monitor and feed the
    * results back through a snapshot probe. Must stay in lockstep with
    * [[isReady]]'s probe set (a missed target only costs a live probe
    * under the monitor, never a wrong answer). */
  def probeTargets: List[(String, IntegrityProtocol)] =
    if (isZombie || !allSignalsReady) Nil
    else readySignals.flatMap { s =>
      if (s.nearestTheTip || s.rangeCheckRequired)
        s.materializedPaths.map(p => (p, s.source.protocol))
      else Nil
    }

  /** Materialize the output's partition tuple from ready-signal tips
    * through the output link matrix (J6). Reference: materialize_output,
    * routing_runtime_constructs.py:677-722. */
  def materializeOutput(force: Boolean = false): Signal = {
    require(force || allSignalsReady, "node not ready")
    val values: Map[String, Any] = output.dimNames.flatMap { od =>
      val tgt = DimRef("output", od)
      val linked: Option[Any] = outputLinks.collectFirst {
        case DimensionLink(`tgt`, LinkSource.FromDim(DimRef(a, sd)), f) =>
          readySignals.find(_.alias == a).flatMap(_.tipValue(sd)).map(v => f(v).rawValue)
        case DimensionLink(`tgt`, LinkSource.FromDims(rs, f), _) if rs.nonEmpty =>
          // N->1 toward the output: all source tips of the one signal
          readySignals.find(_.alias == rs.head.alias).flatMap { s =>
            val vs = rs.map(r => s.tipValue(r.dim))
            if (vs.forall(_.isDefined)) Some(f(vs.map(_.get)).rawValue) else None
          }
        case DimensionLink(`tgt`, LinkSource.LiteralValue(v), _) => Some(v)
      }.flatten
      // auto-bind by dim-name equality against any ready signal
      val auto: Option[Any] = readySignals.view
        .flatMap(_.tipValue(od)).headOption.map(_.rawValue)
      linked.orElse(auto).map(od -> _)
    }.toMap
    output.materializeWith(values)
  }

  /** Final ready inputs for compute, nearest inputs narrowed to their
    * satisfied partition. */
  def materializedInputs(probe: PathProbe): List[Signal] =
    readySignals.map(RuntimeLinkNode.narrowNearest(_, probe))
}

object RuntimeLinkNode {
  /** First existing partition in range (S4/nearest) — shared by the
    * event path ([[RuntimeLinkNode.materializedInputs]]) and manual
    * execution ([[graft.app.Application!.execute]]); the two must never
    * disagree about which partition a slot receives. */
  def nearestExisting(s: Signal, probe: PathProbe): Option[String] =
    s.materializedPaths.find(p => probe.isComplete(p, s.source.protocol))

  /** Narrow a nearest input to its satisfied partition (identity for
    * non-nearest signals or when nothing exists yet). */
  def narrowNearest(s: Signal, probe: PathProbe): Signal =
    if (s.nearestTheTip)
      nearestExisting(s, probe).flatMap(s.fromEventPath).getOrElse(s)
    else s
}
