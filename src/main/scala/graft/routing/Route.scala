package graft.routing

import graft.signal._

/** Orchestrator events surfaced to user hooks (H1).
  * Reference: routing_runtime_constructs.py:856-1160. */
trait RouteHooks {
  def onPendingNodeCreated(route: Route, node: RuntimeLinkNode): Unit = ()
  def onPendingNodeExpired(route: Route, node: RuntimeLinkNode): Unit = ()
  /** Periodic pending-node checkpoint marks (seconds since node creation;
    * reference RoutePendingNodeHook.checkpoints =
    * [RouteCheckpoint(checkpoint_in_secs, slot)],
    * routing_runtime_constructs.py:729, 1001-1018). Each mark fires
    * [[onPendingNodeCheckpoint]] once per pending node, at the first
    * sweep whose elapsed time passes it — the "this join has been waiting
    * N minutes" alerting surface. */
  def pendingNodeCheckpointSecs: List[Long] = Nil
  def onPendingNodeCheckpoint(route: Route, node: RuntimeLinkNode,
                              checkpointSecs: Long): Unit = ()
  def onExecBegin(route: Route, ctx: ExecutionContext): Unit = ()
  /** Fired INSTEAD of onExecBegin when a ready context is dropped because
    * an execution for the same materialized output is already in flight
    * (reference on_exec_skipped, constructs.py:3475-3486). */
  def onExecSkipped(route: Route, ctx: ExecutionContext): Unit = ()
  def onExecSuccess(route: Route, ctx: ExecutionContext): Unit = ()
  def onExecFailure(route: Route, ctx: ExecutionContext, error: Throwable): Unit = ()
}
object RouteHooks { val none: RouteHooks = new RouteHooks {} }

/** A ready-to-run unit: materialized inputs + materialized output.
  * Reference: ExecutionContext, routing_runtime_constructs.py:1427-1444. */
final case class ExecutionContext(
    routeId: String,
    inputs: List[Signal],
    output: Signal)

/** Per-route runtime counters (reference get_route_metrics surface,
  * application.py:429-531 — orchestration metrics per route).
  * `probeFailures` (r15) counts sweep-probe targets of THIS route that
  * threw and were folded to incomplete — the rate-limited warn log
  * names one key per window, so a permanently-broken path must also be
  * visible in metrics (alarms/dashboards), not only in a sampled line. */
final case class RouteCounters(
    eventsReceived: Long = 0, pendingCreated: Long = 0,
    pendingExpired: Long = 0, zombiesEliminated: Long = 0,
    triggers: Long = 0, probeFailures: Long = 0)

/** A data node at runtime: link-node template + output signal + output dim
  * matrix + pending nodes + TTL. Reference: Route,
  * routing_runtime_constructs.py:1172-1484. */
final class Route(
    val id: String,
    val linkNode: SignalLinkNode,
    val output: Signal,
    val outputLinks: List[DimensionLink],
    val pendingNodeTtlMillis: Long = Long.MaxValue,
    val hooks: RouteHooks = RouteHooks.none) {

  private var pending: List[RuntimeLinkNode] = Nil
  def pendingNodes: List[RuntimeLinkNode] = pending

  /** Remove one pending node by its [[RuntimeLinkNode.id]] (reference
    * delete_pending_node, application.py:4117-4120 — the manual unblock
    * for a node that will never complete). Returns false when absent. */
  def removePending(nodeId: String): Boolean = {
    val (gone, keep) = pending.partition(_.id == nodeId)
    pending = keep
    gone.nonEmpty
  }

  private var ctrs = RouteCounters()
  /** Snapshot of this route's orchestration counters. */
  def counters: RouteCounters = ctrs

  /** Attribute `n` failed sweep-probe targets to this route (called by
    * [[RoutingTable]] under its monitor after the probe phase). */
  private[routing] def noteProbeFailures(n: Int): Unit =
    if (n > 0) ctrs = ctrs.copy(probeFailures = ctrs.probeFailures + n)

  /** Does an incoming concrete signal belong to any of this route's inputs? */
  def accepts(incoming: Signal): Boolean =
    linkNode.signals.exists(s => !s.isReference && s.sameResource(incoming) &&
      s.applyEvent(incoming).isDefined)

  /** Offer a signal: feed pending nodes; un-consumed non-reference signals
    * open a new pending node. Ready nodes become ExecutionContexts and leave
    * the pending list. Reference: Route.receive,
    * routing_runtime_constructs.py:1396-1444. */
  def receive(incoming: Signal, probe: PathProbe,
              nowMillis: Long = System.currentTimeMillis(),
              isBlocked: Boolean = false): List[ExecutionContext] = {
    expireNodes(nowMillis)
    ctrs = ctrs.copy(eventsReceived = ctrs.eventsReceived + 1)
    // only nodes TOUCHED by this event get their (probe-I/O) readiness
    // re-checked: an untouched node's event state is unchanged, and
    // storage-side completions are the SWEEP's job by contract — probing
    // every pending node on every event made one event cost
    // O(pending × range × probe latency) (16 minutes per event at 10k
    // waiting nodes on a 50 ms store; see BASELINE r13). A duplicate
    // re-publish of a node's path counts as touched, so manual re-offer
    // still re-evaluates that node immediately.
    var touched = List.empty[RuntimeLinkNode]
    pending.foreach { n => if (n.receive(incoming, isBlocked)) touched ::= n }

    if (touched.isEmpty) {
      val declared = linkNode.signals.find(s => s.sameResource(incoming) && !s.isReference)
      if (declared.isDefined) {
        val n = new RuntimeLinkNode(linkNode, output, outputLinks, nowMillis)
        if (n.receive(incoming, isBlocked)) {
          pending :+= n
          touched ::= n
          ctrs = ctrs.copy(pendingCreated = ctrs.pendingCreated + 1)
          hooks.onPendingNodeCreated(this, n)
        }
      }
    }

    // zombie elimination bounds pending state (reference 547-614)
    val (zombies, alive) = pending.partition(_.isZombie)
    zombies.foreach(hooks.onPendingNodeExpired(this, _))
    pending = alive
    ctrs = ctrs.copy(zombiesEliminated = ctrs.zombiesEliminated + zombies.length)

    fireReady(probe, touched)
  }

  /** The single firing path (event receive AND sweep): ready CANDIDATES
    * leave pending, bump the trigger counter, and materialize their
    * contexts. Only candidates pay the readiness probe I/O. */
  private def fireReady(probe: PathProbe,
                        candidates: List[RuntimeLinkNode]): List[ExecutionContext] = {
    if (candidates.isEmpty) return Nil
    // identity membership in O(1): the sweep passes the ENTIRE pending
    // list as candidates, so a linear exists() here would make every
    // sweep O(pending²) reference comparisons inside the table monitor
    val candSet = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[RuntimeLinkNode, java.lang.Boolean]())
    candidates.foreach(candSet.add)
    val (ready, waiting) = pending.partition(n =>
      candSet.contains(n) && n.isReady(probe))
    pending = waiting
    ctrs = ctrs.copy(triggers = ctrs.triggers + ready.length)
    ready.map { n =>
      ExecutionContext(id, n.materializedInputs(probe), n.materializeOutput())
    }
  }

  /** Re-evaluate pending nodes WITHOUT a new event (the reference
    * orchestration cycle's pending-node checker, processor `next_cycle` +
    * RoutePendingNodeChecker): a node whose events all arrived but whose
    * range/nearest completion probes failed becomes ready here once the
    * missing partitions appear on storage — data written by systems that
    * emit no events is not lost forever. */
  def sweep(probe: PathProbe,
            nowMillis: Long = System.currentTimeMillis()): List[ExecutionContext] = {
    expireNodes(nowMillis)
    fireCheckpoints(nowMillis)
    fireReady(probe, pending) // the sweep re-checks EVERY pending node
  }

  /** Fire every not-yet-fired checkpoint mark the node's age has passed,
    * chronologically, recording the last fired mark per node (reference
    * get_next_pending_node_checkpoint + last_checkpoint_mark,
    * routing_runtime_constructs.py:1246-1258, constructs.py:4315-4334). */
  private def fireCheckpoints(nowMillis: Long): Unit = {
    val marks = hooks.pendingNodeCheckpointSecs.sorted
    if (marks.nonEmpty) pending.foreach { n =>
      val elapsedSecs = (nowMillis - n.createdAtMillis) / 1000
      marks.filter(m => m > n.lastCheckpointMark && m <= elapsedSecs)
        .foreach { m =>
          hooks.onPendingNodeCheckpoint(this, n, m)
          n.lastCheckpointMark = m
        }
    }
  }

  /** TTL expiry of stale pending nodes (J4; reference check_expired_nodes,
    * routing_runtime_constructs.py:1446-1459). */
  def expireNodes(nowMillis: Long): Unit = {
    if (pendingNodeTtlMillis == Long.MaxValue) return
    val (expired, alive) = pending.partition(n =>
      nowMillis - n.createdAtMillis > pendingNodeTtlMillis)
    expired.foreach(hooks.onPendingNodeExpired(this, _))
    pending = alive
    ctrs = ctrs.copy(pendingExpired = ctrs.pendingExpired + expired.length)
  }
}

/** Event → route index + dispatch: matches an incoming (kind, path) to
  * candidate routes and runs their receive cycle. Single-driver in-proc
  * equivalent of the reference's RoutingTable + RouteIndex
  * (constructs.py:2685-2741, 3293-3433); the per-route DynamoDB lock is a
  * plain object monitor here.
  */
final class RoutingTable(probe: PathProbe,
                         checkpoint: Option[RoutingWal] = None,
                         compactEveryEvents: Int = 10000) {
  private val cachingProbe = new CachingProbe(probe)
  private var routes: List[Route] = Nil
  private var replaying = false
  private var eventsSinceCompact = 0

  // ---- event→route index (reference RouteIndex, constructs.py:
  // 2705-2741): both dispatch paths were linear scans over every
  // route's signals — fine at 10 routes, seconds per 10k events at a
  // 10k-route table. Dispatch cost must follow the EVENT, not the
  // table: signal dispatch indexes the exact (kind, rootPath) of each
  // non-reference input (`accepts` requires resource equality, so
  // other routes can never match); raw-path decode indexes source
  // roots and probes only the event path's ANCESTOR prefixes — O(path
  // depth) lookups per event. List order inside each bucket preserves
  // route-declaration order, so first-decode-wins semantics are
  // unchanged.
  private var routesBySource =
    Map.empty[(SignalSourceKind, String), List[Route]]
  private var signalsByRoot = Map.empty[String, List[Signal]]

  def add(route: Route): Unit = synchronized {
    routes :+= route
    route.linkNode.signals.foreach { s =>
      if (!s.isReference) {
        val rk = (s.source.kind, s.source.rootPath)
        val cur = routesBySource.getOrElse(rk, Nil)
        if (!cur.exists(_ eq route))
          routesBySource = routesBySource.updated(rk, cur :+ route)
      }
      val root = s.source.rootPath.stripSuffix("/")
      signalsByRoot = signalsByRoot.updated(root,
        signalsByRoot.getOrElse(root, Nil) :+ s)
    }
  }
  def all: List[Route] = routes
  def find(id: String): Option[Route] = routes.find(_.id == id)

  /** End-of-life for this table's WAL (stream + its private FileSystem)
    * — [[graft.routing.RoutingWal.dispose]]. */
  def disposeWal(): Unit = synchronized { checkpoint.foreach(_.dispose()) }

  /** Every ancestor prefix of `path` (itself first, then each parent),
    * cut at '/' — the only candidate source roots an event can live
    * under. Shared with [[ShardedDriver]]'s shard-dispatch index. */
  private def ancestorPrefixes(path: String): List[String] =
    RoutingPaths.ancestorPrefixes(path)

  /** Ingest one concrete event signal; returns ready execution contexts
    * across all matching routes. */
  def receive(incoming: Signal, isBlocked: Boolean = false): List[ExecutionContext] =
    synchronized {
      val matching = routesBySource
        .getOrElse((incoming.source.kind, incoming.source.rootPath), Nil)
        .filter(_.accepts(incoming))
      // log ONLY events some route accepts (an unmatched event rebuilds
      // nothing at replay, so logging it would just grow the WAL forever
      // on a long-lived driver), at tip granularity (reference ONLY_HEAD
      // processing mode) so a restart can rebuild pending state by
      // replaying the event log.
      // KNOWN TRADE-OFF: if a LATER driver adds a route consuming a
      // source that fired only before the route existed, replay cannot
      // seed that pending node (the event was never logged) — matching
      // the reference, which also persists per-route records only; use
      // execute/backfill to redeem pre-declaration events.
      // KNOWN GRANULARITY LIMIT: a multi-partition event signal (e.g.
      // ground() of a ranged view) replays as its tip partition only —
      // completion checks still probe the real filesystem, but replayed
      // pending nodes track the tip path, not the full range.
      if (!replaying && matching.nonEmpty) {
        incoming.materializedPaths.headOption.foreach(p =>
          checkpoint.foreach(_.appendEvent(p, isBlocked)))
        maybeCompact()
      }
      matching.flatMap(_.receive(incoming, cachingProbe, isBlocked = isBlocked))
    }

  /** Periodic live compaction: recovery-time-only compaction let the log
    * grow unboundedly between restarts of a long-lived driver. Every
    * `compactEveryEvents` appended events, fold the log to
    * last-occurrence-per-path + distinct completed set — O(log) work
    * amortized over N O(1) appends. */
  private def maybeCompact(): Unit = {
    eventsSinceCompact += 1
    if (eventsSinceCompact >= compactEveryEvents) {
      eventsSinceCompact = 0
      checkpoint.foreach(cp =>
        cp.load().foreach { case (events, completed) =>
          cp.compact(events, completed) })
    }
  }

  /** Rebuild pending-node state after a restart: replay the persisted event
    * log through the normal receive path (reference RouteRecord reload).
    * Returns contexts that became ready but whose outputs never completed —
    * the executions that were mid-flight when the previous driver died. */
  /** `staleOutput` (r17): a replayed context whose output is COMPLETE is
    * normally dropped as already-done — but when the caller can prove
    * the output is STALE (an input re-published with a newer completion
    * stamp before the crash), dropping it silently loses the recompute.
    * The predicate re-offers exactly those; the default keeps the
    * conservative drop (routing has only an exists-probe — stamping
    * lives at the app layer). */
  def recover(staleOutput: ExecutionContext => Boolean = _ => false)
      : List[ExecutionContext] = synchronized {
    checkpoint.flatMap(cp => cp.load().map((cp, _))).map {
      case (cp, (events, completed)) =>
        cachingProbe.markComplete(completed)
        replaying = true
        val ctxs =
          try events.flatMap { case (p, blocked) => receivePath(p, blocked) }
          finally { replaying = false }
        cp.compact(events, completed) // bound the log across restarts
        // a context is only "already done" when EVERY materialized path
        // completed — a crash after the first partition of a ranged
        // output must re-surface the execution, not strand the rest
        ctxs.filterNot(c => c.output.materializedPaths.nonEmpty &&
          c.output.materializedPaths.forall(p =>
            cachingProbe.isComplete(p, c.output.source.protocol)) &&
          !staleOutput(c))
    }.getOrElse(Nil)
  }

  /** Ingest a raw physical path event: decode against every route input
    * (reference event classification + RouteIndex.find). Data-FILE events
    * normalize to their partition dir first — a `part-*` object creation is
    * the completion indicator of its partition (reference
    * processor/aws.py:2850-2861 normalizes `part-00000`; Spark writers emit
    * `part-<n>-<uuid>` so any part file counts here). */
  def receivePath(path: String, isBlocked: Boolean = false): List[ExecutionContext] =
    synchronized {
      val p = new org.apache.hadoop.fs.Path(path)
      // getParent.toString keeps the scheme/authority — toUri.getPath
      // stripped them, so scheme-qualified part-file events could never
      // match their route's rootPath
      val normalized =
        if (p.getName.startsWith("part-")) p.getParent.toString else path
      val decoded: List[Signal] = ancestorPrefixes(normalized)
        .flatMap(r => signalsByRoot.getOrElse(r, Nil))
        .flatMap(s => s.fromEventPath(normalized)).distinct
      // nested source roots are legal (boundary-aware prefix decode), so
      // one path can decode against SEVERAL resources — dispatch every
      // DISTINCT RESOURCE, not just the first. Dedup by resource, not by
      // Signal: routes aliasing the same source each contribute a decode,
      // but receive() already fans one resource's event out to every
      // matching route — per-alias dispatch would multiply deliveries.
      decoded.distinctBy(s => (s.source.kind, s.source.rootPath))
        .flatMap(s => receive(s, isBlocked))
    }

  /** Re-run every route's pending completion checks without an event
    * (the orchestration-cycle sweep; see [[Route.sweep]]).
    *
    * Three phases so event ingestion NEVER waits on probe I/O (r13 —
    * previously the probes ran under the table monitor and a slow
    * remote store starved `receive()` for the whole sweep):
    * snapshot the pending nodes' probe targets under the monitor (no
    * I/O), probe them OUTSIDE it with bounded parallelism, then run the
    * normal sweep under the monitor against the pre-probed snapshot.
    * Targets that appear between the phases (a pending node created by
    * a concurrent event) miss the snapshot and fall through to a live
    * probe under the monitor — bounded by the handful of new nodes, not
    * by the waiting backlog. */
  def sweepPending(nowMillis: Long = System.currentTimeMillis()): List[ExecutionContext] =
    sweepWhere(_ => true, nowMillis)

  /** [[sweepPending]] narrowed to ONE route (reference
    * update_active_route_status → check_active_route). */
  def sweepPendingRoute(id: String,
                        nowMillis: Long = System.currentTimeMillis())
      : List[ExecutionContext] =
    sweepWhere(_.id == id, nowMillis)

  private def sweepWhere(sel: Route => Boolean,
                         nowMillis: Long): List[ExecutionContext] = {
    val perRoute = synchronized {
      routes.filter(r => sel(r) && r.pendingNodes.nonEmpty)
        .map(r => r -> r.pendingNodes.flatMap(_.probeTargets).distinct)
    }
    val targets = perRoute.flatMap(_._2).distinct
    val (snap, failedKeys) = probeOutsideMonitor(targets)
    synchronized {
      // attribute this tick's probe failures to the routes whose pending
      // nodes own the failing targets (a shared target counts on every
      // route waiting on it — each one's completion is equally stalled)
      if (failedKeys.nonEmpty) perRoute.foreach { case (r, ts) =>
        r.noteProbeFailures(
          ts.count { case (p, proto) =>
            probeKeys(p, proto).exists(failedKeys.contains) })
      }
      val sp = new SnapshotProbe(cachingProbe, snap)
      routes.filter(r => sel(r) && r.pendingNodes.nonEmpty)
        .flatMap(_.sweep(sp, nowMillis))
    }
  }

  /** The snapshot/failure map keys of a probe target — one derivation
    * shared by the probe phase and the per-route attribution above. A
    * FileCheck with alternative marker names yields one key PER name
    * (each probed independently; the snapshot view ORs them), so the
    * multi-name protocol costs exactly its extra exists() calls and
    * nothing structural. */
  private def probeKeys(p: String,
                        proto: graft.signal.IntegrityProtocol): Seq[String] =
    proto match {
      case graft.signal.IntegrityProtocol.None_         => Seq(p)
      case graft.signal.IntegrityProtocol.FileCheck(fs) =>
        fs.map(f => s"$p/$f")
    }

  /** Phase 2: the sweep's probe I/O, monitor-free. Results land in a
    * completion-keyed map ([[SnapshotProbe]]); parallelism is bounded so
    * a 10k-node backlog against a high-latency store overlaps its
    * round-trips instead of serializing them. */
  // shared probe pool, created lazily and reused across sweep ticks — a
  // per-tick fixed pool would churn up to `parallelism` threads every
  // sub-second poll. Daemon threads with core-timeout: the pool drains
  // itself to zero threads when sweeps go idle.
  private lazy val sweepProbePool: java.util.concurrent.ThreadPoolExecutor = {
    val par = sys.props.getOrElse("graft.sweep.parallelism", "16").toInt
    val tf = new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger()
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-sweep-probe-${n.incrementAndGet()}")
        t.setDaemon(true); t
      }
    }
    val p = new java.util.concurrent.ThreadPoolExecutor(
      par, par, 30, java.util.concurrent.TimeUnit.SECONDS,
      new java.util.concurrent.LinkedBlockingQueue[Runnable](), tf)
    p.allowCoreThreadTimeOut(true)
    p
  }

  private def probeOutsideMonitor(
      targets: List[(String, graft.signal.IntegrityProtocol)])
      : (java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean],
         Set[String]) = {
    val snap = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()
    if (targets.isEmpty) return (snap, Set.empty)
    // I/O-bound round-trips: size to the store's latency×throughput
    // (-Dgraft.sweep.parallelism=64 for a 50 ms object store)
    val pool = sweepProbePool
    // Per-target fault isolation: a probe that throws (bad mount,
    // permissions, a flaky endpoint) folds to incomplete-FOR-THIS-SWEEP
    // on ITS key only — the snapshot records `false`, so the sweep
    // neither fires that node nor falls through to a live re-probe
    // under the monitor. Without this, one persistently-failing path
    // aborted every route's sweep tick fleet-wide, forever. Transient
    // faults self-heal on a later sweep; the pending node keeps waiting.
    val failures = new java.util.concurrent.ConcurrentHashMap[String, Throwable]()
    val futs = targets.flatMap { case (p, proto) =>
      probeKeys(p, proto).map { key =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = {
            try {
              val ok = proto match {
                case graft.signal.IntegrityProtocol.None_ =>
                  cachingProbe.isComplete(p, proto)
                case graft.signal.IntegrityProtocol.FileCheck(_) =>
                  // per-NAME key: one exists() per alternative marker
                  cachingProbe.exists(key)
              }
              snap.put(key, ok)
            } catch {
              case scala.util.control.NonFatal(e) =>
                snap.put(key, java.lang.Boolean.FALSE)
                failures.put(key, e)
            }
          }
        })
      }
    }
    futs.foreach { f =>
      try f.get()
      catch { case e: java.util.concurrent.ExecutionException =>
        throw e.getCause } // only fatal errors escape call() now
    }
    if (!failures.isEmpty) warnProbeFailures(failures)
    (snap, scala.jdk.CollectionConverters.SetHasAsScala(
      failures.keySet()).asScala.toSet)
  }

  // Rate-limited (one line per window, default 10 s) so a permanently
  // broken path doesn't flood the log at sub-second sweep cadence.
  private val lastProbeWarnMillis = new java.util.concurrent.atomic.AtomicLong(0L)
  private def warnProbeFailures(
      failures: java.util.Map[String, Throwable]): Unit = {
    val windowMs = sys.props.getOrElse("graft.sweep.warn.interval.ms", "10000").toLong
    val now = System.currentTimeMillis()
    val last = lastProbeWarnMillis.get()
    if (now - last >= windowMs && lastProbeWarnMillis.compareAndSet(last, now)) {
      val it = failures.entrySet().iterator()
      val first = it.next()
      org.slf4j.LoggerFactory.getLogger(classOf[RoutingTable]).warn(
        s"sweep: ${failures.size} probe target(s) failed this tick and were " +
          s"treated as incomplete (first: ${first.getKey} -> " +
          s"${first.getValue.getClass.getSimpleName}: ${first.getValue.getMessage}); " +
          "other targets were unaffected")
    }
  }

  /** One-sweep snapshot view: answers completion checks from the
    * pre-probed results (NEGATIVES included — the caching probe only
    * memoizes positives, and re-probing every miss under the monitor is
    * exactly the starvation being avoided), falling back to the live
    * probe for anything outside the snapshot. */
  private final class SnapshotProbe(
      live: CachingProbe,
      snap: java.util.Map[String, java.lang.Boolean]) extends PathProbe {
    def exists(path: String): Boolean = {
      val c = snap.get(path)
      if (c != null) c.booleanValue else live.exists(path)
    }
    override def isComplete(path: String,
                            protocol: graft.signal.IntegrityProtocol): Boolean =
      protocol match {
        case graft.signal.IntegrityProtocol.None_ =>
          // keyed by the partition path; the snapshot value came through
          // the live probe's protocol-aware check (mid-write guard incl.)
          val c = snap.get(path)
          if (c != null) c.booleanValue else live.isComplete(path, protocol)
        case graft.signal.IntegrityProtocol.FileCheck(fs) =>
          fs.exists(f => exists(s"$path/$f"))
      }
  }

  /** Pre-seed known-complete paths (transfer_ranges analog). */
  def markComplete(paths: Iterable[String]): Unit = synchronized {
    cachingProbe.markComplete(paths)
    if (!replaying)
      paths.foreach(p => checkpoint.foreach(_.appendCompleted(p)))
  }
}

/** Path utilities shared by the table- and shard-level dispatch
  * indexes. */
private[routing] object RoutingPaths {
  /** Every ancestor prefix of `path` (deepest first), cut at '/'. */
  def ancestorPrefixes(path: String): List[String] = {
    val norm = path.stripSuffix("/")
    var acc = List(norm)
    var cur = norm
    var i = cur.lastIndexOf('/')
    while (i > 0) {
      cur = cur.substring(0, i)
      acc = cur :: acc
      i = cur.lastIndexOf('/')
    }
    acc.reverse // deepest (most specific) first
  }
}
