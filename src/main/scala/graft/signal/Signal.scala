package graft.signal

import graft.dimension._

/** A typed event/resource handle: a *logical table + partition predicate +
  * completion protocol*, plus consumption flags.
  * Reference: core/signal_processing/signal.py:204-661 (flags 151-174).
  *
  * - `isReference`: never awaited at runtime; partition values derived
  *   transitively from output/other inputs (signal.py:840-1031).
  * - `rangeCheckRequired`: every partition in the (expanded) range must
  *   exist before trigger (J5 "integrity"/completion checks).
  * - `nearestTheTip`: take the first *existing* partition in range.
  */
final case class Signal(
    alias: String,
    source: SignalSource,
    spec: DimSpec,
    filter: DimFilter,
    isReference: Boolean = false,
    rangeCheckRequired: Boolean = false,
    nearestTheTip: Boolean = false) {

  def dimNames: List[String] = spec.flatten.flatMap(_.name)

  /** Apply an incoming (concrete) signal's filter to this declared signal:
    * intersection with finalize=true — relatives explode into ranges.
    * None (or empty) ⇒ the event does not belong to this signal.
    * Reference: Signal.apply, signal.py:386-391. */
  def applyEvent(event: Signal): Option[Signal] = {
    if (!sameResource(event)) None
    else filter.applyFilter(event.filter) match {
      case Some(f) if !f.isEmpty => Some(copy(filter = f))
      case _ => None
    }
  }

  def sameResource(other: Signal): Boolean =
    source.kind == other.source.kind && source.rootPath == other.source.rootPath

  /** Most-recent/head partition tuple (the "tip"). */
  def tip: List[DimValue] = filter.tuples.headOption.getOrElse(Nil)

  // a dim's POSITION in the value tuples: the tuple carries every dim,
  // so indexing must run over the full flattened spec — `dimNames`
  // drops unnamed dims and would misalign every lookup after one
  private def dimIndex(dimName: String): Int =
    spec.flatten.indexWhere(_.name.contains(dimName))

  /** Tip value of a named dimension. */
  def tipValue(dimName: String): Option[DimValue] = {
    val idx = dimIndex(dimName)
    if (idx < 0) None else tip.lift(idx)
  }

  /** All values a named dimension takes across the materialized range. */
  def valuesOf(dimName: String): List[DimValue] = {
    val idx = dimIndex(dimName)
    if (idx < 0) Nil else filter.tuples.flatMap(_.lift(idx)).distinct
  }

  /** Dimension-less signals (lookup datasets) are trivially materialized. */
  def isMaterialized: Boolean =
    if (spec.flatten.isEmpty) true else !filter.isEmpty && filter.isMaterialized

  /** lazy: an event signal is offered to EVERY pending node of its
    * route, each offer reading these paths — rendering them once per
    * immutable instance instead of once per offer is the difference
    * between O(1) and O(pending) path formatting per event. */
  lazy val materializedPaths: Seq[String] = source.materializePaths(filter)

  /** Build the concrete signal for a physical resource path (the event
    * codec direction). Reference: Signal.create, signal.py:405-468. */
  def fromEventPath(path: String): Option[Signal] = {
    val depth = spec.flatten.length
    source.extractDims(path, depth).flatMap { raws =>
      if (raws.length != depth) None
      else {
        val branch = DimFilter.branchOf(spec, raws)
        // validate against the declared filter (chain, not finalize — a
        // declared range should accept any event within compatible spec)
        filter.chain(branch).flatMap { chained =>
          if (chained.isEmpty) None else Some(copy(filter = branch))
        }
      }
    }
  }

  /** Materialize this (possibly range/wildcard) signal against concrete
    * per-dimension values; dims absent from `values` keep their declared
    * variants. Ranges explode when their dim receives a datum. */
  def materializeWith(values: Map[String, Any]): Signal = {
    def rebuild(f: DimFilter, dims: List[Dim]): DimFilter = dims match {
      case Nil => DimFilter.empty
      case d :: rest =>
        DimFilter(f.nodes.flatMap { case (v, sub) =>
          val newSub = rebuild(sub, rest)
          d.name.flatMap(values.get) match {
            case Some(raw) =>
              val datum = DimValue.resolve(raw, d)
              v.applyTo(datum, finalize = true) match {
                case Some(survivors) => survivors.map(s => (s, newSub))
                case None => Nil
              }
            case None => List((v, newSub))
          }
        })
    }
    copy(filter = rebuild(filter, spec.flatten))
  }
}
