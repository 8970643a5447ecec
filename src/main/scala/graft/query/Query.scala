package graft.query

/** The query IR — what the reference's NSE front-end `parse.dots`
  * (R/data.cube.R:121-228) produces: one operation per dimension, each a
  * selection (`.`/plain args), a collapse (`-`), a rollup (`+`) or a cube
  * (`^`), with optional per-field filters. In Scala the NSE maze collapses
  * to a typed builder (SURVEY §7.4.1); validation against dimension fields
  * happens at execution, mirroring R/data.cube.R:197-204.
  */
sealed trait DimOp {
  def filters: Map[String, Seq[Any]]
}

object DimOp {
  /** Slice/dice: keep the dimension, optionally filtered (`.(f=v)`). */
  final case class Select(filters: Map[String, Seq[Any]] = Map.empty) extends DimOp
  /** Collapse: aggregate the dimension away, optionally pre-filtered —
    * the reference's `` `-`(time_year=2013:2014) `` (R/data.cube.R:167,
    * 278-280; semantics vignettes/sub-.data.cube.Rmd:122-131). */
  final case class Collapse(filters: Map[String, Seq[Any]] = Map.empty) extends DimOp
  /** Rollup over this dimension's hierarchy level keys (`+`) — what the
    * reference parsed but left stubbed (R/data.cube.R:282-315, SURVEY §2.6
    * G4); `levels` defaults to the first hierarchy's level keys. */
  final case class Rollup(filters: Map[String, Seq[Any]] = Map.empty,
                          levels: Seq[String] = Seq.empty) extends DimOp
  /** Full cube (`^`) over this dimension's level keys. */
  final case class CubeOp(filters: Map[String, Seq[Any]] = Map.empty,
                          levels: Seq[String] = Seq.empty) extends DimOp
}

/** Builder sugar: `dim("time").where("time_year" -> Seq(2014)).collapse()`. */
final case class DimExpr(name: String, op: DimOp,
                         positions: Seq[Int] = Seq.empty) {
  def where(fs: (String, Seq[Any])*): DimExpr = {
    val merged = op.filters ++ fs.toMap
    val newOp = op match {
      case _: DimOp.Select   => DimOp.Select(merged)
      case _: DimOp.Collapse => DimOp.Collapse(merged)
      case r: DimOp.Rollup   => r.copy(filters = merged)
      case c: DimOp.CubeOp   => c.copy(filters = merged)
    }
    copy(op = newOp)
  }
  /** Positional slice — the array-compatible `ar[2,,]` path
    * (R/level.R:38-41): 1-based positions into the dimension's key values
    * in sorted key order. Resolved lazily (row_number over sorted keys +
    * semi-join), no driver collect. DIVERGENCE from R arrays: an
    * out-of-range position yields an empty result, not a subscript error —
    * erroring would require a blocking cardinality check at composition
    * time; this matches the engine's F5 semantics where unmatched filter
    * values silently select nothing. */
  def at(ps: Int*): DimExpr = copy(positions = positions ++ ps)
  def collapse(): DimExpr = copy(op = DimOp.Collapse(op.filters))
  def rollup(levels: String*): DimExpr =
    copy(op = DimOp.Rollup(op.filters, levels))
  def cubeOp(levels: String*): DimExpr =
    copy(op = DimOp.CubeOp(op.filters, levels))
}

object dsl {
  /** Entry point: `dim("customer")` selects; chain `.where(...)`,
    * `.collapse()`, `.rollup(...)`. */
  def dim(name: String): DimExpr = DimExpr(name, DimOp.Select())
}
