package graft

/** All engine operators, in SURVEY.md §2 order. */
object Registry {
  def ops: Seq[Op] =
    operators.Relational.ops ++
      operators.Switchback.ops ++
      operators.Stats.ops ++
      operators.TimeSeries.ops

  def byName: Map[String, Op] = ops.map(o => o.name -> o).toMap
}
