package graft

/** All engine operators, in SURVEY.md §2 order. */
object Registry {
  def ops: Seq[Op] =
    operators.Relational.ops ++
      operators.Geo.ops ++
      operators.Switchback.ops ++
      operators.SwitchbackPipeline.ops ++
      operators.DailyPipeline.ops ++
      operators.Orchestration.ops ++
      operators.Maintenance.ops ++
      operators.SqlSurface.ops ++
      operators.Stats.ops ++
      operators.TimeSeries.ops ++
      operators.Dedup.ops ++
      operators.Similarity.ops ++
      operators.TextAnalysis.ops ++
      operators.Corpus.ops ++
      operators.Causal.ops ++
      operators.Graph.ops ++
      operators.Multimodal.ops ++
      operators.Approx.ops ++
      streaming.StreamingOps.ops

  def byName: Map[String, Op] = ops.map(o => o.name -> o).toMap
}
