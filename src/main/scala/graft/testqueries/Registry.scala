package graft.testqueries

/** All driver-checkable queries, in catalog order. */
object Registry {
  def all: Seq[QueryDef] =
    CoreQueries.all ++ TextDedupQueries.all ++ VectorEventQueries.all ++
      CompletenessQueries.all ++ FunctionQueries.all ++
      LayoutQueries.all ++ MixQueries.all ++ TrainingDataQueries.all ++
      PipelineQueries.all ++ IndexQueries.all ++ StatQueries.all
}
