package graft.queries

object PipelineQueries {
  def all: Seq[OracleQuery] = Seq()
}
