package graft.queries

object AggQueries {
  def all: Seq[OracleQuery] = Seq()
}
