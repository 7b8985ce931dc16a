package graft.queries

object DedupQueries {
  def all: Seq[OracleQuery] = Seq()
}
