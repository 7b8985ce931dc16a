package graft.queries

object JoinQueries {
  def all: Seq[OracleQuery] = Seq()
}
