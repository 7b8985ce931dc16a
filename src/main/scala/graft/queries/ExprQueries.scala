package graft.queries

object ExprQueries {
  def all: Seq[OracleQuery] = Seq()
}
