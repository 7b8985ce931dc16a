package graft.queries

object TextQueries {
  def all: Seq[OracleQuery] = Seq()
}
