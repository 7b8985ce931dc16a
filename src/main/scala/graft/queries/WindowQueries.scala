package graft.queries

object WindowQueries {
  def all: Seq[OracleQuery] = Seq()
}
