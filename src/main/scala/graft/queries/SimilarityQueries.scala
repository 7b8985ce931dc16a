package graft.queries

object SimilarityQueries {
  def all: Seq[OracleQuery] = Seq()
}
