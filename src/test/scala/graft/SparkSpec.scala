package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs (small parallelism: the specs use
  * tiny frames; 4 shuffle partitions keeps jobs snappy). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  override def afterAll(): Unit = () // shared session, keep alive
}

object SparkSpec {
  lazy val session: SparkSession =
    graft.core.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
}
