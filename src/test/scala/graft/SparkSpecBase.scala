package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (Spark startup is the
  * dominant test cost; specs only read and never mutate session state). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local("4")
}

trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = "/root/testdata/sf0.001"
}
