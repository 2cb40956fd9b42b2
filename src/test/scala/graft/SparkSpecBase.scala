package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (Spark startup is the
  * dominant test cost; specs only read and never mutate session state). */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.local("4")
    // keep the full plan visible under final sorts (r19): the
    // registered tails materialize before their orderBy in production
    // (Perf.sortedOnce — kills the range-sampling double execution),
    // which truncates the plan the shape specs assert on (pushed
    // filters, join strategy, scan counts). The toggle changes the
    // execution strategy only, never the rows — results specs cover
    // both shapes because Verify/bench run with the default.
    s.conf.set("spark.graft.sortedOnce.materialize", "false")
    s
  }
}

trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val sfDir = "/root/testdata/sf0.001"
}
