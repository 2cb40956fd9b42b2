package graft.dev

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump per-query physical-plan red-flag summary (SURVEY §5
  * audit). Not part of the library surface. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN!") else None,
          if (plan.contains("PushedFilters: [") &&
              !plan.contains("PushedFilters: []")) Some("pushed") else None,
          Some("scans=" + "Scan parquet".r.findAllIn(plan).size),
          Some("shuffles=" + "Exchange hashpartitioning".r.findAllIn(plan).size),
          Some("bcast=" + "BroadcastExchange".r.findAllIn(plan).size),
          Some("sorts=" + "Sort \\[".r.findAllIn(plan).size)
        ).flatten
        println(f"$name%-28s ${flags.mkString(" ")}")
      } catch { case e: Throwable => println(s"$name AUDIT_FAIL ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
