package graft

import graft.functions.vectors
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpecBase {
  import spark.implicits._

  test("dot and cosine match hand-computed values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val (d, c) = df.select(
      vectors.dot(col("a"), col("b")).as("d"),
      vectors.cosine(col("a"), col("b")).as("c")).as[(Double, Double)].head()
    assert(math.abs(d - 32.0) < 1e-9)
    // cos = 32 / (sqrt(14)*sqrt(77))
    assert(math.abs(c - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-9)
  }

  test("cosine guards zero vectors") {
    val c = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
      .select(vectors.cosine(col("a"), col("b"))).as[Double].head()
    assert(c == 0.0)
  }
}
