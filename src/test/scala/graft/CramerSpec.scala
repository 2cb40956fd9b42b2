package graft

import graft.operators.Forecast
import org.apache.spark.sql.functions._

/** r20 (q133): the compiled Cramer solve kernel
  * ([[graft.expressions.CramerSolve]]) must be BIT-IDENTICAL to the
  * cofactor-expansion Column trees ([[Forecast.Cramer6]]) it replaces —
  * same first-row expansion, same recursive minors, same
  * left-associated alternating fold, IEEE doubles in the same order.
  * The oracle replays the SQL rendering of the same trees, so kernel ==
  * Column tree == oracle. */
class CramerSpec extends SparkSpecBase {
  import spark.implicits._

  test("graft_cramer_solve is bit-identical to the Cramer6 Column trees") {
    import Forecast.Cramer6
    val names = Cramer6.gramNames.flatten.distinct ++ Cramer6.rhsNames
    // deterministic pseudo-random sums, including awkward magnitudes
    val rng = new scala.util.Random(42)
    val rows = (1 to 64).map { i =>
      names.map(_ => (rng.nextDouble() - 0.5) * math.pow(10.0, rng.nextInt(7) - 3))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(org.apache.spark.sql.Row.fromSeq(_)), 4),
      org.apache.spark.sql.types.StructType(names.map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType))))
    val solved = call_function("graft_cramer_solve",
      (Cramer6.gramNames.flatten ++ Cramer6.rhsNames).map(col): _*)
    val both = df.select(
      solved.as("ks"),
      struct((Cramer6.det(graft.operators.Forecast.Cramer4.ColAlg) +:
        (0 until 6).map(i =>
          Cramer6.num(graft.operators.Forecast.Cramer4.ColAlg, i))): _*).as("ct"))
      .collect()
    both.foreach { r =>
      val ks = r.getSeq[Double](0)
      val ct = r.getStruct(1)
      (0 to 6).foreach { i =>
        val a = ks(i)
        val b = ct.getDouble(i)
        assert(java.lang.Double.doubleToLongBits(a) ==
          java.lang.Double.doubleToLongBits(b),
          s"component $i drifted: kernel=$a tree=$b")
      }
    }
  }
}
