package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cramer's-rule solve kernel: `graft_cramer_solve(m00..m(k-1)(k-1),
  * rhs0..rhs(k-1))` → `array<double>` of `[det, num0, ..., num(k-1)]`
  * — the determinant of the k×k matrix (row-major children) and the k
  * Cramer numerators (column i replaced by the rhs vector).
  *
  * WHY (r20, q133): the 6×6 cofactor-expansion Column trees
  * ([[graft.operators.Forecast.CramerTrees]]) inline 720 multiplication
  * terms PER determinant — seven of them (det + six numerators) in one
  * Project generated a 3.3 MB whole-stage-codegen method, paying
  * seconds of Janino compilation and landing far past the JIT's
  * 8 KB byte-code limit, for a projection that runs over ~35 grouped
  * rows. This kernel evaluates the IDENTICAL arithmetic in compiled
  * Scala instead: same first-row cofactor expansion, same recursive
  * minors, same left-associated alternating fold
  * (((t0 − t1) + t2) − t3 …) — IEEE double operations in the exact
  * same order, so the result is BIT-IDENTICAL to the Column trees and
  * to the fully-parenthesized SQL the oracle replays (CramerSpec pins
  * the equality). CodegenFallback is deliberate: the point is to keep
  * this expression OUT of codegen; the interpreted projection over a
  * handful of rows is microseconds.
  */
case class CramerSolve(children: Seq[Expression])
    extends Expression with CodegenFallback {

  private val k: Int = {
    val n = children.length
    val kk = ((math.sqrt(4.0 * n + 1) - 1) / 2).round.toInt
    require(kk >= 2 && kk * kk + kk == n,
      s"graft_cramer_solve arity must be k*k + k for some k >= 2, got $n")
    kk
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cramer_solve"

  /** First-row cofactor expansion, recursive minors, terms folded left
    * with alternating subtract/add — the EXACT association of
    * [[graft.operators.Forecast.CramerTrees]]'s `detRec` (term 0 seeds
    * the fold; odd-indexed terms subtract, even add). */
  private def det(m: Array[Array[Double]]): Double = {
    val n = m.length
    if (n == 2) m(0)(0) * m(1)(1) - m(0)(1) * m(1)(0)
    else {
      var acc = 0.0
      var j = 0
      while (j < n) {
        val minor = new Array[Array[Double]](n - 1)
        var r = 0
        while (r < n - 1) {
          val row = m(r + 1)
          val out = new Array[Double](n - 1)
          var c = 0
          var cc = 0
          while (c < n) {
            if (c != j) { out(cc) = row(c); cc += 1 }
            c += 1
          }
          minor(r) = out
          r += 1
        }
        val t = m(0)(j) * det(minor)
        acc = if (j == 0) t else if (j % 2 == 1) acc - t else acc + t
        j += 1
      }
      acc
    }
  }

  override def eval(input: InternalRow): Any = {
    val vals = new Array[Double](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      vals(i) = v.asInstanceOf[Double]
      i += 1
    }
    val m = Array.tabulate(k, k)((r, c) => vals(r * k + c))
    val rhs = Array.tabulate(k)(i0 => vals(k * k + i0))
    val out = new Array[Double](k + 1)
    out(0) = det(m)
    var ci = 0
    while (ci < k) {
      val sub = Array.tabulate(k, k)((r, c) => if (c == ci) rhs(r) else m(r)(c))
      out(ci + 1) = det(sub)
      ci += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CramerSolve =
    copy(children = newChildren)
}
