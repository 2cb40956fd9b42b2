package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>`/`array<double>` embedding columns.
  *
  * Built on `zip_with` + `aggregate` higher-order functions — evaluated
  * inside codegen without serialization, no UDFs. Inputs are cast to
  * double before multiplication so accumulation is double-precision
  * end-to-end (matches DuckDB's list_dot_product over DOUBLE[]).
  */
object vectors {

  private def asDouble(a: Column): Column = a.cast("array<double>")

  /** Dot product via the native codegen'd [[graft.expressions.DotProduct]]
    * expression (registered by GraftExtensions — a bare primitive loop in
    * whole-stage codegen). Sessions without the extension should use
    * [[dotHof]]. */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", asDouble(a), asDouble(b))

  /** Portable higher-order-function dot product (no extension required);
    * identical values — same sequential summation order. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Element-wise vector subtraction a − b. The IVFADC residual paths
    * use this on BOTH the corpus side (encode v − centroid) and the
    * query side (qres = qv − centroid) — one definition keeps the two
    * bit-identical, which ADC distance comparability depends on. */
  def sub(a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x - y)

  /** Cosine similarity; 0.0 when either norm is 0 (guards div-by-zero). */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(0.0)).otherwise(d / nn)
  }
}
