package graft.plans

import graft.expressions.{BpeEncodeExpr, BpeEncodeIdsExpr, CramerSolve, DotProduct, KllMergeAgg, KllQuantile, KllSketchAgg, KmvMergeAgg, KmvShingledAgg, KmvSketchAgg, MinHashShingled, MinHashSignature, NGramHashes, SimHash60Md5, SimHash64, SpanWindowHashes, TextEmbedMd5, WinnowSelect}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension registering graft's native expressions so they are
  * callable from SQL and `call_function` on any session configured with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (GraftSession sets
  * this). This is the public, supported extension point — no
  * `private[sql]` internals are touched.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashSignature(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash64(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60_md5"),
      new ExpressionInfo(classOf[SimHash60Md5].getName, "graft_simhash60_md5"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SimHash60Md5(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_shingled"),
      new ExpressionInfo(classOf[MinHashShingled].getName, "graft_minhash_shingled"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        MinHashShingled(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NGramHashes].getName, "graft_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NGramHashes(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow_select"),
      new ExpressionInfo(classOf[WinnowSelect].getName, "graft_winnow_select"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        WinnowSelect(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_span_windows"),
      new ExpressionInfo(classOf[SpanWindowHashes].getName, "graft_span_windows"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SpanWindowHashes(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_text_embed"),
      new ExpressionInfo(classOf[TextEmbedMd5].getName, "graft_text_embed"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        TextEmbedMd5(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_agg"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "graft_kll_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllSketchAgg(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_merge"),
      new ExpressionInfo(classOf[KllMergeAgg].getName, "graft_kll_merge"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllMergeAgg(children(0)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_kll_quantile"),
      new ExpressionInfo(classOf[KllQuantile].getName, "graft_kll_quantile"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KllQuantile(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_agg"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv_agg"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvSketchAgg(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_shingled"),
      new ExpressionInfo(classOf[KmvShingledAgg].getName, "graft_kmv_shingled"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvShingledAgg(children(0), children(1), children(2)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_kmv_merge"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "graft_kmv_merge"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        KmvMergeAgg(children(0), children(1)).toAggregateExpression()))
    ext.injectFunction((
      FunctionIdentifier("graft_cramer_solve"),
      new ExpressionInfo(classOf[CramerSolve].getName, "graft_cramer_solve"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CramerSolve(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_encode"),
      new ExpressionInfo(classOf[BpeEncodeExpr].getName, "graft_bpe_encode"),
      // the merge-table sides must be foldable array literals: the
      // builder evaluates them ONCE at analysis time into a validated
      // BpeTable baked into the expression (see BpeEncodeExpr.build)
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeEncodeExpr.build(children)))
    ext.injectFunction((
      FunctionIdentifier("graft_bpe_encode_ids"),
      new ExpressionInfo(classOf[BpeEncodeIdsExpr].getName, "graft_bpe_encode_ids"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        BpeEncodeExpr.buildIds(children)))
  }
}
