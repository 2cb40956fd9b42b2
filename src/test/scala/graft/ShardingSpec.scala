package graft

import graft.operators.Sharding
import org.apache.spark.sql.functions._

class ShardingSpec extends SparkSpecBase {
  import spark.implicits._

  test("writeShards is a deterministic partition: every row exactly once, same seed ⇒ same layout") {
    val docs = Tables(spark, sfDir).documents.select("doc_id", "text")
    val n = docs.count()
    val p1 = java.nio.file.Files.createTempDirectory("graft_shards1").toString
    val p2 = java.nio.file.Files.createTempDirectory("graft_shards2").toString
    Sharding.writeShards(docs, p1, "doc_id", numShards = 4, seed = 7L)
    Sharding.writeShards(docs, p2, "doc_id", numShards = 4, seed = 7L)
    val r1 = spark.read.parquet(p1).select(col("doc_id"), col("shard"))
      .as[(Long, Int)].collect().toMap
    val r2 = spark.read.parquet(p2).select(col("doc_id"), col("shard"))
      .as[(Long, Int)].collect().toMap
    assert(r1.size == n, "no row lost or duplicated")
    assert(r1 == r2, "same seed must reproduce the exact shard assignment")
    assert(r1.values.toSet.subsetOf((0 until 4).toSet))
    // shards are usefully balanced under the hash route
    val sizes = r1.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.min > n / 8, s"shard sizes too skewed: $sizes")
    // a different seed is a different permutation
    val p3 = java.nio.file.Files.createTempDirectory("graft_shards3").toString
    Sharding.writeShards(docs, p3, "doc_id", numShards = 4, seed = 8L)
    val r3 = spark.read.parquet(p3).select(col("doc_id"), col("shard"))
      .as[(Long, Int)].collect().toMap
    assert(r3 != r1, "new seed must reshuffle")
  }

  test("splitByHash partitions rows deterministically with ~weight proportions") {
    val docs = Tables(spark, sfDir).documents.select("doc_id")
    val n = docs.count().toDouble
    val splits = Sharding.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
    val ids = splits.view.mapValues(_.as[Long].collect().toSet).toMap
    // exact partition: disjoint and complete
    assert(ids.values.map(_.size).sum == n.toLong)
    assert(ids("train").intersect(ids("val")).isEmpty)
    assert(ids("train").intersect(ids("test")).isEmpty)
    assert(ids("val").intersect(ids("test")).isEmpty)
    // proportions within sampling tolerance
    assert(math.abs(ids("train").size / n - 0.8) < 0.06, s"train ${ids("train").size / n}")
    assert(math.abs(ids("val").size / n - 0.1) < 0.05)
    // deterministic: the same seed reproduces membership exactly
    val again = Sharding.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), seed = 3L)
    assert(again("val").as[Long].collect().toSet == ids("val"))
    // and no shuffle: the split is a pure filter over the scan
    val plan = splits("train").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "splitByHash must not shuffle")
  }
}
