package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._
import java.sql.Date

class CdcSpec extends SparkSpecBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // ---- snapshot diff ---------------------------------------------------

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val oldSnap = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "s", "v")
    val newSnap = Seq(
      (1L, "a", 10.0),      // unchanged → dropped
      (2L, "b", 25.0),      // changed value
      (3L, "X", 30.0),      // changed attr
      (5L, "e", 50.0)       // added; 4 removed
    ).toDF("k", "s", "v")

    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("s", "v"))
      .select("k", "change_type", "old_s", "new_s", "old_v", "new_v")
      .as[(Long, String, Option[String], Option[String], Option[Double], Option[Double])]
      .collect().sortBy(_._1).toSeq

    assert(out == Seq(
      (2L, "changed", Some("b"), Some("b"), Some(20.0), Some(25.0)),
      (3L, "changed", Some("c"), Some("X"), Some(30.0), Some(30.0)),
      (4L, "removed", Some("d"), None, Some(40.0), None),
      (5L, "added", None, Some("e"), None, Some(50.0))))
  }

  test("snapshotDiff null-to-value transitions are changes, null-to-null is not") {
    val oldSnap = Seq((1L, None: Option[String]), (2L, None: Option[String]))
      .toDF("k", "s")
    val newSnap = Seq((1L, Some("x")), (2L, None: Option[String])).toDF("k", "s")
    val out = Cdc.snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("s"))
      .select("k", "change_type").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "changed"))) // k=2 null <=> null → unchanged
  }

  // ---- SCD2 merge ------------------------------------------------------

  private val dim = Seq(
    // k=10 has history: one closed version + one current
    (10L, "old-seg", d("2023-01-01"), Some(d("2024-01-01"))),
    (10L, "cur-seg", d("2024-01-01"), None),
    (20L, "stable", d("2024-01-01"), None),
    (30L, "victim", d("2024-01-01"), None)
  ).toDF("k", "seg", "valid_from", "valid_to")

  test("scd2Merge closes changed versions, opens new ones, passes history through") {
    val updates = Seq(
      (30L, "victim2", d("2024-06-01")), // change → close + open
      (20L, "stable", d("2024-06-01")),  // identical attrs → no-op
      (40L, "newkey", d("2024-06-01"))   // brand-new key → open
    ).toDF("k", "seg", "eff")

    val out = Cdc.scd2Merge(dim, updates, Seq("k"), Seq("seg"), "eff")
      .select("k", "seg", "valid_from", "valid_to")
      .as[(Long, String, Date, Option[Date])]
      .collect().sortBy(r => (r._1, r._3.toString)).toSeq

    assert(out == Seq(
      (10L, "old-seg", d("2023-01-01"), Some(d("2024-01-01"))), // history untouched
      (10L, "cur-seg", d("2024-01-01"), None),                  // no update → still open
      (20L, "stable", d("2024-01-01"), None),                   // idempotent no-op
      (30L, "victim", d("2024-01-01"), Some(d("2024-06-01"))),  // closed
      (30L, "victim2", d("2024-06-01"), None),                  // new version
      (40L, "newkey", d("2024-06-01"), None)))                  // insert
  }

  test("scd2Merge re-applying the same batch is a no-op (idempotent delivery)") {
    val updates = Seq((30L, "victim2", d("2024-06-01"))).toDF("k", "seg", "eff")
    val once = Cdc.scd2Merge(dim, updates, Seq("k"), Seq("seg"), "eff")
    val twice = Cdc.scd2Merge(once, updates, Seq("k"), Seq("seg"), "eff")
    val a = once.orderBy("k", "valid_from").collect().toSeq
    val b = twice.orderBy("k", "valid_from").collect().toSeq
    assert(a == b)
  }

  test("scd2Merge collapses multiple updates per key to the latest by effective date") {
    val updates = Seq(
      (30L, "mid", d("2024-03-01")),
      (30L, "late", d("2024-09-01")),
      (30L, "early", d("2024-02-01"))
    ).toDF("k", "seg", "eff")
    val out = Cdc.scd2Merge(dim, updates, Seq("k"), Seq("seg"), "eff")
      .filter(col("k") === 30L)
      .select("seg", "valid_from", "valid_to")
      .as[(String, Date, Option[Date])].collect().sortBy(_._2.toString).toSeq
    assert(out == Seq(
      ("victim", d("2024-01-01"), Some(d("2024-09-01"))),
      ("late", d("2024-09-01"), None)))
  }

  test("scd2Merge rejects an update effective before the current version's start") {
    val updates = Seq((30L, "timewarp", d("2023-06-01"))).toDF("k", "seg", "eff")
    val e = intercept[Exception] {
      Cdc.scd2Merge(dim, updates, Seq("k"), Seq("seg"), "eff").collect()
    }
    assert(e.getMessage.contains("scd2Merge") ||
      Option(e.getCause).exists(_.getMessage.contains("scd2Merge")), e.getMessage)
  }
}
