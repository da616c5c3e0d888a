package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Reference edge semantics on tiny in-memory frames (SURVEY.md §5.2):
  * unparseable-price discard (P6), deterministic first-seen dedup (D1),
  * as-of join alignment (union+window vs naive semantics). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("P6: unparseable price string is discarded by try_cast filter") {
    val df = Seq(("a", "100.5"), ("b", "not-a-number"), ("c", "99.99"),
      ("d", "")).toDF("id", "price")
    val kept = df
      .filter(expr("try_cast(price AS DECIMAL(12,2))") >= lit(100))
      .select("id").as[String].collect().toSet
    // 'b' and '' cast to null => comparison false => discarded, matching
    // the reference's float()-ValueError discard (02_filter_by_CIN.py:236-243)
    assert(kept == Set("a"))
  }

  test("D1: first-seen dedup keeps the earliest row per key, deterministically") {
    val df = Seq(
      (1L, "k1", "2020-01-03 00:00:00", "third"),
      (2L, "k1", "2020-01-01 00:00:00", "first"),
      (3L, "k1", "2020-01-02 00:00:00", "second"),
      (4L, "k2", "2020-01-05 00:00:00", "only"))
      .toDF("id", "key", "at", "tag")
      .withColumn("at", to_timestamp($"at"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"key").orderBy($"at", $"id")
    val kept = df.withColumn("rn", row_number().over(w))
      .where($"rn" === 1).select("tag").as[String].collect().toSet
    assert(kept == Set("first", "only"))
  }

  test("as-of join: each left row gets the latest right row at or before it") {
    val q = Relational.asofJoin(spark, sf0001)
    // every event either has no order (null) or an order date <= ts
    val bad = q.where($"last_orderdate" > $"ts").count()
    assert(bad == 0)
    // at least one event is matched at sf0.001
    assert(q.where($"last_orderkey".isNotNull).count() > 0)
    // exactly one row per event
    val ev = Tables.events(spark, sf0001).count()
    assert(q.count() == ev)
  }

  test("broadcast semi-join keeps only members (J1 shape)") {
    val facts = Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v")
    val dim = Seq(1, 3).toDF("k")
    val out = facts.join(broadcast(dim), Seq("k"), "left_semi")
      .select("v").as[String].collect().toSet
    assert(out == Set("x", "z"))
  }
}
