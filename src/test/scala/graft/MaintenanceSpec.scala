package graft

import org.apache.spark.sql.functions._

import graft.ops.MaintenanceOps

/** Round-13 maintenance family: snapshot hash-diff (q101) and Morton
  * z-order clustering (q102). */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q101

  test("q101 diff core: synthetic add/remove/change/unchanged classify exactly") {
    val a = Seq(
      (1L, "alpha", "s1"), (2L, "beta", "s1"),
      (3L, "gamma", "s2"), (4L, "delta", "s2"))
      .toDF("doc_id", "text", "source")
    val b = Seq(
      (1L, "alpha", "s1"),          // unchanged
      (2L, "beta CHANGED", "s1"),   // changed
      (4L, "delta", "s2"),          // unchanged (3 removed)
      (9L, "brand new", "s2"))      // added
      .toDF("doc_id", "text", "source")
    val got = MaintenanceOps.snapshotDiffOf(a, b)
      .as[(String, String, Long)].collect()
      .map { case (s, t, n) => (s, t) -> n }.toMap
    assert(got == Map(
      ("s1", "unchanged") -> 1L, ("s1", "changed") -> 1L,
      ("s2", "removed") -> 1L, ("s2", "unchanged") -> 1L,
      ("s2", "added") -> 1L))
  }

  test("q101 mass balance at sf0.001: each class counts its exact id set") {
    val a = Tables.documents(spark, sf0001)
    val b = MaintenanceOps.deriveSnapshotB(a)
    val d = MaintenanceOps.snapshotDiff(spark, sf0001).cache()
    def classTotal(t: String): Long =
      d.where($"change_type" === t)
        .agg(coalesce(sum($"n_docs"), lit(0L))).as[Long].head()
    val aIds = a.select($"doc_id")
    val bIds = b.select($"doc_id")
    assert(classTotal("added") == bIds.exceptAll(aIds).count())
    assert(classTotal("removed") == aIds.exceptAll(bIds).count())
    assert(classTotal("changed") + classTotal("unchanged") ==
      aIds.intersect(bIds).count())
    // every id in A ∪ B is classified exactly once
    assert(d.agg(sum($"n_docs")).as[Long].head() ==
      aIds.union(bIds).distinct().count())
    d.unpersist()
  }

  // ---------------------------------------------------------------- q102

  test("q102 morton z: shift-mask interleave equals the bitwise definition") {
    def interleave(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (1023L, 77L), (65535L, 65535L), (43981L, 23916L))
    val got = cases.toDF("x", "y")
      .withColumn("z", MaintenanceOps.mortonZ($"x", $"y"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == interleave(x, y), s"($x,$y)")
    }
  }

  test("q102 report: every bucket bounds BOTH dimensions < 2^11; mass balances") {
    val r = MaintenanceOps.zorderReport(spark, sf0001).cache()
    assert(r.count() > 0)
    // top ZBucketBits of z pin 5 high bits of each 16-bit dim, leaving
    // 11 free bits per dim inside a bucket — the pruning contract
    assert(r.where($"u_max" - $"u_min" >= 2048 ||
      $"t_max" - $"t_min" >= 2048).count() == 0)
    assert(r.agg(sum($"n_events")).as[Long].head() ==
      Tables.events(spark, sf0001).count())
    r.unpersist()
  }

  test("q102 layout: z range partitions bound BOTH grid dimensions; a " +
      "single-column sort bounds only its own") {
    // uniform 256×256 grid — comparable cardinality in both dims (the
    // regime z-order is FOR; with wildly unequal cardinalities the
    // curve rightly spends its bits on the wide dimension)
    val parts = 16
    val grid = spark.range(256L * 256L)
      .select(($"id" % 256).as("x"), ($"id" / 256).cast("long").as("y"))
      .withColumn("z", MaintenanceOps.mortonZ($"x", $"y"))
    def extents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = df.groupBy(spark_partition_id().as("p"))
        .agg((max($"x") - min($"x")).as("dx"),
          (max($"y") - min($"y")).as("dy"))
        .agg(avg($"dx"), avg($"dy")).as[(Double, Double)].head()
      r
    }
    val (zdx, zdy) = extents(grid.repartitionByRange(parts, $"z"))
    val (ydx, _) = extents(grid.repartitionByRange(parts, $"y", $"x"))
    // 16 partitions over the 65536-point curve ≈ one 64×64 quad each:
    // both extents land well under half the 255 full range
    assert(zdx < 128 && zdy < 128, s"z extents ($zdx, $zdy)")
    // the y-sorted layout cannot bound x at all
    assert(ydx > 200, s"y-layout x extent $ydx")
  }
}
