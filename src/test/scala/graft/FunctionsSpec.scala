package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen

import graft.functions.{Functions, StrCount, VecKernels}

/** Edge semantics of the native expressions (SURVEY.md §5.2-5.3). */
class FunctionsSpec extends SparkSpec {

  private def cnt(text: String, kw: String): Long =
    StrCount.count(UTF8String.fromString(text), UTF8String.fromString(kw))

  test("str.count non-overlap semantics: 'aaaa'.count('aa') == 2") {
    assert(cnt("aaaa", "aa") == 2L)
    assert(cnt("aaa", "aa") == 1L)
    assert(cnt("abcabcab", "abc") == 2L)
  }

  test("empty needle counts zero; empty haystack counts zero") {
    assert(cnt("abc", "") == 0L)
    assert(cnt("", "abc") == 0L)
  }

  test("multibyte UTF-8 needles count correctly") {
    assert(cnt("žluťoučký žlutý", "žlu") == 2L)
    assert(cnt("ééé", "éé") == 1L) // non-overlapping
  }

  test("property: count matches the replace-length oracle formula") {
    val alpha = Gen.listOf(Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val needle = Gen.choose(1, 3).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    (1 to 500).foreach { _ =>
      val t = alpha.sample.getOrElse("")
      val k = needle.sample.getOrElse("a")
      val expected = (t.length - t.replace(k, "").length) / k.length
      assert(cnt(t, k) == expected.toLong, s"text='$t' kw='$k'")
    }
  }

  test("count_occurrences usable from SQL after register") {
    Functions.register(spark)
    val r = spark.sql("SELECT count_occurrences('aaaa', 'aa') AS c")
      .head().getLong(0)
    assert(r == 2L)
  }

  test("vec_dot: known value and left-to-right accumulation") {
    Functions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r == 1.5 * 3.0 + 2.0 * 0.5)
  }

  test("dotF kernel equals a left fold in double") {
    val a = Array(0.1f, 0.2f, 0.3f, 0.7f)
    val b = Array(1.0f, -1.0f, 0.5f, 2.0f)
    val ad = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a)
    val bd = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(b)
    val fold = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }
      .foldLeft(0.0)(_ + _)
    assert(VecKernels.dotF(ad, bd) == fold)
  }
}
