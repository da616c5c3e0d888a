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

  test("property: tokenizer partitions the input (tokens + separators = input)") {
    // SURVEY.md §5.3: splitting on [^a-z]+ and re-interleaving the
    // separator runs must reconstruct the original string
    val gen = Gen.listOf(Gen.oneOf(Gen.oneOf('a', 'b', 'z'),
      Gen.oneOf(' ', ',', '1', '!'))).map(_.mkString)
    (1 to 300).foreach { _ =>
      val s0 = gen.sample.getOrElse("")
      val tokens = s0.split("[^a-z]+", -1)
      val seps = s0.split("[a-z]+", -1)
      assert(tokens.map(_.length).sum + seps.map(_.length).sum == s0.length,
        s"input='$s0'")
      // and no token contains a separator character
      assert(tokens.forall(_.forall(c => c >= 'a' && c <= 'z')))
    }
  }

  test("property: naturalKey ordering equals Python's re.split list " +
      "compare on random alphanumeric names") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // independent reimplementation of the reference semantics
    // (04_convert_contracts_to_text.py:51-54): split into maximal
    // digit/text runs, digits compare as ints, Python compares lists
    // elementwise with shorter-prefix-first
    def pyKey(s: String): Seq[Either[Long, String]] =
      "[0-9]+|[^0-9]+".r.findAllIn(s.toLowerCase).map { run =>
        if (run.forall(_.isDigit)) Left(BigInt(run).min(Long.MaxValue).toLong)
        else Right(run)
      }.toSeq
    implicit val ord: Ordering[Seq[Either[Long, String]]] =
      new Ordering[Seq[Either[Long, String]]] {
        def compare(a: Seq[Either[Long, String]],
            b: Seq[Either[Long, String]]): Int = {
          a.zip(b).foreach { case (x, y) =>
            val c = (x, y) match {
              case (Left(i), Left(j)) => java.lang.Long.compare(i, j)
              // maximal runs alternate: a type mismatch means one key
              // has a digit run where the other has text — struct
              // compare puts ('', n) before (run, -1) because '' < run
              case (Left(_), Right(_)) => -1
              case (Right(_), Left(_)) => 1
              case (Right(u), Right(v)) => u.compareTo(v)
            }
            if (c != 0) return c
          }
          a.size.compareTo(b.size)
        }
      }
    val gen = Gen.listOf(Gen.frequency(
      6 -> Gen.oneOf('a', 'b', 'z'), 5 -> Gen.numChar,
      1 -> Gen.oneOf('-', '_', '.'))).map(_.mkString)
    val names = (1 to 250).map(_ => gen.sample.getOrElse(""))
      .filter(_.nonEmpty).distinct
    val expected = names.sortBy(n => (pyKey(n), n))
    val got = names.toDF("source")
      .withColumn("k", graft.ops.TextOps.naturalKey(col("source")))
      .orderBy(col("k"), col("source"))
      .select("source").as[String].collect().toSeq
    assert(got == expected)
  }

  test("property: field-wise recursive date compare equals timestamp >=") {
    // SURVEY.md §5.3 / §1.2: the reference's recursive Y/M/D/h/m/s
    // integer descent (02_filter_by_CIN.py:70-89) is equivalent to a
    // plain timestamp comparison for all well-formed dates — the
    // equivalence that justifies replacing it with TimestampType.
    val genDate = for {
      y <- Gen.choose(2010, 2023); m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28); h <- Gen.choose(0, 23)
      mi <- Gen.choose(0, 59); se <- Gen.choose(0, 59)
    } yield (y, m, d, h, mi, se)
    def recursiveGte(a: (Int, Int, Int, Int, Int, Int),
        b: (Int, Int, Int, Int, Int, Int)): Boolean = {
      val la = a.productIterator.toList.asInstanceOf[List[Int]]
      val lb = b.productIterator.toList.asInstanceOf[List[Int]]
      la.zip(lb).find { case (x, y) => x != y }
        .forall { case (x, y) => x > y }
    }
    def fmt(t: (Int, Int, Int, Int, Int, Int)) =
      f"${t._1}%04d-${t._2}%02d-${t._3}%02d ${t._4}%02d:${t._5}%02d:${t._6}%02d"
    (1 to 300).foreach { _ =>
      val a = genDate.sample.get
      val b = genDate.sample.get
      // LocalDateTime: pure field-wise compare. Timestamp.valueOf
      // resolves through the JVM default zone, where a DST spring-
      // forward gap would make the equivalence genuinely false.
      val viaTs = java.time.LocalDateTime
        .of(a._1, a._2, a._3, a._4, a._5, a._6)
        .compareTo(java.time.LocalDateTime
          .of(b._1, b._2, b._3, b._4, b._5, b._6)) >= 0
      assert(recursiveGte(a, b) == viaTs, s"a=${fmt(a)} b=${fmt(b)}")
    }
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

  test("vec_dot NULL semantics: length mismatch and null elements " +
      "poison the result (zip_with/list_zip convention), never truncate") {
    Functions.register(spark)
    val mism = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d").head()
    assert(mism.isNullAt(0))
    val withNull = spark.sql(
      "SELECT vec_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d").head()
    assert(withNull.isNullAt(0))
  }

  test("native functions fail analysis on wrong types and wrong arity, " +
      "never compute silently") {
    Functions.register(spark)
    // a double array would read garbage through getFloat — must fail
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0, 2.0), array(3.0, 0.5))").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT count_occurrences(1, 'x')").collect()
    }
    // over-arity must not silently drop the extra argument
    intercept[Exception] {
      spark.sql("SELECT minhash_sig('abcdef', 7)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT count_occurrences('a')").collect()
    }
  }

  test("minhash_sig byte-offset windows equal the composed codepoint " +
      "formulation on multibyte text") {
    import spark.implicits._
    Functions.register(spark)
    // ž/ľ/é are 2-byte; the shingle windows must advance by CODEPOINT
    val docs = Seq("žluťoučký kôň", "abcde", "ééééé", "abcd", "")
      .toDF("text")
    val native = docs.selectExpr(
      "sort_array(minhash_sig(text).ss) AS ss", "minhash_sig(text).mins AS mins")
    // the slow-but-obviously-correct twin: per-position codepoint
    // substring (guarded — sequence(1, 0) would run DESCENDING)
    val sh = "CASE WHEN char_length(text) >= 5 THEN " +
      "array_distinct(transform(sequence(1, char_length(text) - 4), " +
      "i -> substring(text, i, 5))) ELSE CAST(array() AS ARRAY<STRING>) END"
    val composed = docs.selectExpr(
      s"sort_array($sh) AS ss",
      s"transform(sequence(0, 7), p -> array_min(transform($sh, " +
        "s -> substring(md5(s), p * 4 + 1, 4)))) AS mins")
    val n = native.collect().toSeq.map(_.toString)
    val c = composed.collect().toSeq.map(_.toString)
    assert(n == c)
  }
}
