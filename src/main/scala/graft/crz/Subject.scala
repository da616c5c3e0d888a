package graft.crz

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subject extraction (08_extract_subject.py, SURVEY.md §2.6 O6 /
  * §2.7 F5/F7): find the "Predmet zmluvy" heading, else the
  * "úvodné ustanovenia" fallback, else 'Nenájdené'; snippet capped at
  * 600 chars after the match. A derived column of the corpus join —
  * never the reference's join-by-row-order (J5, SURVEY.md §2.3).
  */
object Subject {

  val NotFound = "Nenájdené"

  def extract(corpus: DataFrame): DataFrame = {
    // deterministic file order (name-sorted) before concatenation
    val docs = corpus.groupBy(col("contract_id"))
      .agg(expr(
        "array_join(transform(sort_array(collect_list(struct(file, text)))," +
          " x -> x.text), '\n')").as("t"))
    docs
      .withColumn("p1", locate("Predmet zmluvy", col("t")))
      // p2 indexes the LOWERCASED copy while the slice reads the
      // original — if a preceding char's lowercase form changed length
      // the snippet would shift. The reference has the IDENTICAL quirk
      // (08_extract_subject.py:42-56: casefold().find, slice original);
      // kept deliberately for parity.
      .withColumn("p2", locate("úvodné ustanovenia", lower(col("t"))))
      .withColumn("predmet",
        when(col("p1") > 0, expr("substring(t, p1, 600)"))
          .when(col("p2") > 0, expr("substring(t, p2, 600)"))
          .otherwise(lit(NotFound)))
      .select(col("contract_id"), col("predmet"))
  }
}
