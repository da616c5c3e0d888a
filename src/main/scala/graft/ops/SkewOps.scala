package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-mitigation operators (SURVEY.md §7 scale design; the builder
  * brief's "salting for skew" requirement as first-class, oracle-checked
  * operators rather than a config footnote).
  *
  * Both operators are semantically identical to their unsalted forms —
  * the salt only changes the SHUFFLE layout — so both are verified
  * against plain-SQL DuckDB oracles. AQE's runtime skew handling
  * (spark.sql.adaptive.skewJoin) covers sort-merge joins; these
  * patterns cover the two cases AQE does not: hot keys in a hash
  * aggregation, and hot keys in a broadcast-ineligible dimension join.
  */
object SkewOps {

  private def dec2 = graft.Money.dec2 _

  private val nSalts = 16

  /** q49 — salted two-phase aggregation: a hot user's events would all
    * land on one reducer in a plain groupBy(user_id); salting on a
    * deterministic hash of the row id splits each key across
    * [[nSalts]] partial groups (phase 1, map-side combinable), and the
    * final merge (phase 2) only sees nSalts rows per key. Decimal
    * partials keep the two-phase sum bit-identical to the one-phase
    * oracle. */
  def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val partials = Tables.events(s, dir)
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(nSalts)))
      .groupBy($"user_id", $"salt")
      .agg(count(lit(1)).as("pn"), sum(dec2($"value")).as("pv"))
    partials
      .groupBy($"user_id")
      .agg(sum($"pn").as("n_events"),
        sum($"pv").cast("double").as("sum_value"))
  }

  val saltedAggSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id""".stripMargin

  /** q50 — salted dimension join: when the fact side is skewed on the
    * join key and the dimension is too large to broadcast, replicate
    * the dimension [[nSalts]]× (one copy per salt) and join on
    * (key, salt) — each hot key's fact rows spread across nSalts
    * reducers instead of one. The fact's salt is a deterministic hash
    * of its row id, so results are reproducible and exactly equal to
    * the unsalted join (each fact row meets exactly one dim replica). */
  def saltedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fact = Tables.events(s, dir)
      .withColumn("salt", pmod(xxhash64($"event_id"), lit(nSalts)))
    val dim = Tables.customer(s, dir)
      .select($"c_custkey", $"c_mktsegment")
      .withColumn("salt", explode(lit((0L until nSalts.toLong).toArray)))
    // disable broadcast for the replicated dim via a shuffle hint so the
    // salted path is actually exercised (a broadcast would make salting
    // moot — which is the point of the pattern: use it when you can't)
    fact.join(dim.hint("shuffle_hash"),
        fact("user_id") === dim("c_custkey") && fact("salt") === dim("salt"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        sum(dec2($"value")).cast("double").as("sum_value"))
  }

  val saltedJoinSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment""".stripMargin
}
