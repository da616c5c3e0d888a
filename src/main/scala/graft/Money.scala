package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.DecimalType

/** The engine's money-precision contract, in ONE place: sums over
  * 2-decimal money columns accumulate as DECIMAL(12,2) — exact and
  * order-insensitive across any partitioning, which is what makes the
  * DuckDB-oracle comparison byte-stable (final outputs then cast to
  * DOUBLE at the edge; see MEMORY/PLANS parity rules). */
private[graft] object Money {
  def dec2(c: Column): Column = c.cast(DecimalType(12, 2))
}
