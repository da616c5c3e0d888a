package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Growable bounded buffer of (score, id) pairs keeping the top `k` by
  * (score DESC, id ASC). Small (k ≤ dozens) — a sorted insertion array
  * beats a heap at these sizes and keeps eval allocation-free.
  */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** True if (s, id) ranks strictly better than (s2, id2), under
    * Spark's sort semantics for doubles: NaN orders ABOVE every value
    * (so it ranks first under `desc`, like the row_number-window
    * formulation) and -0.0 ties +0.0. Double.compare gives the NaN
    * rule; zeros are normalized at insert. */
  @inline private def better(s: Double, id: Long, s2: Double, id2: Long): Boolean = {
    val c = java.lang.Double.compare(s, s2)
    c > 0 || (c == 0 && id < id2)
  }

  def insert(score: Double, id: Long): Unit = {
    // -0.0 == 0.0 is true; store +0.0 so Double.compare ties them
    val s = if (score == 0.0d) 0.0d else score
    if (size == k && !better(s, id, scores(size - 1), ids(size - 1))) return
    // find insertion point (descending order)
    var i = if (size == k) size - 1 else size
    while (i > 0 && better(s, id, scores(i - 1), ids(i - 1))) i -= 1
    // shift down
    var j = math.min(size, k - 1)
    while (j > i) {
      scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1
    }
    scores(i) = s; ids(i) = id
    if (size < k) size += 1
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.scores(i), other.ids(i)); i += 1 }
  }
}

/** topk_neighbors(struct(score, id), k) — bounded top-k aggregate with
  * map-side partial aggregation: each partition reduces its rows to a
  * k-element buffer BEFORE the shuffle, so a group's shuffle volume is
  * k × numPartitions rows instead of the full pair stream. The
  * window/row_number formulation shuffles every pair. Ordering is
  * (score DESC, id ASC) — deterministic, matching the q24/q25 oracle
  * tie-break. Returns array&lt;struct&lt;id, score&gt;&gt; ranked best-first.
  *
  * Null handling: rows with a NULL score or id are DROPPED (update()
  * skips them), so the window equivalence the spec asserts holds for
  * non-null inputs only — a `desc` window is NULLS LAST and would
  * still RANK null-score rows, padding short groups where this
  * aggregate returns fewer than k. The similarity pipelines feed it
  * computed, never-null pairs.
  */
case class TopKNeighbors(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"topk_neighbors k must be an integer literal, got $other")
  }

  override def children: Seq[Expression] = Seq(child, kExpr)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StructType(Array(a, b))
        if a.dataType == DoubleType && b.dataType == LongType =>
      if (!kExpr.foldable)
        TypeCheckResult.TypeCheckFailure("k must be foldable")
      else
        try {
          if (k <= 0)
            TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
          else TypeCheckResult.TypeCheckSuccess
        } catch {
          case e: IllegalArgumentException =>
            TypeCheckResult.TypeCheckFailure(e.getMessage)
        }
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_neighbors requires struct<score: double, id: bigint>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      if (!row.isNullAt(0) && !row.isNullAt(1))
        buf.insert(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData((0 until buf.size).map { i =>
      InternalRow(buf.ids(i), buf.scores(i))
    }.toArray[Any])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      buf.scores(i) = bb.getDouble(); buf.ids(i) = bb.getLong(); i += 1
    }
    buf.size = n
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKNeighbors =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}
