package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** KLL quantile sketch aggregate over a DOUBLE column (datasketches-java,
  * bundled with Spark) — the mergeable-quantiles leg of the sketch family
  * (HLL = distinct, theta = set algebra, Misra–Gries = heavy hitters,
  * KLL = ranks/quantiles).
  *
  * Why a sketch and not percentile(): exact percentiles need the whole
  * group's values in one place — at 100 TB that is a full shuffle of the
  * measure column per group. KLL partials are O(k·log n) bytes, merge
  * associatively in any order, and can be aggregated per shard (file, day,
  * region) and re-merged later, which is exactly how fleet-wide latency /
  * size dashboards are actually built.
  *
  * Determinism caveat (why the registered face gates on RANKS, not bytes):
  * unlike theta/HLL, KLL compaction flips a coin choosing the odd or even
  * survivors of a level, so the serialized sketch and the exact estimate
  * are NOT bit-stable across runs. The guarantee that IS stable is the
  * rank error bound: at k=200 the 99%-confidence normalized rank error is
  * ~1.65% (σ ≈ 0.6%). The registered query therefore emits exact order
  * statistics (engine-comparable) plus a boolean gate that the estimate's
  * exact rank lands within ±4% of target — ≈ 6–7σ of headroom, so the
  * boolean is stable for any coin-flip outcome that the sketch's proven
  * error bound permits. */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535)

  override def prettyName: String = "graft_kll_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Double])
    b
  }

  override def merge(b: KllDoublesSketch, in: KllDoublesSketch): KllDoublesSketch = {
    b.merge(in)
    b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Union of serialized KLL sketches — the re-merge leg: per-shard partials
  * aggregated independently are combined per group without touching the
  * raw measure column again. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  // same driver-side guard as KllSketchAgg: an invalid k must fail at
  // plan construction, not as a SketchesArgumentException inside a task
  require(k >= 8 && k <= 65535)

  override def prettyName: String = "graft_kll_merge"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(b: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      b.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    b
  }

  override def merge(b: KllDoublesSketch, in: KllDoublesSketch): KllDoublesSketch = {
    b.merge(in)
    b
  }

  override def eval(b: KllDoublesSketch): Any = b.toByteArray

  override def serialize(b: KllDoublesSketch): Array[Byte] = b.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** Quantile estimate at normalized rank `p` from a serialized KLL sketch
  * (INCLUSIVE search criteria — the value whose inclusive rank first
  * reaches p, matching the ceil(p·n) order statistic on exact data). */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_quantile"

  override protected def nullSafeEval(sk: Any, p: Any): Any =
    KllOps.quantile(sk.asInstanceOf[Array[Byte]], p.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, p) =>
      s"${ev.value} = graft.functions.KllOps.quantile($sk, $p);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}

/** Shared by interpreted eval and generated code. */
object KllOps {
  def quantile(bytes: Array[Byte], p: Double): Double = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
  }
}
