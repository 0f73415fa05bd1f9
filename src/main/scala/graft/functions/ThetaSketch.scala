package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Theta sketch aggregate over a BIGINT key column (datasketches-java,
  * bundled with Spark).
  *
  * Why theta and not HLL: HLL registers only merge by max — you can UNION
  * HLL sketches but never intersect them. Theta sketches retain an actual
  * sample of key hashes below the θ threshold, so they support the full
  * set algebra (union / intersection / difference). That makes an all-pairs
  * overlap matrix over S sources an S-sketch problem — each source reduced
  * once to a fixed-size sketch, every pairwise intersection computed on
  * sketches — instead of S² distinct-join shuffles over the raw corpus.
  *
  * Exactness regime (what the oracle gate relies on): while a sketch
  * retains fewer than 2^lgK entries it keeps EVERY distinct hash (θ=1),
  * so estimates — including intersections of such sketches — are exact.
  * Beyond that it subsamples: relative standard error ≈ 1/√(2^lgK)
  * (~0.8% at lgK=14). Buffers are Union operators (mergeable by
  * construction, order-independent); eval emits the ordered compact
  * sketch's canonical bytes, so output is deterministic for a given input
  * SET regardless of partitioning.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  require(lgK >= 4 && lgK <= 26)

  override def prettyName: String = "graft_theta_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(b: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) b.update(v.asInstanceOf[Long])
    b
  }

  override def merge(b: Union, in: Union): Union = {
    b.union(in.getResult())
    b
  }

  override def eval(b: Union): Any = b.getResult().toByteArray

  override def serialize(b: Union): Array[Byte] = b.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaOps.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** |A ∩ B| estimate from two serialized theta sketches — the set algebra
  * HLL cannot do. Exact while both sketches are in their exact regime. */
case class ThetaIntersectExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_intersect"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaOps.intersectEstimate(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ThetaOps.intersectEstimate($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectExpr =
    copy(left = newLeft, right = newRight)
}

/** Shared by interpreted eval and generated code. */
object ThetaOps {
  def heapify(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val in = SetOperation.builder().buildIntersection()
    in.intersect(heapify(a))
    in.intersect(heapify(b))
    in.getResult().getEstimate()
  }

  def estimate(bytes: Array[Byte]): Double = heapify(bytes).getEstimate()
}
