package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a mergeable typed aggregate.
  *
  * Why a sketch and not `GROUP BY word ORDER BY count DESC LIMIT n`: the
  * exact plan shuffles one row per DISTINCT key — at 100 TB of tokenized
  * text that is a vocabulary-sized shuffle (billions of keys) to answer a
  * top-10 question. This aggregate keeps at most `k` counters per
  * partition, merges k-sized maps on the single final reducer, and ships
  * `O(k)` bytes total. Classic guarantees (Misra–Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012):
  *
  *   - each reported count is a lower bound, under-counting by at most
  *     N/(k+1) (N = stream length), regardless of merge order/partitioning;
  *   - any item with true frequency > N/(k+1) is guaranteed present;
  *   - if the number of distinct items never exceeds `k` in any partial,
  *     no decrement ever fires and every count is EXACT — the property the
  *     oracle gate relies on (fixture vocabulary ≪ k).
  *
  * update: hit → +1; miss with room → insert 1; miss when full → decrement
  * all by 1, drop zeros (the amortized MG step). merge: sum counters, then
  * if over `k` subtract the (k+1)-th largest count from all and drop ≤0 —
  * associative and commutative up to the error bound, so task retries and
  * partition counts cannot change the exact-regime output.
  *
  * eval returns the top `topN` surviving entries as
  * array<struct<word,n>> ordered by (n desc, word asc) — a total order, so
  * the output is deterministic whenever the exact regime holds.
  */
case class TopKSketchAgg(
    child: Expression,
    k: Int,
    topN: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k > 0 && topN > 0 && topN <= k)

  override def prettyName: String = "graft_topk_words"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("word", StringType, nullable = false),
      StructField("n", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(b: mutable.HashMap[String, Long], input: InternalRow):
      mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val w = v.asInstanceOf[UTF8String].toString
      b.get(w) match {
        case Some(c) => b(w) = c + 1L
        case None if b.size < k => b(w) = 1L
        case None => // full: the MG decrement-all step (≤ k work, amortized O(1))
          val ks = b.keys.toArray
          var i = 0
          while (i < ks.length) {
            val c = b(ks(i))
            if (c <= 1L) b.remove(ks(i)) else b(ks(i)) = c - 1L
            i += 1
          }
      }
    }
    b
  }

  override def merge(b: mutable.HashMap[String, Long],
      in: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    for ((w, c) <- in) b(w) = b.getOrElse(w, 0L) + c
    if (b.size > k) {
      // subtract the (k+1)-th largest count; > k survivors is impossible
      val thr = b.values.toArray.sorted(Ordering[Long].reverse)(k)
      val ks = b.keys.toArray
      var i = 0
      while (i < ks.length) {
        val c = b(ks(i)) - thr
        if (c <= 0L) b.remove(ks(i)) else b(ks(i)) = c
        i += 1
      }
    }
    b
  }

  override def eval(b: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(b.toSeq.sortBy { case (w, c) => (-c, w) }.take(topN)
      .map { case (w, c) => InternalRow(UTF8String.fromString(w), c) }.toArray)

  // length-prefixed UTF-8, NOT writeUTF: writeUTF throws
  // UTFDataFormatException past 64 KB of modified-UTF-8, and one unbroken
  // non-whitespace run in a corpus document (minified JSON, base64) is one
  // token — the sketch must serialize it for shuffle, not kill the job.
  // A leading format-version byte (ADVICE r13): TypedImperativeAggregate
  // buffers are checkpointed by streaming state stores, so if a streaming
  // face using this agg ever gains durable checkpoints, a later format
  // change must be detectable instead of read as garbage lengths. Added
  // NOW, while no checkpoint persists this format, so version 1 is the
  // first format any durable state can contain.
  private val FormatVersion: Byte = 1
  override def serialize(b: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeByte(FormatVersion)
    out.writeInt(b.size)
    for ((w, c) <- b) {
      val wb = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(wb.length)
      out.write(wb)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val v = in.readByte()
    require(v == FormatVersion,
      s"TopKSketchAgg buffer format $v, expected $FormatVersion — a " +
        "checkpoint from an incompatible build; rebuild state from source")
    val n = in.readInt()
    val b = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val wb = new Array[Byte](in.readInt())
      in.readFully(wb)
      b(new String(wb, java.nio.charset.StandardCharsets.UTF_8)) = in.readLong()
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKSketchAgg =
    copy(child = newChild)
}
