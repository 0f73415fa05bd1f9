package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Mechanics of the batched-inference shape (the oracle gate covers the
  * decode/frame/resize faces; this pins the batching contract). */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("batched inference: every row scored once, batches bounded, scores partition-invariant") {
    val B = 32
    val media = Multimodal.blobs(spark, sf)
    val out = Multimodal.batchedInfer(media, B).collect()
    assert(out.length == media.count())
    assert(out.map(_.doc_id).distinct.length == out.length)
    assert(out.forall(r => r.batch_n >= 1 && r.batch_n <= B))
    // full batches dominate; only partition tails run short
    val parts = media.rdd.getNumPartitions
    assert(out.count(_.batch_n < B) <= parts.toLong * (B - 1))

    // scores are pure per-doc functions: any repartitioning agrees
    val again = Multimodal.batchedInfer(
        media.repartition(7), B)
      .collect().map(r => r.doc_id -> r.score).toMap
    assert(out.forall(r => again(r.doc_id) == r.score))
  }

  test("audio chunks tile each payload with overlap and one flagged tail") {
    val sf = "/root/testdata/sf0.01"
    val (l, s) = (Multimodal.ChunkLen, Multimodal.ChunkStride)
    val byDoc = Multimodal.audioChunks(spark, sf).collect()
      .groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    val sizes = Multimodal.blobs(spark, sf).collect()
      .filter(_.kind == "audio").map(b => b.doc_id -> b.payload.length).toMap
    assert(byDoc.keySet == sizes.keySet, "every audio doc chunked")
    byDoc.foreach { case (id, cs) =>
      val n = sizes(id).toLong
      val ordered = cs.sortBy(_.getAs[Long]("chunk_idx"))
      // full coverage: first starts at 0, last ends at n, consecutive
      // chunks overlap by len - stride
      assert(ordered.head.getAs[Long]("chunk_start") == 0L)
      assert(ordered.last.getAs[Long]("chunk_end") == n, s"doc $id tail")
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("chunk_start") ==
            a.getAs[Long]("chunk_start") + s, s"doc $id stride")
          assert(a.getAs[Long]("chunk_end") > b.getAs[Long]("chunk_start"),
            s"doc $id: chunks must overlap")
        case _ =>
      }
      // every non-tail chunk is full-length; the tail may be partial
      ordered.init.foreach(c =>
        assert(c.getAs[Long]("chunk_end") - c.getAs[Long]("chunk_start") == l
          || c.getAs[Boolean]("is_partial")))
    }
  }
}
