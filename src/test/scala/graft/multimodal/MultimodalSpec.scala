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
}
