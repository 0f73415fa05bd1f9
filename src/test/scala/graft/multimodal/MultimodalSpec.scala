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

  test("cdc chunking: boundaries follow content — a front insertion shifts only the head") {
    import spark.implicits._
    // a real corpus payload (word-salad text chunks at ~CdcDivisor bytes;
    // synthetic linear byte sequences can dodge the mod-32 boundary test)
    import org.apache.spark.sql.functions._
    val txt = graft.sources.Tables.documents(spark, sf)
      .orderBy(length(col("text")).desc, col("doc_id")).select("text")
      .head().getString(0)
    val base = (txt * 5).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val inserted = Array.fill[Byte](7)(88) ++ base
    def chunksOf(id: Long, p: Array[Byte]) =
      Multimodal.cdcChunks(Seq(Multimodal.MediaBlob(id, "image", p)).toDS())
        .collect().sortBy(_.doc_id).map(c => (c.chunk_hash, c.chunk_len))
    val a = chunksOf(1, base)
    val b = chunksOf(2, inserted)
    assert(a.length >= 20, s"fixture payload should produce many chunks (${a.length})")
    // total chunk length covers the payload exactly, both ways
    assert(a.map(_._2).sum == base.length && b.map(_._2).sum == inserted.length)
    // content-defined boundaries re-synchronize after the insertion: the
    // chunk sequences share all but the head few chunks as a common
    // SUFFIX (fixed-stride chunking would shift every chunk and share
    // nothing)
    val suffix = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(suffix >= a.length - 3,
      s"common suffix $suffix of ${a.length} after a 7-byte front insert")
    // corpus census: real cross-payload reuse exists on the fixture
    val top = Multimodal.cdcChunkReuse(spark, sf).collect()
    assert(top.head.getAs[Long]("n_copies") > 1, "top chunk should be shared")
    assert(top.forall(r => r.getAs[Long]("n_docs") <= r.getAs[Long]("n_copies")))
  }

  test("payload near-dup equals brute-force Jaccard over hub-capped chunk sets") {
    val small = "/root/testdata/sf0.001"
    val chunks = Multimodal.cdcChunks(Multimodal.blobs(spark, small)).collect()
      .map(c => (c.doc_id, (c.chunk_hash, c.chunk_len))).distinct
    val hubOk = chunks.groupBy(_._2)
      .filter { case (_, rows) => rows.map(_._1).distinct.length <= Multimodal.NearDupHubCap }
      .keySet
    val docSets: Map[Long, Set[(Long, Int)]] = chunks.filter(c => hubOk(c._2))
      .groupBy(_._1).map { case (id, rows) => id -> rows.map(_._2).toSet }
    val ids = docSets.keys.toSeq.sorted
    val brute = (for {
      i <- ids; j <- ids if i < j
      sh = (docSets(i) & docSets(j)).size if sh > 0
      jac = 1000L * sh / (docSets(i).size + docSets(j).size - sh)
      if jac >= Multimodal.NearDupMinJaccardMilli
    } yield (i, j, sh.toLong, docSets(i).size.toLong, docSets(j).size.toLong, jac))
      .sortBy(t => (-t._6, t._1, t._2)).take(20)
    val got = Multimodal.payloadNearDup(spark, small).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == brute)
    assert(got.nonEmpty, "fixture corpus should contain near-dup payloads")
  }
}
