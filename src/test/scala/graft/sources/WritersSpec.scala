package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class WritersSpec extends AnyFunSuite with SparkSpec {

  test("result CSV and parquet snapshots round-trip") {
    import spark.implicits._
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "k", "v")
    val dir = Files.createTempDirectory("graft-writers").toString

    Writers.resultCsv(df, s"$dir/csv")
    val csvBack = spark.read.option("header", "true").csv(s"$dir/csv")
    assert(csvBack.count() == 2 && csvBack.columns.toSeq == Seq("id", "k", "v"))

    Writers.snapshotParquet(df, s"$dir/pq", partitionBy = Seq("k"))
    val pqBack = spark.read.parquet(s"$dir/pq")
    assert(pqBack.count() == 2)
    assert(pqBack.select("k").distinct().count() == 2)

    // overwrite semantics (the reference's destructive reset, SURVEY §7.4-8)
    Writers.snapshotParquet(df.filter($"id" === 1L), s"$dir/pq")
    assert(spark.read.parquet(s"$dir/pq").count() == 1)
  }
}
