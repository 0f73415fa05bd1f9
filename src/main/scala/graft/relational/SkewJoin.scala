package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed key distributions (SURVEY §4: the stop_id
  * distribution skews toward hub stops; at 100 TB a hot key can pin one
  * reducer long after the rest of the stage finishes).
  *
  * AQE's skew-join split handles most cases at runtime and should stay the
  * first line of defense; explicit salting remains necessary when the
  * skewed side feeds an aggregation-after-join (AQE can't split a
  * partition that a downstream hash aggregate needs co-located) or when
  * the join is keyed by a column AQE statistics under-estimate.
  *
  * Mechanics: the skewed side gets a deterministic per-row salt
  * (xxhash64 of all columns mod `salts` — deterministic so task retries
  * and speculative attempts agree); the small side is replicated `salts`
  * times via explode. The join key becomes (key, salt), spreading each hot
  * key over `salts` reducers. Replication multiplies the small side, so
  * this is for dim-sized right sides only.
  */
object SkewJoin {

  def saltedInner(skewed: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    val saltedBig = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
