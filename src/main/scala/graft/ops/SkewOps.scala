package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utility: salted equi-join.
  *
  * When a join key is heavily skewed (one key holds a large fraction of the
  * build side), a plain shuffle join sends the hot key's rows to ONE
  * reducer. Salting splits each hot key into `saltFactor` sub-keys: the
  * probe side gets a deterministic salt from a secondary column's hash, the
  * build side is replicated once per salt value, and the join runs on
  * (key, salt) — spreading the hot key over `saltFactor` reducers.
  *
  * Results are exactly the plain join's rows. AQE's skew-join handles many
  * cases automatically; explicit salting remains the tool when AQE can't
  * split (e.g. a single monster key inside one unsplittable partition).
  */
object SkewOps {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, saltSource: Column): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
