package graft.operators.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew management for fact-fact equi-joins.
  *
  * AQE's skew-join handles most runtime skew (enabled in GraftSession);
  * salting is the explicit fallback when one key dominates so heavily that
  * even split partitions won't fit — the classic 100 TB hot-key pattern.
  */
object SkewTools {

  /** Salted inner equi-join: the large/skewed side gets a deterministic
    * salt in [0, saltFactor) hashed from `saltSourceCol` (any
    * high-cardinality column, e.g. its row key); the smaller side is
    * replicated saltFactor times. Result equals a plain inner join on
    * `key`, but each hot key's rows spread over saltFactor partitions.
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int,
      saltSourceCol: String): DataFrame = {
    require(saltFactor > 0)
    val salted = large.withColumn("__salt", pmod(xxhash64(col(saltSourceCol)), lit(saltFactor)).cast("int"))
    val replicated = small.withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
