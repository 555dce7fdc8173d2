package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split (on by default) handles sort-merge skew at
  * runtime; explicit salting is the fallback when one key's rows exceed
  * what a single task can hold even after AQE splits — the classic
  * hot-row problem of a 100 TB fact table joining a dimension where 30%
  * of rows share one key.
  */
object Skew {

  /** Salted equi-join: scatter the (large, skewed) left side across
    * `salts` sub-keys with a uniform deterministic-per-run salt, replicate
    * the (small) right side into every sub-key, join on (key, salt). The
    * hot key's rows land in `salts` different tasks instead of one.
    * Result is exactly the plain inner equi-join (the salt is internal). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame =
    saltedJoinOn(left, right, Seq(key), salts)

  /** [[saltedJoin]] generalized to a MULTI-column equi-join key, with an
    * optional `merge` hint pinning the sort-merge plan (the shape a
    * fact×fact join gets when neither side broadcasts — at test SF the
    * optimizer would otherwise broadcast the smaller side and mask the
    * skew the salt exists to spread). */
  def saltedJoinOn(left: DataFrame, right: DataFrame, keys: Seq[String],
                   salts: Int, merge: Boolean = false): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    require(keys.nonEmpty, "need at least one join key")
    // collision-proof internal column name — a fixed "_salt" would
    // silently clobber a business column of that name
    val taken = (left.columns ++ right.columns).toSet
    val saltCol = Iterator.from(0).map(i => s"_salt$i").filterNot(taken).next()
    val l = left.withColumn(saltCol,
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong))
        .cast("int"))
    val r0 = right.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    val r = if (merge) r0.hint("merge") else r0
    l.join(r, keys :+ saltCol).drop(saltCol)
  }
}
