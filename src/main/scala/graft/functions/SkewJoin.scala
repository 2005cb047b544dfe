package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted equi-join — the pre-shuffle mitigation for HOT-KEY skew. AQE's
 * skew-join handles a hot PARTITION by splitting it into sub-reads, but all
 * rows of one key still land in one sort-merge group; when a single key
 * carries a third of the fact table (one host in a web corpus, one null-ish
 * sentinel id), the only fix is to make the key itself finer: left rows
 * get a deterministic salt in [0, salts), the right side is replicated once
 * per salt value, and the join key becomes (key, salt) — the hot key's rows
 * now spread over `salts` shuffle groups.
 *
 * Cost model: the right side is multiplied by `salts`, so this is for
 * fact-dimension joins (small right side) — exactly the shape where a hot
 * key hurts most. Supported join types: inner / left_outer / left_semi /
 * left_anti (right-preserving types would duplicate unmatched right rows
 * once per salt).
 */
object SkewJoin {

  private val SaltCol = "_graft_salt"

  /**
   * Join `left` and `right` on `keys`, salting the left side `salts` ways.
   * The salt is derived from a hash of ALL left columns — deterministic
   * under task retries (no rand()); fully identical left rows share a salt,
   * which only affects spread, never correctness.
   */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Seq("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"unsupported join type for salted join: $joinType " +
        "(right-preserving types would duplicate unmatched right rows per salt)")
    val l = left.withColumn(SaltCol,
      pmod(hash(left.columns.map(col): _*), lit(salts)))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
