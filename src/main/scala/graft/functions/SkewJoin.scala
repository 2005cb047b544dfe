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
   * The salt hashes all left columns PLUS a per-partition row index
   * (monotonically_increasing_id), so even mass-duplicated IDENTICAL
   * hot-key rows spread across salt groups — the pathological input a
   * pure column hash lands in one bucket. Any salt assignment is correct
   * (the right side carries every salt value), so the row index being
   * layout-dependent affects spread only, never results; within one
   * execution it is stable under task retries (a retried task re-derives
   * the same ids from the same input split).
   *
   * `saltOn` overrides the derivation with an explicit expression (e.g. a
   * known-uniform column) — pass it when the left row set is narrow enough
   * that hashing every column is measurable at scale.
   */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltOn: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Seq("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"unsupported join type for salted join: $joinType " +
        "(right-preserving types would duplicate unmatched right rows per salt)")
    val l = left.withColumn(SaltCol, saltExpr(left, salts, saltOn))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** The left-side salt derivation (exposed for spread tests). */
  private[graft] def saltExpr(left: DataFrame, salts: Int,
      saltOn: Option[org.apache.spark.sql.Column] = None): org.apache.spark.sql.Column =
    saltOn.map(c => pmod(hash(c), lit(salts))).getOrElse(
      pmod(hash(left.columns.map(col) :+ monotonically_increasing_id(): _*), lit(salts)))
}
