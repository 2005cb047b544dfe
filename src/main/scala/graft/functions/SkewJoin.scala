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
   * The default salt hashes all left columns — a PURE function of row
   * content, so a map task recomputed after a shuffle-fetch failure
   * re-derives the identical salt and no consumer ever sees a row move
   * between salt groups (the retry-nondeterminism hazard of positional
   * ids). The trade-off: byte-identical duplicated hot-key rows all hash
   * to ONE salt group.
   *
   * `rowIndexTiebreaker = true` opts into mixing a per-partition row index
   * (monotonically_increasing_id) into the hash so even mass-duplicated
   * IDENTICAL rows spread. The index is positional, NOT content-derived:
   * it is only retry-stable when the left input is order-stable (a file
   * scan, a localCheckpoint'd frame). When the left side is the output of
   * a shuffle, a recomputed map task can re-index rows differently than
   * consumers already fetched — duplicating or dropping join rows — so the
   * caller must `localCheckpoint()` such inputs before opting in.
   *
   * `saltOn` overrides the derivation with an explicit expression (e.g. a
   * known-uniform column) — pass it when the left row set is narrow enough
   * that hashing every column is measurable at scale.
   */
  def saltedEquiJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      salts: Int, joinType: String = "inner",
      saltOn: Option[org.apache.spark.sql.Column] = None,
      rowIndexTiebreaker: Boolean = false): DataFrame = {
    require(salts > 0, "salts must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Seq("inner", "left", "leftouter", "leftsemi", "leftanti").contains(jt),
      s"unsupported join type for salted join: $joinType " +
        "(right-preserving types would duplicate unmatched right rows per salt)")
    val l = left.withColumn(SaltCol,
      saltExpr(left, salts, saltOn, rowIndexTiebreaker))
    val r = right.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** The left-side salt derivation (exposed for spread tests). */
  private[graft] def saltExpr(left: DataFrame, salts: Int,
      saltOn: Option[org.apache.spark.sql.Column] = None,
      rowIndexTiebreaker: Boolean = false): org.apache.spark.sql.Column = {
    val cols = left.columns.map(col) ++
      (if (rowIndexTiebreaker) Seq(monotonically_increasing_id()) else Nil)
    saltOn.map(c => pmod(hash(c), lit(salts)))
      .getOrElse(pmod(hash(cols.toIndexedSeq: _*), lit(salts)))
  }
}
