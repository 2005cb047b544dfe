package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.catalog.TableMeta
import graft.table.GraftTable
import graft.tools.SecondaryIndex

/**
 * Secondary-index QUERY REWRITE — the transparent serving half of
 * [[graft.tools.SecondaryIndex]]: an equality/IN point predicate on an
 * indexed NON-key column is answered through the index (probe prunes
 * whole index hash buckets, the matched keys read the base through its
 * OWN PK layout) instead of a full scan with predicate evaluation. The
 * reference engine can only full-scan a non-key predicate; at 100 TB the
 * difference is two point reads versus a corpus scan for every lookup a
 * dashboard or entity-resolution job issues.
 *
 * Spark-first shape: a `Rule[LogicalPlan]` in
 * `spark.experimental.extraOptimizations`, firing on `Filter` nodes whose
 * child is a bare CURRENT-version scan of a registered index's source
 * ([[ScanRoots]] — time travel and stale V2 handles never match). The
 * rewrite is strictly conservative:
 *
 *   - the WHOLE filter condition must be one `col = lit`, `col IN
 *     (lits)`, or the optimizer's `InSet` form of it, on the indexed
 *     column, null-free (such predicates never match null rows, and the
 *     index never holds them — semantics align by construction);
 *   - the index must be CURRENT: its source-version watermark equals the
 *     base's current committed version at plan time (a stale index never
 *     serves; the scheduler's refresh ticks keep the hit rate high). The
 *     base MAY carry deltas — the lookup's base read folds merge-on-read
 *     state itself, so index-served and scan-served rows agree on any
 *     refreshed-to-head table;
 *   - the probe is bounded: past `graft.sindex.rewriteMaxKeys` (default
 *     4096) matched keys the lookup contract throws and the rewrite
 *     declines — a scan-sized predicate keeps the scan plan.
 *
 * Like Spark's own dynamic partition pruning, the rewrite runs the
 * bounded index probe AT PLAN TIME (a driver-side job); the spliced plan
 * then reads only the matched keys' base tablets. Output attribute ids
 * are preserved through aliases, so parent operators resolve untouched.
 * Arming follows the rollup rewrite: `SecondaryIndex.build` arms the
 * building session, a catalog open re-arms every index persisted under
 * its warehouse, and loading an index re-arms it (opt out with
 * `graft.sindex.autoRewrite` set to anything but "true").
 */
object IndexRewrite extends Rule[LogicalPlan] {

  // indexLoc -> (srcLoc, colName) per session (weak: sessions die with
  // their tests); values are tiny and self-clean like RollupRewrite's
  private val registry =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, (String, String)]]()

  // the spliced lookup optimizes its own queries through this same rule —
  // never rewrite while a rewrite's probe is in flight on this thread
  private val busy = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = java.lang.Boolean.FALSE
  }

  private[plans] def autoRewriteEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption("graft.sindex.autoRewrite")
      .forall(_.equalsIgnoreCase("true"))

  private def rewriteMaxKeys(spark: SparkSession): Int =
    spark.conf.getOption("graft.sindex.rewriteMaxKeys")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(4096)

  private[plans] def isArmed(spark: SparkSession, indexLoc: String): Boolean =
    registry.synchronized(Option(registry.get(spark)))
      .exists(_.containsKey(indexLoc))

  /** Register `index` for rewrite in `spark` and inject the rule (once). */
  def enable(spark: SparkSession, index: GraftTable): Unit = {
    val p = index.properties
    val srcLoc = p.getOrElse(SecondaryIndex.SrcLocKey,
      throw new IllegalArgumentException(
        s"${index.location} is not a secondary index"))
    val colName = p(SecondaryIndex.ColKey).toLowerCase
    registry.synchronized {
      registry.computeIfAbsent(spark,
        _ => new ConcurrentHashMap[String, (String, String)]())
        .put(index.location, (srcLoc, colName))
      // inside the lock: the read-append-write on extraOptimizations must
      // not race another enable (a lost append would silently disarm)
      if (!spark.experimental.extraOptimizations.contains(this))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ this
    }
  }

  /** Drop `index` from the rewrite registry. */
  def disable(spark: SparkSession, indexLoc: String): Unit =
    registry.synchronized {
      Option(registry.get(spark)).foreach(_.remove(indexLoc))
    }

  /** Arm `t` for rewrite IF it is a persisted secondary index and the
    * session's ambient gate is on; idempotent. */
  def autoArm(spark: SparkSession, t: GraftTable): Boolean = {
    if (isArmed(spark, t.location)) return true
    if (!autoRewriteEnabled(spark)) return false
    if (!t.properties.contains(SecondaryIndex.SrcLocKey)) return false
    enable(spark, t)
    true
  }

  private def indexesFor(spark: SparkSession): Map[String, (String, String)] = {
    val m = registry.synchronized(Option(registry.get(spark)))
      .getOrElse(return Map.empty)
    import scala.jdk.CollectionConverters._
    // self-clean: dropped indexes or dropped bases leave the registry
    m.asScala.toMap.filter { case (loc, (src, _)) =>
      val ok = TableMeta.exists(loc) && TableMeta.exists(src)
      if (!ok) m.remove(loc)
      ok
    }
  }

  /** The servable point predicate inside `cond`'s conjunction, plus the
    * RESIDUAL conjuncts: the first conjunct that is an equality / IN /
    * InSet over a single attribute, literal-only, null-free, type-exact,
    * becomes the probe; everything else (the optimizer's redundant
    * `isnotnull`, extra range predicates, other columns) re-applies as a
    * filter ABOVE the spliced plan — exact, because `Filter(A ∧ R)` ≡
    * `Filter(R, Filter(A))` for deterministic `R`. A condition with no
    * servable conjunct, or any non-deterministic conjunct, keeps the
    * scan. */
  private def pointPredicate(cond: Expression)
      : Option[(AttributeReference, Seq[Any], Seq[Expression])] = {
    def ext(a: AttributeReference, internal: Seq[Any]): Option[(AttributeReference, Seq[Any])] = {
      if (internal.isEmpty || internal.exists(_ == null)) return None
      val conv = CatalystTypeConverters.createToScalaConverter(a.dataType)
      Some((a, internal.map(conv)))
    }
    def one(e: Expression): Option[(AttributeReference, Seq[Any])] = e match {
      case EqualTo(a: AttributeReference, l: Literal)
          if l.dataType == a.dataType => ext(a, Seq(l.value))
      case EqualTo(l: Literal, a: AttributeReference)
          if l.dataType == a.dataType => ext(a, Seq(l.value))
      case In(a: AttributeReference, vs)
          if vs.nonEmpty && vs.forall {
            case l: Literal => l.dataType == a.dataType
            case _ => false
          } => ext(a, vs.map(_.asInstanceOf[Literal].value))
      case InSet(a: AttributeReference, hset) => ext(a, hset.toSeq)
      // a disjunction of point predicates over ONE attribute is an IN —
      // vanilla Catalyst has no a='x' OR a='y' → IN rule, so users who
      // write the OR form would otherwise never serve
      case o: Or =>
        def flat(x: Expression): Option[Seq[(AttributeReference, Any)]] = x match {
          case Or(l, r) => for { a <- flat(l); b <- flat(r) } yield a ++ b
          case other => one(other).map { case (a, vs) => vs.map(a -> _) }
        }
        flat(o).filter(_.map(_._1.exprId).distinct.size == 1)
          .map(ps => (ps.head._1, ps.map(_._2)))
      case _ => None
    }
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other => Seq(other)
    }
    val conjuncts = split(cond)
    if (conjuncts.exists(!_.deterministic)) return None
    conjuncts.iterator.zipWithIndex
      .map { case (c, i) => one(c).map((_, i)) }
      .collectFirst { case Some(((a, vs), i)) =>
        (a, vs, conjuncts.patch(i, Nil, 1))
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (busy.get()) return plan
    val spark = SparkSession.active
    val indexes = indexesFor(spark)
    if (indexes.isEmpty) return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        // guard order matters for PLANNING cost: the predicate match and
        // the index-column name check are pure in-memory tests, while
        // baseLocation stats the filesystem (manifest read for file
        // scans) — a session with one armed index must not pay that on
        // every unrelated Filter in every query it plans
        (for {
          (attr, values, residual) <- pointPredicate(cond)
          byCol = indexes.filter { case (_, (_, col)) =>
            col == attr.name.toLowerCase }
          if byCol.nonEmpty
          baseLoc <- ScanRoots.baseLocation(ScanRoots.stripProjects(child))
          (indexLoc, _) <- byCol.find { case (_, (src, _)) => src == baseLoc }
          rewritten <- tryRewrite(spark, f, indexLoc, baseLoc, values, residual)
        } yield rewritten).getOrElse(f)
    }
  }

  private def tryRewrite(spark: SparkSession, f: Filter, indexLoc: String,
      baseLoc: String, values: Seq[Any],
      residual: Seq[Expression]): Option[LogicalPlan] = {
    busy.set(true)
    try {
      val idx = GraftTable.load(spark, indexLoc)
      // freshness: the index watermark must sit at the base's current
      // version — a stale index never serves (refresh-or-miss)
      if (idx.properties(SecondaryIndex.SrcVersionKey).toLong !=
          TableMeta.currentVersion(baseLoc)) return None
      // bounded plan-time probe (DPP posture); a scan-sized predicate
      // throws the lookup contract and the rewrite declines
      val looked = SecondaryIndex.lookup(spark, idx, values,
        maxKeys = rewriteMaxKeys(spark))
      val lp = looked.queryExecution.optimizedPlan
      val byName = lp.output.map(a => a.name.toLowerCase -> a).toMap
      val mapped = f.output.map { a =>
        byName.get(a.name.toLowerCase).filter(_.dataType == a.dataType)
          .map(r => Alias(r, a.name)(exprId = a.exprId))
      }
      if (mapped.exists(_.isEmpty)) return None
      // the Project restores the ORIGINAL attribute ids, so the residual
      // conjuncts re-apply above it unchanged (they reference f's attrs)
      val projected = Project(mapped.map(_.get), lp)
      Some(residual.reduceOption(And).map(Filter(_, projected))
        .getOrElse(projected))
    } catch {
      case _: Exception => None // a sick index never blocks the query
    } finally busy.set(false)
  }
}
