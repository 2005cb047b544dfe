package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Scale-shape guards for the round-9 pipeline operators: the plans that
 * pass correctness at 60k rows must also be the plans that survive 100x.
 */
class PipelineScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("p17 shard packing: partitioned window only, no RDD round-trip") {
    val df = SparkEntry.queries("p17_pack_shards")(spark, dir)
    val rows = df.collect()
    // shards are contiguous, 0-based, and each stays within budget + one
    // doc's overshoot (a doc never splits)
    val shards = rows.map(_.getLong(0))
    assert(shards.head == 0L && shards.toSeq == shards.sorted.toSeq)
    assert(shards.zip(shards.tail).forall { case (a, b) => b - a <= 1 })
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD round-trip in plan:\n$plan")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("_bk#")),
      s"running sum not bucket-partitioned:\n${winLines.mkString("\n")}")
  }

  test("p27 sequence packing: bucket-partitioned cumsum, exact full sequences") {
    val df = SparkEntry.queries("p27_seq_pack")(spark, dir)
    val rows = df.collect()
    // sequences are contiguous from 0 and every one except the last holds
    // EXACTLY 2048 tokens (concat-then-chunk never under-fills)
    val seqs = rows.map(_.getLong(0))
    assert(seqs.head == 0L && seqs.toSeq == seqs.sorted.toSeq)
    assert(seqs.zip(seqs.tail).forall { case (a, b) => b == a + 1 },
      "sequence ids must be dense")
    rows.dropRight(1).foreach(r =>
      assert(r.getLong(2) == 2048L, s"under-filled sequence: $r"))
    assert(rows.last.getLong(2) <= 2048L)
    // token conservation: the packed total equals the corpus total
    import org.apache.spark.sql.functions._
    val total = Pipeline.queries("p10_token_count")(spark, dir)
      .agg(sum("est_bpe_tokens")).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == total)
    // the running count is bucket-partitioned — no single-partition window
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD round-trip in plan:\n$plan")
    val winLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty)
    assert(winLines.forall(_.contains("_bk#")),
      s"running sum not bucket-partitioned:\n${winLines.mkString("\n")}")
  }

  test("p18 decontamination: benchmark side broadcasts, corpus never shuffles for the join") {
    val df = SparkEntry.queries("p18_decontaminate")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the gram join must not sort-merge the corpus:\n$plan")
  }

  test("p16 sampling filter reaches the scan side (no shuffle of unsampled rows)") {
    val df = SparkEntry.queries("p16_sample_mix")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the deterministic keep-predicate evaluates below the aggregation's
    // exchange: find the Filter on pmod under the scan, not above an
    // Exchange
    val lines = plan.linesIterator.toSeq
    val filterIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("pmod"))
    val exchangeIdx = lines.indexWhere(_.contains("Exchange"))
    assert(filterIdx >= 0, s"missing the pmod sampling filter:\n$plan")
    assert(exchangeIdx < 0 || filterIdx > exchangeIdx,
      s"sampling filter must sit below the aggregation exchange:\n$plan")
  }

  test("p20 PII scrub stays a pure map stage under the output sort") {
    val df = SparkEntry.queries("p20_pii_scrub")(spark, dir)
    df.collect()
    val whole = df.queryExecution.executedPlan.toString
    // AQE prints Final + Initial plans; inspect only the final one
    val plan = whole.split("== Initial Plan ==").head
    // only the final presentation orderBy may exchange; the scrub itself
    // must not shuffle or aggregate — at 100 TB it is a map-only pass
    val exchanges = plan.linesIterator.count(_.contains("Exchange "))
    assert(!plan.contains("HashAggregate"), s"scrub must not aggregate:\n$plan")
    assert(exchanges <= 1, s"scrub must shuffle at most for the output sort:\n$plan")
    assert(plan.contains("*(1)"), s"scrub must stay codegen'd:\n$plan")
  }

  test("q47 sessionization: one user shuffle serves windows AND aggregation") {
    val df = SparkEntry.queries("q47_sessionize")(spark, dir)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .split("== Initial Plan ==").head
    // the lag window, the cumsum window, and the per-(user, session)
    // aggregation must all ride the SAME hashpartitioning(user_id)
    // exchange (partitioning by a subset satisfies the agg's clustering);
    // only the presentation sort may add a second exchange
    val exchanges = plan.linesIterator.count(_.trim.matches("(\\+- )?\\*?\\s*Exchange.*"))
    assert(exchanges <= 2,
      s"sessionization must not re-shuffle between window and agg:\n$plan")
  }

  test("p23 span dedup: per-doc windows only, and the gram hash is injective here") {
    val df = SparkEntry.queries("p23_span_dedup")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the interval-union window must partition by doc_id — a global window
    // would serialize the whole hit set through one task at scale
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"missing the span-merge window:\n$plan")
    assert(winLines.forall(_.contains("doc_id#")),
      s"span-merge window not doc-partitioned:\n${winLines.mkString("\n")}")
    // cross-doc dup detection must partial-aggregate before its exchange
    // (min/max over doc_id combine map-side; a countDistinct pair shuffle
    // would move every (gram, doc) row)
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"dup-gram aggregate must be partial+final:\n$plan")
    // the engine shuffles xxhash64(gram), the oracle compares gram strings:
    // assert the hash is injective on the corpus the driver gates at
    import org.apache.spark.sql.functions.{countDistinct, explode, xxhash64, col}
    import graft.functions.TextFunctions.shinglesSeq
    val g = Tables.scan(spark, "/root/testdata/sf0.01", "documents")
      .select(explode(shinglesSeq(col("text"), 8)).as("gram"))
    val c = g.agg(countDistinct(col("gram")), countDistinct(xxhash64(col("gram")))).head()
    assert(c.getLong(0) == c.getLong(1),
      s"xxhash64 collided on the sf0.01 gram set: ${c.getLong(0)} grams vs ${c.getLong(1)} hashes")
  }

  test("p25 span scrub: narrow gram shuffle, rewrite is a map after one doc_id join") {
    val df = SparkEntry.queries("p25_span_scrub")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"unbounded cartesian in span scrub:\n$plan")
    // dup-gram detection partial-aggregates before its exchange, exactly
    // as p23 (the gram stream never shuffles (gram, doc) pairs whole)
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"dup-gram aggregate must be partial+final:\n$plan")
    // the per-doc hit lists are tiny; their join back to documents must be
    // an equi-join on doc_id, never a shuffle of rewritten text
    assert(plan.contains("doc_id#"), s"missing the doc_id equi-join:\n$plan")
    // rewrite semantics: removed + kept covers the doc, and scrubbing is
    // idempotent on docs with no hits (sha equals the re-joined original)
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.words
    val base = Tables.scan(spark, dir, "documents")
      .select(col("doc_id"), sha2(array_join(words(col("text")), " "), 256).as("orig_sha"))
    val joined = df.join(base, "doc_id")
    assert(joined.filter(col("n_removed") === 0 &&
      col("clean_sha") =!= col("orig_sha")).count() == 0,
      "untouched docs must hash to their original token stream")
    assert(joined.filter(col("n_removed") > 0 &&
      col("clean_sha") === col("orig_sha")).count() == 0,
      "scrubbed docs must differ from the original")
  }

  test("p24 semantic dedup: bounded centroid broadcast, equi-join candidates inside cells") {
    // sf0.01: at sf0.001 the drop-list is empty and AQE's empty-relation
    // propagation erases the joins this test asserts on
    val df = SparkEntry.queries("p24_semantic_dedup")(spark, "/root/testdata/sf0.01")
    df.collect()
    // drop-list sanity: a removed doc always keeps a SMALLER partner
    assert(df.filter(org.apache.spark.sql.functions.col("keeper_id") >=
      org.apache.spark.sql.functions.col("removed_id")).count() == 0,
      "keeper_id must be smaller than removed_id")
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"unbounded cartesian in semantic dedup:\n$plan")
    // the candidate self-join must be an EQUI join keyed by the cell (and
    // LSH bucket) — a within-cell theta/nested-loop join is quadratic in
    // cell size
    val equiJoinLines = plan.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")).toSeq
    assert(equiJoinLines.exists(l => l.contains("cell#") && l.contains("bk#")),
      s"candidate join must key on (cell, table, bucket):\n$plan")
  }

  test("p28 quality rules: token-frequency aggs combine map-side, pass is the conjunction") {
    val df = SparkEntry.queries("p28_quality_rules")(spark, dir)
    val rows = df.collect()
    // one row per document, and `pass` is exactly the AND of the rules
    val nDocs = Tables.scan(spark, dir, "documents").count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      val flags = (2 to 6).map(r.getBoolean)
      assert(r.getBoolean(7) == flags.forall(identity),
        s"pass must be the conjunction of the rules: $r")
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"cartesian in quality gate:\n$plan")
    // (doc_id, word) counting and the per-doc rollup both partial-aggregate
    // before their exchanges — the shuffle carries counted rows, not text
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"frequency agg must be partial+final:\n$plan")
    assert(plan.contains("doc_id#"), s"missing the doc_id equi-join:\n$plan")
  }

  test("p29 bigram LM: occurrence counts (not shingle sets), equi-join on the gram key") {
    val df = SparkEntry.queries("p29_bigram_lm")(spark, dir)
    val rows = df.collect()
    // every doc with >= 2 words contributes exactly size(w)-1 bigram
    // occurrences — the distinct-gram shingle sets would under-count
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.words
    val expected = Tables.scan(spark, dir, "documents")
      .select(col("doc_id"), (size(words(col("text"))) - 1).cast("long").as("nb"))
      .filter(col("nb") >= 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.length == expected.size)
    rows.foreach(r => assert(r.getLong(1) == expected(r.getLong(0)),
      s"bigram occurrence count mismatch: $r"))
    // lp2 is bounded by n_bigrams * floor(log2(max count)); rarest >= 1
    rows.foreach(r => assert(r.getLong(3) >= 1L && r.getLong(2) >= 0L))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"), s"cartesian in bigram LM:\n$plan")
    // the model join must key on the gram — corpus counts partial-agg first
    assert(plan.linesIterator.count(_.contains("HashAggregate")) >= 2,
      s"gram count agg must be partial+final:\n$plan")
    assert(plan.contains("gram#"), s"missing the gram equi-join:\n$plan")
  }

  test("p30 distinctive terms: doc-partitioned ranking window, dense top-3") {
    val df = SparkEntry.queries("p30_distinctive_terms")(spark, dir)
    val rows = df.collect()
    // per doc: ranks are dense from 1, at most 3
    rows.groupBy(_.getLong(0)).foreach { case (d, rs) =>
      val rks = rs.map(_.getInt(1)).sorted
      assert(rks.toSeq == (1 to rks.length), s"ranks not dense for doc $d")
      assert(rks.length <= 3)
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the ranking window partitions by doc_id — a global rank would
    // funnel the corpus through one task
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"missing the ranking window:\n$plan")
    assert(winLines.forall(_.contains("doc_id#")),
      s"ranking window not doc-partitioned:\n${winLines.mkString("\n")}")
  }

  test("p21 URL dedup: one aggregation shuffle with map-side combine") {
    val df = SparkEntry.queries("p21_url_dedup")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // canon -> partial agg -> ONE key exchange -> final agg (+ output sort)
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final aggregation:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no join belongs in URL dedup:\n$plan")
  }

  test("p31 train order: dense 1-based positions, bucket-partitioned rank") {
    val df = SparkEntry.queries("p31_train_order")(spark, dir)
    val rows = df.collect()
    // positions are a permutation 1..n and agree with the (h, doc_id) sort
    val pos = rows.map(_.getLong(2))
    assert(pos.toSeq == (1L to rows.length).toSeq,
      s"positions not dense from 1: ${pos.take(5).mkString(",")}")
    val sorted = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    assert(sorted.map(_.getLong(2)).toSeq == (1L to rows.length).toSeq,
      "rank order must equal the (h, doc_id) sort")
    // the rank window partitions by the hash bucket — a global
    // row_number would funnel the corpus through one task
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"missing the rank window:\n$plan")
    assert(winLines.forall(_.contains("_bk#")),
      s"rank window not bucket-partitioned:\n${winLines.mkString("\n")}")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast:\n$plan")
  }

  test("p32 chunk dedup: hash-keyed dedup window, every distinct chunk survives once") {
    val df = SparkEntry.queries("p32_chunk_dedup")(spark, dir)
    val rows = df.collect()
    // conservation: summed survivors == corpus-wide distinct chunk count
    import org.apache.spark.sql.functions._
    val t = Tables.scan(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(explode(expr(
        "sequence(cast(0 as bigint), cast(size(w) - 1 as bigint) div 16)")).as("ci"),
        col("w"))
      .select(expr("array_join(slice(w, cast(ci * 16 + 1 as int), 16), ' ')").as("chunk"))
    val distinctChunks = t.agg(countDistinct(col("chunk"))).head().getLong(0)
    assert(rows.map(_.getLong(2)).sum == distinctChunks,
      "each distinct chunk must survive exactly once")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)),
      "kept chunks cannot exceed chunk count")
    // the first-occurrence window partitions by the chunk HASH — chunk
    // text never rides the dedup exchange
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val winLines = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"missing the dedup window:\n$plan")
    assert(winLines.forall(_.contains("ch#")),
      s"dedup window not chunk-hash-partitioned:\n${winLines.mkString("\n")}")
  }

  test("p33 temperature mix: rates broadcast back, smaller domains keep more") {
    val df = SparkEntry.queries("p33_temperature_mix")(spark, dir)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(2) >= 1L && r.getLong(2) <= 1000L),
      "rates are per-mille")
    assert(rows.forall(r => r.getLong(3) <= r.getLong(1)),
      "kept docs cannot exceed domain size")
    // exact rate recomputation from the domain sizes: floor(K·isqrt(n)/n)
    // is NOT monotone across perfect-square boundaries (isqrt(95)/95 <
    // isqrt(100)/100), so assert the α = 1/2 formula itself —
    // fixture-independent
    val tn = rows.map(_.getLong(1)).sum
    val ts = rows.map(r => math.sqrt(r.getLong(1).toDouble).toLong).sum
    rows.foreach { r =>
      val sq = math.sqrt(r.getLong(1).toDouble).toLong
      val expect = math.min(1000L, ((tn / 2) * 1000L * sq) / (ts * r.getLong(1)))
      assert(r.getLong(2) == expect,
        s"rate mismatch for ${r.getString(0)}: got ${r.getLong(2)}, formula $expect")
    }
    // the per-domain rate table is tiny — both joins must broadcast; the
    // corpus side is filter + partial agg, never a sort-merge shuffle
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"rates must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no sort-merge join belongs in the mix plan:\n$plan")
  }

  test("p38 persisted-index probe reproduces p13's math for the gate queries") {
    // the index PERSISTENCE changes where the bytes live (an engine table,
    // hash(cell, 16), probed through PartitionPruner — the in-query gate
    // asserts the file pruning), never the math: same centroids, same
    // assignment, same ranking as the per-run IVF
    val idx = SparkEntry.queries("p38_ann_index")(spark, dir).collect()
    val ivf = SparkEntry.queries("p13_ann_ivf")(spark, dir)
      .filter("query_id < 2").collect()
    assert(idx.nonEmpty)
    assert(idx.map(_.toSeq).toSeq == ivf.map(_.toSeq).toSeq,
      s"index probe diverged from IVF:\n${idx.mkString("\n")}\nvs\n${ivf.mkString("\n")}")
  }

  test("p39 classifier inference is one narrow pass — no joins, model inline") {
    val df = SparkEntry.queries("p39_quality_classifier")(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // inference = explode + inline weight + one per-doc agg; a join or a
    // second aggregate would mean the "model" became corpus state (that is
    // p35's shape, not a classifier's)
    assert(!plan.contains("Join"), s"classifier inference must not join:\n$plan")
    val aggLines = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggLines <= 2, // partial + final of the ONE per-doc agg
      s"classifier inference must aggregate once:\n$plan")
  }

  test("p40 fuzzy decontamination broadcasts the eval side") {
    val df = SparkEntry.queries("p40_fuzzy_decontam")(spark, dir)
    val rows = df.collect()
    // the ratio test is integer-exact and the overlap is bounded by the
    // eval doc's gram count
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        s"shared grams cannot exceed the eval doc's total: $r")
      assert(r.getBoolean(4) == (r.getLong(2) * 10 >= r.getLong(3) * 8))
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("BroadcastHashJoin"),
      s"eval grams must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the gram join must not sort-merge the corpus:\n$plan")
  }

  test("p47 semantic decontam broadcasts the eval side, candidates ride the LSH equi-join") {
    val df = SparkEntry.queries("p47_embed_decontam")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty, "the gate must have contaminated rows to check")
    rows.foreach { r =>
      assert(r.getLong(0) % 7 != 0, s"a train verdict row must be train-side: $r")
      assert(r.getLong(2) % 7 == 0, s"the offending id must be eval-side: $r")
      assert(r.getLong(1) >= 1, s"a verdict row implies at least one hit: $r")
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"semantic decontam must never go all-pairs:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"the eval side must broadcast:\n$plan")
  }

  test("p42 knn join stays cell-bucketed — no all-pairs product") {
    val df = SparkEntry.queries("p42_knn_join")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) != r.getLong(1),
      "a vector is never its own nearest neighbor"))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      s"knn join must ride the cell equi-join:\n$plan")
  }

  test("p43 BM25 restricts postings to probed terms and broadcasts every side table") {
    val df = SparkEntry.queries("p43_bm25")(spark, dir)
    val rows = df.collect()
    assert(rows.length == 15, s"3 queries x top-5: ${rows.length}")
    // per query: ranks dense from 1, scores non-increasing, positive
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to 5), s"query $q ranks")
      val scores = sorted.map(_.getLong(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores must be non-increasing")
      assert(scores.forall(_ > 0), s"query $q scores must be positive")
    }
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the postings side joins query terms / df / totals as BROADCASTS (the
    // 1-row totals ride a broadcast nested loop — bounded by definition);
    // the only shuffle-shaped join is tf x dl on doc_id. A SortMergeJoin on
    // term would mean the full vocab flowed into the score join.
    assert(!plan.contains("CartesianProduct"),
      s"bm25 must not cartesian:\n$plan")
    assert(plan.linesIterator.count(_.contains("SortMergeJoin")) <= 1,
      s"only the doc-length join may sort-merge:\n$plan")
  }

  test("p44 BPE encode is a single narrow pass with the merges folded into the expression") {
    val df = SparkEntry.queries("p44_bpe_encode")(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // merging only ever shrinks the token count, and a token is ≥1 char
      assert(r.getLong(1) <= r.getLong(2),
        s"tokens cannot exceed chars: $r")
      assert(r.getLong(1) > 0, s"non-empty doc must encode to tokens: $r")
    }
    // the encode plan itself must not join or shuffle: the merge table is
    // an expression constant (collected once, bounded by limit 20), so the
    // pass is explode-free scan → project → sort for the gate's orderBy
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"encode must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"encode must not aggregate:\n$plan")
  }

  test("p46 split-leakage verdicts: eval-only rows, leaks only from straddling clusters") {
    val rows = SparkEntry.queries("p46_split_leakage")(spark, dir).collect()
    assert(rows.nonEmpty)
    // the 90/10 hash split is a pure doc_id function — recompute it here
    // and check the row set is exactly the eval side
    val ids = rows.map(_.getLong(0)).toSet
    ids.foreach(id => assert((id * 2654435761L + 17) % 10 >= 9,
      s"doc $id is not in the eval split"))
    // a leaked verdict needs a straddling cluster: cross-check against the
    // cluster frame directly
    val clusters = SparkEntry.queries("p14_dedup_cluster")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trainClusters = clusters.collect {
      case (id, c) if (id * 2654435761L + 17) % 10 < 9 => c
    }.toSet
    rows.foreach { r =>
      val want = trainClusters.contains(clusters(r.getLong(0)))
      assert(r.getBoolean(1) == want, s"verdict mismatch for doc $r")
    }
    val plan = SparkEntry.queries("p46_split_leakage")(spark, dir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!plan.contains("CartesianProduct"),
      s"the verdict must ride equi-joins only:\n$plan")
  }

  test("p45 packs full 2048-token sequences from the real tokenizer counts") {
    val rows = SparkEntry.queries("p45_tokenize_pack")(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).toSeq == (0L until rows.length).toSeq,
      "sequence ids must be dense from 0 — the stream has no holes")
    assert(rows.dropRight(1).forall(_.getLong(2) == 2048L),
      "every non-final sequence must be exactly full (concat-then-chunk)")
    assert(rows.last.getLong(2) <= 2048L && rows.last.getLong(2) > 0L)
    rows.foreach(r => assert(r.getLong(1) >= 1L && r.getLong(3) <= r.getLong(4)))
  }

  test("p41 BPE merge counts: dense ranks, non-increasing counts, vocab-sized explode") {
    val df = SparkEntry.queries("p41_bpe_merges")(spark, dir)
    val rows = df.collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length),
      "ranks must be dense from 1")
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      "merge candidates must come out count-descending")
    assert(rows.forall(_.getString(1).length == 2), "pairs are 2 chars")
    // the rank window runs post-limit (20 rows), never over the corpus —
    // and nothing in the plan joins
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!plan.contains("Join"), s"merge counting must not join:\n$plan")
  }
}
