package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties `.explain` reviews
  * manually, pinned in CI. A pass that silently loses column pruning,
  * turns a broadcast dim join into a shuffle, or plans a cartesian
  * product is a 100 TB incident a correctness hash can't catch.
  */
class PlanGuardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
    case q: QueryStageExec => q +: walk(q.plan)
    case r: ReusedExchangeExec => r +: walk(r.child)
    case other => other +: other.children.flatMap(walk)
  }

  private def nodes(df: DataFrame): Seq[SparkPlan] =
    walk(df.queryExecution.executedPlan)

  test("q1_agg scan is column-pruned to the referenced lineitem columns") {
    val scans = nodes(Queries.q1Agg(spark, sf)).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val widths = scans.map(_.requiredSchema.fieldNames.length)
    // 7 referenced columns (flag, status, qty, price, discount, tax,
    // shipdate) out of 16 — a 16-wide read schema means pruning died
    assert(widths.forall(_ <= 7),
      s"lineitem read schema widths $widths exceed the 7 referenced columns")
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val scans = nodes(Queries.q1Agg(spark, sf)).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("LessThanOrEqual"))),
      "shipdate predicate not pushed to the scan")
  }

  test("events loader: pruning and pushdown survive the ts-normalize projection") {
    // Tables.events wraps the scan in a Project (dtype-normalized
    // ts_ns) — a seam that could silently block column pruning and
    // predicate pushdown for every event query; pin both through it
    import org.apache.spark.sql.functions.col
    val df = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_ns"))
    val scans = nodes(df).collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty)
    // referenced: ts (pre-normalize), user_id, event_type — never all 6
    assert(scans.forall(_.requiredSchema.fieldNames.length <= 3),
      s"events read schema not pruned: ${scans.map(_.requiredSchema.fieldNames.toSeq)}")
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("EqualTo(event_type"))),
      "event_type predicate not pushed through the normalize projection")
  }

  test("star join plans every dimension as a broadcast join, no cartesian product") {
    val df = graft.operators.CoreOps.joinAggNation(spark, sf)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val ns = nodes(df)
    assert(!ns.exists(_.isInstanceOf[CartesianProductExec]), "cartesian product planned")
    val broadcasts = ns.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(broadcasts >= 2, s"expected ≥2 broadcast dim joins, saw $broadcasts")
  }

  test("bloom semi join keeps the bloom filter BELOW the left-semi join") {
    // the _bf_tag trick exists to stop PushDownLeftSemiAntiJoin from
    // hoisting the semi join under the bloom filter (which would feed
    // it the unpruned probe); a Spark upgrade that constant-folds the
    // tag would silently undo it — pin the executed shape
    val df = graft.operators.CoreOps.bloomSemiJoin(spark, sf)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val semis = nodes(df).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi => j
    }
    assert(semis.nonEmpty, "no left-semi join in the executed plan")
    // the membership predicate (a forall over xxhash64 positions) may
    // surface as a FilterExec or be absorbed into the bitmap
    // crossJoin's condition — either way it must sit in the semi
    // join's LEFT (probe) subtree
    val bloomBelow = semis.exists(j =>
      walk(j.children.head).exists { p =>
        val self = p.simpleString(10000)
        self.contains("xxhash64") && self.contains("forall")
      })
    assert(bloomBelow,
      "bloom membership filter is not below the semi join — the pushdown descent re-enabled")
  }

  test("no partition-less window over a corpus-derived frame in ANY registered query") {
    import org.apache.spark.sql.execution.window.WindowExec
    // a Window.partitionBy() moves its whole input through ONE
    // partition — the classic silent scale-killer. No whitelist and
    // no limit-bounded escape hatch: every window in every registered
    // query must be keyed, forever. Global totals are scalar
    // aggregates broadcast-crossed back (CorpusOps.classBalance);
    // tiny top-k frames rank via sorted-array posexplode position
    // (CorpusOps.weightedSample) — neither plans a WindowExec.
    val offenders = SparkEntry.queries.keys.toSeq.sorted
      .filter { name =>
        nodes(SparkEntry.queries(name)(spark, sf)).exists {
          case w: WindowExec => w.partitionSpec.isEmpty
          case _ => false
        }
      }
    assert(offenders.isEmpty,
      s"partition-less windows found in: ${offenders.mkString(", ")}")
  }

  test("winnow/ngram fingerprint projections evaluate ONCE (exchange reuse below the pair fan-out)") {
    // the r12 winnowDedup regression: the expensive fingerprint
    // transform sat ABOVE its repartition barrier, so every consumer
    // (df agg, both self-join sides) re-ran it — 615 s at sf0.1. The
    // contract is: evaluate once below a shared exchange, every
    // consumer reuses that exchange. Count EVALUATIONS of the
    // transform in the executed plan: walk without descending into
    // reused exchanges (a ReusedExchange shares the evaluation),
    // dedupe by node identity, require exactly one site — a Generate
    // (the winnow postings generator) or a Project (the ngram shingle
    // transform).
    import org.apache.spark.sql.execution.{GenerateExec, ProjectExec}
    def evalSites(df: DataFrame, marker: String): Int = {
      // execute THIS QueryExecution (df.write builds a fresh one whose
      // AQE plan never finalizes) so the walk sees runtime stage reuse
      df.queryExecution.toRdd.count()
      def w(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => a +: w(a.executedPlan)
        case q: QueryStageExec => q +: w(q.plan)
        case r: ReusedExchangeExec => Seq(r) // shared evaluation — stop
        case other => other +: other.children.flatMap(w)
      }
      w(df.queryExecution.executedPlan)
        .collect {
          case p: ProjectExec
              if p.projectList.exists(_.toString.toLowerCase.contains(marker)) => p
          case g: GenerateExec
              if g.generator.toString.toLowerCase.contains(marker) => g
        }
        .map(System.identityHashCode).distinct.size
    }
    val winnow = evalSites(SparkEntry.queries("q_winnow_dedup")(spark, sf), "winnowpostingsgen")
    assert(winnow == 1, s"winnow fingerprint generator evaluated at $winnow sites, expected 1")
    // the ngram postings generator must be the ONE corpus-wide shingle
    // evaluation; the dirty-path shingleSet recompute is bounded to
    // both-tainted survivors and is AQE-pruned entirely on this corpus
    // (hot set empty below the cap)
    val ngram = evalSites(SparkEntry.queries("q_dedup_ngram")(spark, sf), "shinglepostingsgen")
    assert(ngram == 1, s"ngram shingle generator evaluated at $ngram sites, expected 1")
  }

  test("media feature extraction is shuffle-free (blob bytes never ride an exchange)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // the multimodal contract, r19 form: decode happens inside a
    // scan-side mapPartitions boundary and emits one slim row per
    // blob; the ONLY permitted exchange is the CONDITIONAL width
    // barrier (operators.widen), which repartitions the blob frame
    // exactly when the scan has fewer splits than the session width
    // (this test corpus: one row group) and is a no-op on any layout
    // with enough splits. So: with the session's shuffle width forced
    // to 1 — a layout where the scan parallelism (>= 1) always
    // suffices — these plans must be SHUFFLE-FREE, proving no
    // unconditional exchange ever carries blob bytes; at the normal
    // width at most the one widen barrier may appear.
    Seq("q_bmp_features", "q_wav_features").foreach { name =>
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        val df = SparkEntry.queries(name)(spark, sf)
        df.collect() // finalize AQE
        val shuffles = nodes(df).count(_.isInstanceOf[ShuffleExchangeLike])
        assert(shuffles === 0, s"$name plans $shuffles shuffle(s) at width 1")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val shuffles = nodes(df).count(_.isInstanceOf[ShuffleExchangeLike])
      assert(shuffles <= 1, s"$name plans $shuffles shuffle(s), expected <= 1 (the widen barrier)")
    }
  }

  test("heavy pair pipelines plan no cartesian product") {
    for (q <- Seq("q_token_jaccard_join", "q_dedup_ngram", "q_dedup_minhash")) {
      val ns = nodes(SparkEntry.queries(q)(spark, sf))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q plans a cartesian product")
    }
  }
}
