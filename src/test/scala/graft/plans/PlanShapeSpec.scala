package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry
import graft.SparkTestSession

/** Physical-plan shape locks (SURVEY.md §3.2, builder prompt: ".explain the
  * plan and iterate until it's the plan you'd want"). These tests fail if a
  * future change silently loses predicate pushdown, column pruning, the
  * broadcast join, or adds an extra shuffle to the politeness dequeue. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("scan filter is pushed to the parquet reader and columns are pruned") {
    val plan = formatted(SparkEntry.queries("q_scan_filter")(spark, sf))
    assert(plan.contains("PushedFilters:"), plan)
    assert(plan.contains("GreaterThanOrEqual(l_quantity,45"), plan)
    assert(plan.contains("EqualTo(l_returnflag,R)"), plan)
    // ReadSchema must not include untouched wide columns
    assert(!plan.contains("l_extendedprice"), "column pruning lost:\n" + plan)
    assert(!plan.contains("l_shipdate"), "column pruning lost:\n" + plan)
  }

  test("small dimension join is a broadcast hash join") {
    val plan = formatted(SparkEntry.queries("q_join_agg")(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dedup anti-join compiles to a left-anti hash join, keyed on the join column") {
    val plan = formatted(SparkEntry.queries("q_anti_join")(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
  }

  test("politeness dequeue = exactly one exchange (host hash partitioning)") {
    val frontier = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_suppkey".as("host"), $"l_orderkey".as("url_hash"),
        $"l_quantity".as("priority"))
    val w = Window.partitionBy($"host").orderBy($"priority".desc, $"url_hash")
    val dequeue = frontier.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 4)
    val physical = dequeue.queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(physical).length
    assert(exchanges === 1, physical)
    assert(physical.contains("hashpartitioning(host"), physical)
  }

  test("aggregations use partial (map-side) aggregation before the shuffle") {
    val plan = SparkEntry.queries("q_agg_user")(spark, sf)
      .queryExecution.executedPlan.toString
    // HashAggregate appears twice: partial_ before the exchange, final after
    assert(plan.contains("partial_"), plan)
    assert("HashAggregate".r.findAllIn(plan).length >= 2, plan)
  }

  test("top-k order-by-limit compiles to TakeOrderedAndProject (no global sort)") {
    val plan = SparkEntry.queries("q_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("whole-stage codegen covers the scan-filter-project pipeline") {
    // executedPlan marks codegen stages with the "*(n)" prefix
    val plan = SparkEntry.queries("q_scan_filter")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("ANN LSH plan is a bucket join, never a cartesian/NLJ over the corpus") {
    val plan = SparkEntry.queries("q_ann_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("lsh_signatures"), plan) // the codegen expression
  }

  test("embedding near-dup: exact form is the (intended, bounded) NLJ; LSH form is not") {
    // the exact baseline deliberately broadcasts one side into an NLJ — it
    // exists as the oracle surface; the scale path must be a key join
    val exact = SparkEntry.queries("q_dedup_embedding")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(exact.contains("BroadcastNestedLoopJoin"), exact)
    val lsh = SparkEntry.queries("q_dedup_embedding_lsh")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!lsh.contains("BroadcastNestedLoopJoin"), lsh)
    assert(!lsh.contains("CartesianProduct"), lsh)
  }

  test("IVF probe join is a key join on the list id, not a corpus scan per query") {
    val plan = SparkEntry.queries("q_ann_ivf")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ivf_list"), plan)
  }

  test("documents 2-column projection reads a 2-column schema") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"lang")
    val plan = formatted(df)
    assert(plan.contains("doc_id"), plan)
    assert(!plan.contains("struct<") || !plan.contains("text"), "pruning lost:\n" + plan)
  }

  test("chunking and hash-sampling are narrow: zero exchanges in the plan") {
    for (q <- Seq("q_chunk_fixed", "q_sample_hash")) {
      val physical = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"), s"$q grew a shuffle:\n$physical")
    }
  }

  test("rank<=k window compiles to WindowGroupLimit (partial top-k before the full sort)") {
    // Spark pushes a rank-filter into the window as a group limit that runs
    // map-side BEFORE the exchange — the per-group top-k never shuffles the
    // losers. Locked: losing this silently makes q_window_rank shuffle the
    // whole table again.
    val physical = SparkEntry.queries("q_window_rank")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(physical.contains("WindowGroupLimit"), physical)
  }

  test("simhash pair path is UDF-free: codegen bit_count, no ScalaUDF") {
    // the per-doc signature UDF (pinned xxh64 arithmetic) is upstream in
    // simHashIndex; the PAIR path — bucket join + Hamming verify — must stay
    // in whole-stage codegen with no ScalaUDF boundary
    val idx = Seq((0L, 7L), (1L, 5L)).toDF("doc_id", "simhash")
      .withColumn("block0", $"simhash".bitwiseAND(lit(0xffffL)))
      .withColumn("block1", lit(0L)).withColumn("block2", lit(0L))
      .withColumn("block3", lit(0L))
    val physical = graft.operators.Dedup.simHashPairsFromIndex(idx)
      .queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF"), s"pair path grew a UDF:\n$physical")
    assert(physical.contains("bit_count"), physical)
  }

  test("decontamination broadcasts the benchmark shingle set (corpus never shuffled for the join)") {
    val physical = SparkEntry.queries("q_decontaminate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), physical)
    // the only allowed exchanges: benchmark-side distinct (tiny) and the
    // final per-doc count agg — the corpus shingle stream itself must feed
    // the broadcast join pipelined, without a corpus-wide repartition
    assert(!physical.contains("SortMergeJoin"), physical)
  }

  test("crawl seen-dedup scan form: the seen table is scanned, never shuffled") {
    import spark.implicits._
    val seen = (0L until 1000L).map(i => (i, i + 1, s"u$i", 0))
      .toDF("url_hash_hi", "url_hash_lo", "url", "first_seen_round")
    val suspects = (500L until 1500L).map(i => (i, i + 1, s"http://u$i", 1))
      .toDF("url_hash_hi", "url_hash_lo", "url", "priority")
    val scan = graft.operators.CrawlRound.seenAntiJoinScan(seen, suspects)
    val physical = scan.queryExecution.executedPlan.toString
    // both joins broadcast the small side; the seen side carries NO exchange
    // and NO sort — the per-round cost against the unbounded seen set is one
    // narrow scan, the 10^10-URL asymptote the crawl claims
    assert(physical.contains("BroadcastHashJoin"), physical)
    assert(!physical.contains("SortMergeJoin"), physical)
    assert(!physical.contains("Exchange hashpartitioning"), physical)
    // and the form is output-identical to the shuffle form
    val a = scan.select($"url_hash_hi").as[Long].collect().sorted.toSeq
    val b = graft.operators.CrawlRound.seenAntiJoinShuffle(seen, suspects)
      .select($"url_hash_hi").as[Long].collect().sorted.toSeq
    assert(a === b)
    assert(a === (1000L until 1500L).toSeq)
  }
}
