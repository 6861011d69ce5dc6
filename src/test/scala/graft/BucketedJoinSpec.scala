package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketed

/** The co-located join layout must actually deliver its scale claims in
  * the physical plan: key-equal joins over same-bucketed tables run with
  * zero Exchange, downstream key aggregation reuses the bucketing, a key
  * filter prunes to one bucket's files, and results are identical to the
  * plain (shuffling) join. Broadcast is disabled inside the join tests —
  * at 100 TB neither side fits in a broadcast, so the SortMergeJoin shape
  * IS the production shape. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def fmt(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def tables(): (String, String) = {
    val orders = Bucketed.ensure(spark, "orders_bycust", dir, "o_custkey", 8)(
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice"))
    val cust = Bucketed.ensure(spark, "customer_bykey", dir, "c_custkey", 8)(
      spark.read.parquet(s"$dir/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal"))
    (cust, orders)
  }

  private def withConf[A](kvs: (String, String)*)(body: => A): A = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def noBroadcast[A](body: => A): A =
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1")(body)

  test("bucketed join + key aggregation plan ZERO exchanges") {
    noBroadcast {
      val (cust, orders) = tables()
      val joined = spark.table(cust)
        .join(spark.table(orders), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
      val plan = fmt(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"), s"bucketing must kill every shuffle:\n$plan")
    }
  }

  test("one file per bucket lets the reader elide the merge-join sorts") {
    // SORTED BY metadata is only honored when each bucket is a single
    // file (guaranteed by the pre-repartition in Bucketed.ensure) AND the
    // reader opts in — sorted-scan propagation sits behind a legacy flag
    // since Spark 3
    noBroadcast {
      withConf("spark.sql.legacy.bucketedTableScan.outputOrdering" -> "true") {
        val (cust, orders) = tables()
        val joined = spark.table(cust)
          .join(spark.table(orders), col("c_custkey") === col("o_custkey"))
          .select("c_custkey", "o_orderkey")
        val plan = fmt(joined)
        assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
        // a standalone Sort node ("(4) Sort", "+- Sort") — NOT the Sort
        // inside SortMergeJoin's own name
        assert("""\) Sort\b|\+- Sort\b""".r.findFirstIn(plan).isEmpty,
          s"per-bucket sort order must be reused:\n$plan")
      }
    }
  }

  test("a bucket-key filter prunes the scan to 1 of 8 buckets") {
    // autoBucketedScan turns bucketed reading off for join-free queries
    // (it trades pruning for avoiding the one-partition-per-bucket read);
    // force it on to audit what a keyed lookup would do at scale
    withConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val (cust, _) = tables()
      val plan = fmt(spark.table(cust).filter(col("c_custkey") === 42L))
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"no bucket pruning:\n$plan")
    }
  }

  test("bucketed execution returns exactly the plain join's rows") {
    noBroadcast {
      val (cust, orders) = tables()
      val bucketed = spark.table(cust)
        .join(spark.table(orders), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val plain = spark.read.parquet(s"$dir/customer.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("cents"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(bucketed == plain && bucketed.nonEmpty)
    }
  }

  test("ensure() is idempotent and survives re-entry in the same JVM") {
    val (cust, _) = tables()
    val n1 = spark.table(cust).count()
    val (cust2, _) = tables() // second call: catalog hit, no rewrite
    assert(cust2 == cust && spark.table(cust2).count() == n1)
  }
}
