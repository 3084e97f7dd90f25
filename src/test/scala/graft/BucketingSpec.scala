package graft



import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** X1 at the read path: bucketed tables co-locate join keys at WRITE
  * time, so the join needs no shuffle at all — the 100 TB answer for a
  * fact⋈dim pair that is joined repeatedly on the same key (the Spark
  * fate of the reference's B-tree indexes, `migration.py:80-103`).
  */
class BucketingSpec extends SparkTestBase {

  test("bucketed-by-key tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — managed tables land in the default
    // ./spark-warehouse (gitignored) and are dropped (purged) below.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dir = "/root/testdata/sf0.001"
      spark.read.parquet(s"$dir/orders.parquet")
        .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      spark.read.parquet(s"$dir/customer.parquet")
        .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      joined.write.format("noop").mode("overwrite").save()

      val exec = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = exec.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.isEmpty, s"bucketed join should not shuffle:\n$exec")
      assert(joined.count() === spark.table("orders_b").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
