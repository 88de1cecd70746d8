package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: the runtime answer to skewed keys at 100 TB —
  * a hot key's oversized shuffle partition is split into sub-partitions
  * and the matching side is replicated, without any manual salting. (The
  * manual-salting operator `q_salted_agg` covers the aggregation case;
  * this demonstrates the join case is handled by configuration, not
  * code.) */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // tiny thresholds so the synthetic hot key counts as skewed
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      import spark.implicits._
      // per-row-distinct pad: shuffle blocks are lz4-compressed and skew
      // detection reads COMPRESSED sizes — a constant pad would vanish
      // one hot key (100k rows) + a uniform tail
      val left = ((1 to 100000).map(i => (1L, i)) ++ (1 to 5000).map(i => ((i % 50) + 2L, i)))
        .map { case (k, i) => (k, s"pad_$i" * 8) }.toDF("k", "pad")
      val right = (1 to 60).map(i => (i.toLong, i * 2)).toDF("k", "v")
      val joined = left.join(right, "k")
      // collect() drives THIS QueryExecution to completion (a write sink —
      // or any derived DataFrame — would plan a separate execution and
      // leave this plan unfinalized)
      val n = joined.collect().length
      assert(n == 100000 + 5000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
