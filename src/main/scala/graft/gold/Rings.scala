package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared-attribute fraud-ring detection: pairs of users transacting
  * through the same device key on the same day — the collusion signal the
  * reference's devices/geo_events topics exist to surface (ref
  * spark_jobs/silver/build_fraud_features.py joins device features per
  * user; the ring view is the pairwise completion of that join).
  *
  * Scale shape: the pair generation is a self-join at (day, device)
  * bucket grain, so pair volume is Σ m² over bucket occupancies m — the
  * same quadratic-bucket hazard as LSH banding, governed the same way
  * (MinHash.scala hot-bucket governor): buckets whose occupancy exceeds
  * `maxUsersPerBucket` are excluded BEFORE the join by a deterministic
  * occupancy predicate. A device shared by 10 000 users in one day is a
  * gateway/NAT artifact, not a ring — dropping it is the analytically
  * correct call, and the cutoff is part of the query contract (mirrored
  * verbatim in the oracle), not a silent cap.
  */
object Rings {

  // The admitted (post-governor) bucket membership feeds BOTH sides of
  // the pair self-join; without a persist each side re-derives it from
  // the events scan (2× scan + 2× distinct at 100 TB). Same
  // cache-lifecycle contract as MinHash.lastBanded: each call releases
  // the previous call's cache.
  @volatile private var lastAdmitted: Option[DataFrame] = None
  def releaseCache(): Unit = {
    lastAdmitted.foreach(_.unpersist(blocking = false))
    lastAdmitted = None
  }

  /** Distinct user pairs (a < b) co-occurring on a device-day, with how
    * many device-days they shared and over how many distinct devices.
    * `deviceKey` is extracted from the events props JSON. */
  def sharedDevicePairs(events: DataFrame, eventType: String = "purchase",
                        maxUsersPerBucket: Int = 50): DataFrame = {
    val buckets = events
      .filter(col("event_type") === eventType)
      .select(
        to_date(col("ts")).as("day"),
        get_json_object(col("props"), "$.k").cast("long").as("device"),
        col("user_id"))
      .filter(col("device").isNotNull)
      .distinct()
    // Occupancy governor at bucket grain — one partial-agged count, the
    // filter happens before any pair exists.
    val sized = buckets
      .groupBy("day", "device")
      .agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") >= 2 && col("_occ") <= maxUsersPerBucket)
      .select("day", "device")
    releaseCache()
    val admitted = buckets.join(sized, Seq("day", "device"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    lastAdmitted = Some(admitted)
    val a = admitted.select(col("day"), col("device"), col("user_id").as("user_a"))
    val b = admitted.select(col("day"), col("device"), col("user_id").as("user_b"))
    a.join(b, Seq("day", "device"))
      .filter(col("user_a") < col("user_b"))
      .groupBy("user_a", "user_b")
      .agg(
        count(lit(1)).as("shared_device_days"),
        countDistinct(col("device")).as("shared_devices"),
        min(col("day")).as("first_day"),
        max(col("day")).as("last_day"))
      .orderBy("user_a", "user_b")
  }
}
