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
  // cache-lifecycle contract as MinHash.lastBanded — a LIST because the
  // incremental path holds a base and a delta store at once.
  @volatile private var admittedCaches: List[DataFrame] = Nil
  def releaseCache(): Unit = synchronized {
    admittedCaches.foreach(_.unpersist(blocking = false))
    admittedCaches = Nil
  }

  /** Admitted (day, device, user) bucket membership behind the occupancy
    * governor; persisted (appends to the cache list — callers own the
    * releaseCache() lifecycle). */
  private def admittedBuckets(events: DataFrame, eventType: String,
                              maxUsersPerBucket: Int): DataFrame = {
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
    val admitted = buckets.join(sized, Seq("day", "device"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized { admittedCaches = admitted :: admittedCaches }
    admitted
  }

  /** Distinct user pairs (a < b) co-occurring on a device-day, with how
    * many device-days they shared and over how many distinct devices.
    * `deviceKey` is extracted from the events props JSON. */
  def sharedDevicePairs(events: DataFrame, eventType: String = "purchase",
                        maxUsersPerBucket: Int = 50): DataFrame = {
    releaseCache()
    pairsFromStore(pairDeviceStore(events, eventType, maxUsersPerBucket,
      releaseFirst = false))
  }

  /** The MERGEABLE pair representation at (user_a, user_b, device) grain —
    * the materialized half of an incrementally-maintained fraud graph.
    * Day buckets are self-contained (the governor is per (day, device),
    * and a day's events land wholly in one batch), so a store built from
    * base days and a store built from delta days merge EXACTLY: same-key
    * rows add their disjoint day counts — the device-graph analog of the
    * CDC→gold incremental loop (Medallion) and the LSH band-store
    * (q_neardup_incremental). */
  def pairDeviceStore(events: DataFrame, eventType: String = "purchase",
                      maxUsersPerBucket: Int = 50,
                      releaseFirst: Boolean = true): DataFrame = {
    if (releaseFirst) releaseCache()
    val admitted = admittedBuckets(events, eventType, maxUsersPerBucket)
    val a = admitted.select(col("day"), col("device"), col("user_id").as("user_a"))
    val b = admitted.select(col("day"), col("device"), col("user_id").as("user_b"))
    a.join(b, Seq("day", "device"))
      .filter(col("user_a") < col("user_b"))
      .groupBy("user_a", "user_b", "device")
      .agg(
        count(lit(1)).as("dev_days"),
        min(col("day")).as("first_day"),
        max(col("day")).as("last_day"))
  }

  /** Merge stores built from disjoint day ranges (exact — see
    * pairDeviceStore). */
  def mergePairStores(stores: DataFrame*): DataFrame =
    stores.reduce(_.unionByName(_))
      .groupBy("user_a", "user_b", "device")
      .agg(
        sum(col("dev_days")).as("dev_days"),
        min(col("first_day")).as("first_day"),
        max(col("last_day")).as("last_day"))

  /** Roll a (pair, device)-grain store up to the pair view —
    * shared_devices is the store's row count per pair (one row per
    * distinct device by construction), so no countDistinct is needed. */
  def pairsFromStore(store: DataFrame): DataFrame =
    store.groupBy("user_a", "user_b")
      .agg(
        sum(col("dev_days")).as("shared_device_days"),
        count(lit(1)).as("shared_devices"),
        min(col("first_day")).as("first_day"),
        max(col("last_day")).as("last_day"))
      .orderBy("user_a", "user_b")
}
