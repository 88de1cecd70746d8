package graft.text

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-dedup at ingest (the Dolma-style gate): a mergeable
  * document-hash Bloom store in front of exact dedup for continuous
  * crawls. A new crawl slice probes the store map-side — bloom-NEGATIVE
  * hashes are PROVABLY absent from the base corpus and skip the exact-
  * confirm join entirely; only bloom-positive hashes (true duplicates
  * plus the bounded false-positive residue) reach the join that merges
  * them into the stored summary. False positives cost one extra probe
  * row, never a wrong result: the confirm join is a LEFT join, so an
  * FP hash falls through as the brand-new group it really is. Output is
  * bit-identical to exact dedup over base ∪ delta (the
  * decontaminateSketch pattern: the sketch prunes, exactness comes from
  * the confirm).
  *
  * Store layout: (word, bits, m_bits, n_hashes) parquet rows — the
  * packed-bitset word grain of [[graft.pipeline.FileStats]]'s per-file
  * blooms, but corpus-global. OR is associative, so the store is
  * APPEND-ONLY mergeable like the line-count and band stores: appending a
  * slice's word rows and OR-folding at read time equals a from-scratch
  * build over the union, bit for bit. Build cost is one pass over the
  * slice with the k-fold row expansion dying in the map-side bit_or
  * partial agg; ≤ m_bits/64 rows per slice cross the exchange.
  *
  * Scale shape of the gated merge: the delta aggregates at hash grain
  * (delta-sized shuffle), probes a BROADCAST 1-row bitset (m_bits/8
  * bytes — 128 KB at the default 2^20, still broadcastable at the
  * 2^27 a trillion-doc corpus wants), and the stored base summary is
  * touched only by linear scans joined against BROADCAST positive sets —
  * no corpus-sized shuffle anywhere, which is the point of the gate at
  * 100 TB.
  */
object BloomDedup {

  /** Default geometry: 2^20 bits (128 KB packed) × 5 hashes — ~2% FP at
    * 10^5 distinct hashes; size m_bits ≈ 10 × expected distinct hashes. */
  val DefaultBits: Int = 1 << 20
  val DefaultHashes: Int = 5

  // The probed delta frame feeds three consumers (negatives, positives'
  // two join sides) and the base-join frame feeds two (merged output +
  // matched set) — without persists each re-derives the delta groupBy,
  // the bitset fold, AND the base-summary subtree per consumer (~6 base
  // scans at 100 TB; measured 13 s vs 0.6 s for the ungated dedup at
  // sf0.1). Same cache-lifecycle contract as Rings/Basket.
  @volatile private var caches: List[DataFrame] = Nil
  def releaseCache(): Unit = synchronized {
    caches.foreach(_.unpersist(blocking = false))
    caches = Nil
  }
  private def persisted(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    synchronized { caches = p :: caches }
    p
  }

  private def bloomPos(h: Column, i: Int, mBits: Int): Column =
    pmod(xxhash64(h, lit(i)), lit(mBits.toLong)).cast("int")

  /** (content_hash, doc_id) projection — the only thing the gate ever
    * shuffles (32-char hashes and ids, never document bodies). */
  def contentHashes(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(md5(col(textCol)).as("content_hash"), col("doc_id"))

  private def writeWords(hashes: DataFrame, storePath: String, mBits: Int,
                         nHashes: Int, mode: SaveMode): Unit = {
    require(mBits % 64 == 0, s"mBits $mBits must pack into 64-bit words")
    hashes
      .select(explode(array(
        (0 until nHashes).map(i => bloomPos(col("content_hash"), i, mBits)): _*))
        .as("pos"))
      .groupBy((col("pos") / 64).cast("int").as("word"))
      .agg(bit_or(call_function("shiftleft", lit(1L), col("pos") % 64)).as("bits"))
      .withColumn("m_bits", lit(mBits))
      .withColumn("n_hashes", lit(nHashes))
      // ≤ m_bits/64 tiny rows per slice: one file per write keeps the
      // store's file count at the number of appends, not appends×partitions
      .coalesce(1)
      .write.mode(mode).parquet(storePath)
  }

  /** Build the store from a base corpus (overwrites). */
  def buildHashBloom(docs: DataFrame, storePath: String,
                     textCol: String = "text", mBits: Int = DefaultBits,
                     nHashes: Int = DefaultHashes): Unit =
    writeWords(contentHashes(docs, textCol), storePath, mBits, nHashes,
      SaveMode.Overwrite)

  /** Append a crawl slice's hashes (same geometry — enforced at read). */
  def appendHashBloom(delta: DataFrame, storePath: String,
                      textCol: String = "text", mBits: Int = DefaultBits,
                      nHashes: Int = DefaultHashes): Unit =
    writeWords(contentHashes(delta, textCol), storePath, mBits, nHashes,
      SaveMode.Append)

  /** The store's geometry — one driver-side read of two ints; also
    * guards against slices appended with mismatched geometry (their OR
    * would be meaningless). */
  def geometry(spark: SparkSession, storePath: String): (Int, Int) = {
    val g = spark.read.parquet(storePath)
      .select(col("m_bits"), col("n_hashes")).distinct().collect()
    require(g.length == 1,
      s"bloom store $storePath mixes geometries: ${g.mkString(", ")}")
    (g(0).getInt(0), g(0).getInt(1))
  }

  /** OR-fold the store's word rows into one dense packed bitset on the
    * DRIVER (one job: scan + word-grain partial agg + collect of
    * ≤ m_bits/64 longs). Bounded state by geometry, and no NEW bound: the
    * probe broadcasts this exact array to every executor anyway, so any
    * geometry whose bitset fits an executor fits the driver. (The first
    * cut assembled the dense array with per-word element_at over a Spark
    * MAP — a linear scan per lookup, O(words²) ≈ 10⁸ comparisons in one
    * task at the 2²⁰-bit default; measured ~15 s of wall time.) */
  def foldedBitset(spark: SparkSession, storePath: String,
                   mBits: Int): Array[Long] =
    foldedBitsetWithGeometry(spark, storePath) match {
      case (dense, gotBits, _) =>
        require(gotBits == mBits,
          s"bloom store $storePath geometry $gotBits != expected $mBits")
        dense
    }

  /** One-pass fold + geometry read: scan the store once, OR-fold at word
    * grain while checking geometry consistency per group (every row is in
    * some group, so groupwise min==max ⇒ global consistency) — the probe
    * pays ONE job for what geometry() + a separate fold would pay two. */
  def foldedBitsetWithGeometry(spark: SparkSession,
                               storePath: String): (Array[Long], Int, Int) = {
    val rows = spark.read.parquet(storePath)
      .groupBy(col("word")).agg(bit_or(col("bits")).as("bits"),
        min(col("m_bits")).as("mb_min"), max(col("m_bits")).as("mb_max"),
        min(col("n_hashes")).as("nh_min"), max(col("n_hashes")).as("nh_max"))
      .collect()
    require(rows.nonEmpty, s"bloom store $storePath is empty")
    val mBits = rows(0).getInt(2)
    val nHashes = rows(0).getInt(4)
    require(rows.forall(r => r.getInt(2) == mBits && r.getInt(3) == mBits &&
        r.getInt(4) == nHashes && r.getInt(5) == nHashes),
      s"bloom store $storePath mixes geometries")
    val dense = new Array[Long](mBits / 64)
    rows.foreach(r => dense(r.getInt(0)) = r.getLong(1))
    (dense, mBits, nHashes)
  }

  /** [[foldedBitset]] as a 1-row DataFrame — the merged filter over every
    * slice ever appended, for callers comparing stores frame-to-frame. */
  def mergedBitset(spark: SparkSession, storePath: String): DataFrame = {
    val (mBits, _) = geometry(spark, storePath)
    spark.range(1).select(
      typedlit(foldedBitset(spark, storePath, mBits).toSeq).as("bloom"))
  }

  /** "Might the store contain this hash?" — all n bits set, evaluated
    * with pure built-ins over the broadcast bitset array (logical shift:
    * an arithmetic shift of a sign-bit word would smear 1s). */
  def mightContain(bloom: Column, h: Column, mBits: Int, nHashes: Int): Column =
    (0 until nHashes).map { i =>
      val pos = bloomPos(h, i, mBits)
      call_function("shiftrightunsigned",
        element_at(bloom, (pos / 64).cast("int") + 1), pos % 64)
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)

  /** Delta hash groups split by the gate: (content_hash, canonical_doc_id,
    * doc_count, might). The delta-grain groupBy is always needed (within-
    * slice duplicates); the bloom decides which groups must confirm
    * against the base. */
  def probedDeltaGroups(delta: DataFrame, storePath: String,
                        textCol: String = "text"): DataFrame = {
    val spark = delta.sparkSession
    val (dense, mBits, nHashes) = foldedBitsetWithGeometry(spark, storePath)
    // the bitset rides into the probe as a literal array (task-binary
    // broadcast) — no crossJoin barrier, no extra job
    val bloom = typedlit(dense.toSeq)
    contentHashes(delta, textCol)
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("canonical_doc_id"),
        count(lit(1)).as("doc_count"))
      .withColumn("might",
        mightContain(bloom, col("content_hash"), mBits, nHashes))
  }

  /** Ingest `delta` against a stored base summary (the exactDups frame of
    * everything previously ingested) through the Bloom gate; returns the
    * updated summary — bit-identical to `Dedup.exactDups(base ∪ delta)`.
    *
    * Join inventory (the 100 TB shape): delta-grain groupBy; ONE linear
    * pass over the base summary with a broadcast left join (positives are
    * |true dups| + FP residue, bounded); small-side anti joins against
    * broadcast matched sets; a union. Bloom-negative groups never touch
    * the base at all. */
  def exactDupsIncremental(baseSummary: DataFrame, delta: DataFrame,
                           storePath: String,
                           textCol: String = "text"): DataFrame = {
    releaseCache()
    val probed = persisted(probedDeltaGroups(delta, storePath, textCol))
    val negatives = probed.filter(!col("might"))
    val positives = probed.filter(col("might"))
      .select(col("content_hash"), col("canonical_doc_id").as("d_can"),
        col("doc_count").as("d_cnt"))

    // one base scan: merge matched positive groups in place, pass the
    // rest through untouched
    val baseJoined = persisted(baseSummary
      .select("content_hash", "canonical_doc_id", "doc_count")
      .join(broadcast(positives), Seq("content_hash"), "left"))
    val baseOut = baseJoined.select(
      col("content_hash"),
      least(col("canonical_doc_id"),
        coalesce(col("d_can"), col("canonical_doc_id"))).as("canonical_doc_id"),
      (col("doc_count") + coalesce(col("d_cnt"), lit(0L))).as("doc_count"))

    // false-positive residue: positive groups with no base match are the
    // brand-new groups they really are. The matched set is ≤ |positives|
    // rows, so the anti join is small-vs-broadcast-small.
    val matched = baseJoined.filter(col("d_cnt").isNotNull)
      .select("content_hash")
    val fpNew = positives
      .join(broadcast(matched), Seq("content_hash"), "left_anti")
      .select(col("content_hash"), col("d_can").as("canonical_doc_id"),
        col("d_cnt").as("doc_count"))

    baseOut
      .unionByName(fpNew)
      .unionByName(negatives.select("content_hash", "canonical_doc_id", "doc_count"))
      .withColumn("dup_count", col("doc_count") - 1)
  }
}
