package graft.operators

import graft.util.Cols
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic column profiling: count / nulls / distinct / min / max /
  * mean / variance / stddev per numeric column — the data-profiling pass a
  * curation pipeline runs before and after every transformation.
  *
  * Variance comes from exact decimal moments (Σx, Σx² summed as decimals —
  * order-independent under any shuffle schedule), combined in double with
  * single IEEE ops: identical operands + identical op sequence = identical
  * bits in every engine (built-in `stddev` sums doubles and is run-to-run
  * nondeterministic at scale). Second moments exceed the 2^53 exact
  * decimal→double bound, so they convert via the text path
  * (Cols.sumMoneyBig/sumMoneySqBig — one correctly-rounded parse in both
  * engines). Statistics use the NON-NULL count as denominator (sums skip
  * nulls); row_count/null_count report the raw shape. All per-column
  * stats fuse into ONE expand-free scan (conditional aggregates + stack
  * unpivot, same shape as the DQ suite); exact distinct counts run as
  * separate column-pruned aggregates joined back broadcast, so no stage
  * replicates the scan Expand-style.
  *
  * Contract: moment accumulators are money-scale decimals — profiled
  * columns must carry at most 2 fractional digits (scale 2). Finer-scale
  * values are truncated before summing, silently biasing sum/mean/
  * variance. The TPC-H money columns profiled here satisfy this and the
  * DuckDB oracle mirrors the same rounding; pass pre-rounded columns (or
  * extend Cols with a wider-scale accumulator) for general numeric data.
  */
object Profiling {

  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c => Seq(
      count(lit(1)).as(s"${c}__cnt"),
      count(col(c)).as(s"${c}__nn"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max"),
      Cols.sumMoneyBig(col(c)).as(s"${c}__sum"),
      Cols.sumMoneySqBig(col(c), col(c)).as(s"${c}__sumsq"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    // Exact distincts run as one pruned single-column aggregate per column
    // instead of countDistinct inside the moments agg: k distincts there
    // make Catalyst Expand the scan k+1× (every row replicated per
    // distinct, null-padded to full aggregate width) through one exchange.
    // Split, each distinct is a narrow partial-agg over just its column's
    // pages, the moments scan stays expand-free, and the k+1 independent
    // stages schedule concurrently. Results (one row each) join back
    // broadcast on column_name.
    val distincts = cols.map { c =>
      df.select(col(c)).agg(countDistinct(col(c)).as("distinct_count"))
        .select(lit(c).as("column_name"), col("distinct_count"))
    }.reduce(_.union(_))
    val stackExpr = cols.map(c =>
      s"'$c', ${c}__cnt, ${c}__nn, ${c}__nulls, ${c}__min, ${c}__max, ${c}__sum, ${c}__sumsq")
      .mkString(", ")
    agged
      .selectExpr(s"stack(${cols.size}, $stackExpr) as " +
        "(column_name, row_count, value_count, null_count, min_value, max_value, sum_value, sumsq_value)")
      .join(broadcast(distincts), "column_name")
      .select(col("column_name"), col("row_count"), col("value_count"),
        col("null_count"), col("distinct_count"), col("min_value"),
        col("max_value"), col("sum_value"), col("sumsq_value"))
      .withColumn("mean", col("sum_value") / col("value_count"))
      .withColumn("variance",
        (col("sumsq_value") - col("sum_value") * col("sum_value") / col("value_count"))
          / col("value_count"))
      .withColumn("stddev", sqrt(col("variance")))
      .drop("sumsq_value")
  }

  /** Pearson correlation from exact decimal cross-moments (built-in
    * `corr` double-sums and is order-dependent; this is deterministic):
    * cov = Σxy/n − (Σx/n)(Σy/n), r = cov / (σx·σy). One scan. Rows where
    * either column is null are excluded (n counts complete pairs). */
  def correlation(df: DataFrame, x: String, y: String): DataFrame =
    df.filter(col(x).isNotNull && col(y).isNotNull)
      .agg(
        count(lit(1)).as("n"),
        Cols.sumMoneyBig(col(x)).as("sum_x"),
        Cols.sumMoneyBig(col(y)).as("sum_y"),
        Cols.sumMoneySqBig(col(x), col(y)).as("sum_xy"),
        Cols.sumMoneySqBig(col(x), col(x)).as("sum_x2"),
        Cols.sumMoneySqBig(col(y), col(y)).as("sum_y2"))
      .withColumn("covariance",
        col("sum_xy") / col("n") - (col("sum_x") / col("n")) * (col("sum_y") / col("n")))
      .withColumn("corr",
        col("covariance") /
          (sqrt(col("sum_x2") / col("n") - (col("sum_x") / col("n")) * (col("sum_x") / col("n")))
            * sqrt(col("sum_y2") / col("n") - (col("sum_y") / col("n")) * (col("sum_y") / col("n")))))
      .select(lit(x).as("x_column"), lit(y).as("y_column"), col("n"),
        col("covariance"), col("corr"))

  /** Equi-width histogram of a numeric column: exact min/max from one
    * 1-row aggregate (broadcast back — never a driver round-trip into
    * literals, so the plan is one job), then a map-side bucket projection
    * + bucket-grain count. Bucket arithmetic is a fixed IEEE chain
    * (width = (max−min)/bins; idx = min(floor((x−min)/width), bins−1))
    * mirrored verbatim in the oracle, so edges land identically. The
    * profiling companion to the exact-percentile path: O(bins) output
    * regardless of corpus size, one exchange. */
  def histogram(df: DataFrame, column: String, bins: Int = 20): DataFrame = {
    val bounds = df.agg(
      min(col(column).cast("double")).as("lo"),
      max(col(column).cast("double")).as("hi"),
      count(col(column)).as("n_rows"))
    df.select(col(column).cast("double").as("x"))
      .filter(col("x").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("width", (col("hi") - col("lo")) / lit(bins.toDouble))
      .withColumn("bucket",
        least(floor((col("x") - col("lo")) / col("width")), lit((bins - 1).toDouble))
          .cast("long"))
      .groupBy("bucket", "lo", "hi", "width", "n_rows")
      .agg(count(lit(1)).as("bucket_count"))
      .select(lit(column).as("column_name"), col("bucket"),
        (col("lo") + col("bucket").cast("double") * col("width")).as("bucket_lo"),
        (col("lo") + (col("bucket") + 1).cast("double") * col("width")).as("bucket_hi"),
        col("bucket_count"), col("n_rows"),
        (col("bucket_count").cast("double") / col("n_rows").cast("double"))
          .as("share"))
  }

  /** DuckDB mirror of [[histogram]] — same IEEE chain, no width_bucket
    * (engines disagree on its edge conventions). */
  def histogramOracleSql(table: String, column: String, bins: Int = 20): String =
    s"""WITH b AS (
       |  SELECT min(CAST($column AS DOUBLE)) AS lo, max(CAST($column AS DOUBLE)) AS hi,
       |    count($column) AS n_rows
       |  FROM $table
       |), buck AS (
       |  SELECT least(floor((CAST($column AS DOUBLE) - lo) / ((hi - lo) / $bins.0)),
       |      CAST(${bins - 1} AS DOUBLE)) AS bucket,
       |    lo, hi, (hi - lo) / $bins.0 AS width, n_rows
       |  FROM $table CROSS JOIN b
       |  WHERE $column IS NOT NULL
       |)
       |SELECT '$column' AS column_name, CAST(bucket AS BIGINT) AS bucket,
       |  lo + bucket * width AS bucket_lo,
       |  lo + (bucket + 1) * width AS bucket_hi,
       |  CAST(count(*) AS BIGINT) AS bucket_count,
       |  CAST(n_rows AS BIGINT) AS n_rows,
       |  CAST(count(*) AS DOUBLE) / CAST(n_rows AS DOUBLE) AS share
       |FROM buck GROUP BY bucket, lo, hi, width, n_rows
       |ORDER BY bucket""".stripMargin

  /** Robust-scaler statistics table: per feature the exact
    * min/max/mean/std and exact interpolated quartiles (p25/median/p75 +
    * IQR) — the lookup a preprocessing stage broadcast-joins to
    * median-center and IQR-scale numeric features (scikit-learn's
    * RobustScaler contract, outlier-insensitive where mean/std scaling is
    * not).
    *
    * One pass: features stack row-wise, ONE exchange on feature
    * (RankPercentile.ranked — the non-buffering exact-percentile shape),
    * then a single bounded groupBy computes the decimal moments AND the
    * rank-interpolated quartiles over the same co-partitioned frame. No
    * `percentile` aggregate (its buffer grows with group size — a feature
    * group here spans the corpus). */
  def robustScaler(df: DataFrame, features: Seq[(String, Column)]): DataFrame = {
    val stacked = df.select(explode(array(features.map { case (n, c) =>
        struct(lit(n).as("feature"), c.cast("double").as("v"))
      }: _*)).as("fv"))
      .select(col("fv.feature").as("feature"), col("fv.v").as("v"))
      .filter(col("v").isNotNull)
    val ranked = RankPercentile.ranked(stacked, Seq("feature"), col("v"))
    val vc = col(RankPercentile.ValueCol)
    ranked.groupBy("feature")
      .agg(
        count(lit(1)).as("n"),
        min(vc).as("min_v"), max(vc).as("max_v"),
        graft.util.Cols.sumMoneyBig(vc).as("_s"),
        graft.util.Cols.sumMoneySqBig(vc, vc).as("_s2"),
        RankPercentile.pct(0.25).as("p25"),
        RankPercentile.pct(0.5).as("median"),
        RankPercentile.pct(0.75).as("p75"))
      .withColumn("mean", col("_s") / col("n"))
      .withColumn("std",
        sqrt(col("_s2") / col("n") - (col("_s") / col("n")) * (col("_s") / col("n"))))
      .withColumn("iqr", col("p75") - col("p25"))
      .select("feature", "n", "min_v", "max_v", "mean", "std",
        "p25", "median", "p75", "iqr")
  }

  /** Exact tie-corrected Spearman rank correlation — the monotone-
    * association companion to [[correlation]]'s Pearson: rank both
    * variables with doubled midranks (the rocAuc integer-tie contract),
    * then Pearson over the rank vectors from exact decimal sums — one
    * mirrored IEEE chain, hash-exact. The doubling cancels in the ratio.
    *
    * Scale: per variable one value-grain partial-agged groupBy + one
    * ScalableRank distributed prefix sum + one join-back at value grain;
    * a single 1-row aggregate of decimal products. Constant variables
    * (zero rank variance) report NULL rho instead of trapping. */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rows = df.select(col(xCol).as("_sx"), col(yCol).as("_sy"))
    // Each variable's value-grain midrank table derives from `rows` alone,
    // so both attach to the undecorated rows in one FLAT join chain — the
    // former nested decoration (midranks of midranks) embedded the rows
    // lineage multiplicatively in the plan (89 Exchange nodes at sf0.1).
    // (The delongCompare side-tagged single-prefix-pass trick does NOT
    // apply here: x and y can be different SQL types — double balance vs
    // decimal spend — and the union's type coercion could merge decimal
    // values that a double cannot distinguish, silently changing tie
    // groups relative to the oracle's native-type ranking.)
    def midrankTable(v: String, out: String, key: String): DataFrame = {
      val g = rows.groupBy(col(v).as("_mv")).agg(count(lit(1)).as("_cnt"))
      val c = ScalableRank.withGroupedPrefixSum(
        g, lit(0L), Seq(col("_mv").asc), col("_cnt"), "_cum")
      c.select(col("_mv").as(key),
        (lit(2L) * col("_cum") + col("_cnt") + lit(1L)).as(out))
    }
    val ranked = rows
      .join(midrankTable("_sx", "u2", "_mvx"), col("_sx") === col("_mvx"))
      .drop("_mvx")
      .join(midrankTable("_sy", "v2", "_mvy"), col("_sy") === col("_mvy"))
      .drop("_mvy")
    val d19 = "decimal(19,0)"
    val d38 = "decimal(38,0)"
    val m = ranked.agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("u2").cast(d38)).cast(d38).as("su"),
      sum(col("v2").cast(d38)).cast(d38).as("sv"),
      sum((col("u2").cast(d19) * col("v2")).cast(d38)).cast(d38).as("suv"),
      sum((col("u2").cast(d19) * col("u2")).cast(d38)).cast(d38).as("suu"),
      sum((col("v2").cast(d19) * col("v2")).cast(d38)).cast(d38).as("svv"))
    val nD = col("n").cast("double")
    m
      .withColumn("vx", nD * col("suu").cast("double") -
        col("su").cast("double") * col("su").cast("double"))
      .withColumn("vy", nD * col("svv").cast("double") -
        col("sv").cast("double") * col("sv").cast("double"))
      .withColumn("rho", when(col("vx") > 0.0 && col("vy") > 0.0,
        (nD * col("suv").cast("double") -
          col("su").cast("double") * col("sv").cast("double")) /
          sqrt(col("vx") * col("vy")))
        .otherwise(lit(null).cast("double")))
      .select("n", "rho")
  }
}
