package graft.sim

import breeze.linalg.{svd, DenseMatrix}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orthogonal Procrustes embedding alignment (Schönemann 1966): given
  * PAIRED vectors from two embedding versions (the same documents
  * re-embedded by a new model), find the rotation R minimizing
  * ‖XR − Y‖_F — R = UVᵀ from the SVD of XᵀY. The embedding-migration
  * workhorse: old vectors rotate into the new space so ANN serving and
  * similarity thresholds survive a model upgrade without an atomic
  * full-corpus re-embed (the cross-lingual-alignment construction of
  * Smith et al. 2017, applied to version pairs).
  *
  * Scale shape: the only data pass accumulates the d×d cross-covariance
  * per partition and treeReduces it — O(d²) driver state, corpus-
  * independent (the documented bounded-collect class; the d=64 SVD is
  * microseconds). The rotation broadcasts back as d float-array literals
  * and the alignment itself is d `vec_dot`s per row inside codegen — a
  * map-only pass.
  *
  * Rows-only for the DuckDB gate (the SVD is engine-local linear
  * algebra); ClusteringSpec plants an exact block rotation and binds
  * recovery (residual → 0), orthogonality of R, and determinism.
  */
object Procrustes {

  /** M = XᵀY — one per-partition accumulation pass; the P partial
    * matrices (P × d² doubles, config-bounded driver state) are summed in
    * PARTITION-INDEX order so the float reduction is deterministic across
    * reruns (treeAggregate combines in task-arrival order, which would
    * wobble R's last bits run to run). Column-major buffer feeds breeze
    * directly. */
  private def crossCov(pairs: DataFrame, d: Int): DenseMatrix[Double] = {
    val partials = pairs.select(col("x"), col("y")).rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val m = new Array[Double](d * d)
        it.foreach { row =>
          val x = row.getSeq[Float](0)
          val y = row.getSeq[Float](1)
          var j = 0
          while (j < d) {
            val yj = y(j).toDouble
            var i = 0
            while (i < d) { m(i + j * d) += x(i).toDouble * yj; i += 1 }
            j += 1
          }
        }
        Iterator.single((idx, m))
      }.collect().sortBy(_._1)
    val acc = new Array[Double](d * d)
    partials.foreach { case (_, m) =>
      var i = 0
      while (i < acc.length) { acc(i) += m(i); i += 1 }
    }
    new DenseMatrix(d, d, acc)
  }

  /** The fitted rotation as row-major Array(i)(j) = R_{ij}. */
  def rotation(pairs: DataFrame, d: Int): Array[Array[Double]] = {
    val svd.SVD(u, _, vt) = svd(crossCov(pairs, d))
    val r = u * vt
    Array.tabulate(d, d)((i, j) => r(i, j))
  }

  /** Per-vector alignment report: distance to the new-version vector
    * before and after rotating the old vector — the migration-quality
    * audit. `pairs` needs (vec_id, x array<float>, y array<float>). */
  def alignReport(pairs: DataFrame, d: Int = 64): DataFrame = {
    graft.functions.GraftFunctions.register(pairs.sparkSession)
    val r = rotation(pairs, d)
    // aligned_j = x . R[:, j]: each rotation column ships as a
    // float-array literal into a codegen'd vec_dot — d dots per row,
    // map-only, no UDF
    val aligned = (0 until d).map { j =>
      vecDot(col("x"), array((0 until d).map(i => lit(r(i)(j).toFloat)): _*))
    }
    val distAfter2 = aligned.zipWithIndex.map { case (aj, j) =>
      val diff = aj - element_at(col("y"), j + 1).cast("double")
      diff * diff
    }.reduce(_ + _)
    pairs
      .withColumn("diff_raw", zip_with(col("x"), col("y"), (a, b) => a - b))
      .select(col("vec_id"),
        sqrt(vecDot(col("diff_raw"), col("diff_raw"))).as("dist_before"),
        sqrt(distAfter2).as("dist_after"))
  }

  /** Deterministic "new model" fixture: the old space rotated by an exact
    * block (Givens) rotation over the leading dim pairs — the version
    * pair the registered query aligns, with a KNOWN ground-truth R the
    * spec checks recovery against. Pure column arithmetic, no UDF. */
  def plantedVersionPair(embeddings: DataFrame, d: Int = 64,
      angles: Seq[Double] = Seq(0.3, 0.7, 1.1, 1.9)): DataFrame = {
    val x = col("embedding")
    def e(i: Int) = element_at(x, i + 1)
    val yCols = (0 until d).map { j =>
      val k = j / 2
      if (k < angles.length) {
        val c = lit(math.cos(angles(k)))
        val s0 = lit(math.sin(angles(k)))
        val rotated =
          if (j % 2 == 0) c * e(j) - s0 * e(j + 1)
          else s0 * e(j - 1) + c * e(j)
        rotated.cast("float")
      } else e(j)
    }
    embeddings.select(col("vec_id"), x.as("x"), array(yCols: _*).as("y"))
  }

  /** The ground-truth rotation [[plantedVersionPair]] applies. */
  def plantedRotation(d: Int = 64,
      angles: Seq[Double] = Seq(0.3, 0.7, 1.1, 1.9)): Array[Array[Double]] = {
    val r = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    angles.zipWithIndex.foreach { case (a, k) =>
      val (i, j) = (2 * k, 2 * k + 1)
      r(i)(i) = math.cos(a); r(j)(j) = math.cos(a)
      r(i)(j) = math.sin(a); r(j)(i) = -math.sin(a)
    }
    r
  }

  /** vec_dot over arbitrary child Columns (the SQL-registered path needs
    * column NAMES; the rotation columns here are literals). */
  private def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(graft.functions.FloatVecDot(
      GraftSqlShim.expressionOf(a), GraftSqlShim.expressionOf(b)))
  }
}
