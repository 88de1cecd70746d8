package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-vector symmetric int8 embedding quantization — the storage axis of
  * an embedding lakehouse at 100 TB: float32 vectors are dim·4 bytes/row;
  * int8 codes + one float scale are dim + 8. The 4× cut compounds with
  * every downstream scan (ANN candidate generation reads codes, not
  * floats — the same architecture as the PQ path, but rank-preserving
  * per-element rather than codebook-trained, so it needs NO training pass
  * and dequantizes losslessly enough for recall-insensitive stages).
  *
  * Scheme: scale = max|x|/127 (symmetric, zero-point-free — dot products
  * against int8 stay a single fused multiply by scale); code =
  * clamp(⌊x/scale + ½⌋, ±127). Quantization is per-row math — no shuffle,
  * fully codegen'd, and every expression below is written in the
  * engine-portable single-list-lambda form (no zip), so the DuckDB oracle
  * evaluates the IDENTICAL arithmetic and the gate is hash-exact, unlike
  * the trained PQ/IVF paths.
  *
  * Output pins the full code vector through scalar aggregates (sum,
  * |sum|, min/max) plus the two fidelity metrics that matter downstream:
  * worst-case per-element error (≤ scale/2 by construction — the test
  * contract) and the cosine between the vector and its dequantization.
  */
object Quantize {

  /** SQL snippet for the code of element `x` given outer column `scale`
    * — shared verbatim between the Spark plan and the DuckDB oracle so
    * both engines run bit-identical double arithmetic. */
  private def codeOf(x: String): String =
    s"greatest(-127.0, least(127.0, floor(CAST($x AS DOUBLE) / scale + 0.5)))"

  def int8Summary(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("max_abs", expr(
        "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .withColumn("scale", expr(
        "CASE WHEN max_abs / 127.0 = 0 THEN 1.0 ELSE max_abs / 127.0 END"))
      .withColumn("code_sum", expr(
        s"aggregate(transform(embedding, x -> CAST(${codeOf("x")} AS BIGINT)), 0L, (a, b) -> a + b)"))
      .withColumn("code_abs_sum", expr(
        s"aggregate(transform(embedding, x -> abs(CAST(${codeOf("x")} AS BIGINT))), 0L, (a, b) -> a + b)"))
      .withColumn("code_min", expr(
        s"array_min(transform(embedding, x -> CAST(${codeOf("x")} AS BIGINT)))"))
      .withColumn("code_max", expr(
        s"array_max(transform(embedding, x -> CAST(${codeOf("x")} AS BIGINT)))"))
      .withColumn("max_abs_err", expr(
        s"array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE) - scale * ${codeOf("x")})))"))
      .withColumn("cos_self", expr(
        s"""aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * scale * ${codeOf("x")}), 0.0D, (a, b) -> a + b)
           | / (sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (a, b) -> a + b))
           |    * sqrt(aggregate(transform(embedding, x -> (scale * ${codeOf("x")}) * (scale * ${codeOf("x")})), 0.0D, (a, b) -> a + b)))""".stripMargin))
      .select("vec_id", "label", "scale", "code_sum", "code_abs_sum",
        "code_min", "code_max", "max_abs_err", "cos_self")

  /** Brute-force cosine top-k over the DEQUANTIZED int8 corpus — the
    * measurement query for the storage axis: what does search look like
    * when the corpus is stored as codes+scale (dim+8 bytes/row) instead
    * of float32 (4·dim)? Reconstruction is row-local codegen math
    * (scale·code rounded to FLOAT — the IEEE rounding is identical in
    * both engines, so unlike the trained PQ path this search is
    * hash-exact against the oracle); scoring reuses the native `vec_dot`
    * expression and the two-phase topK cut. At 100 TB this path reads 4×
    * fewer bytes than float brute for a ~1e-3 cosine perturbation
    * (EvalDriftSpec pins recall vs the float golden set).
    */
  def knnInt8(embeddings: DataFrame, numQueries: Int = 5, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.register(embeddings.sparkSession)
    val dq = embeddings
      .select(col("vec_id"), col("label"), col("embedding"))
      .withColumn("max_abs", expr(
        "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .withColumn("scale", expr(
        "CASE WHEN max_abs / 127.0 = 0 THEN 1.0 ELSE max_abs / 127.0 END"))
      .withColumn("dq", expr(
        s"transform(embedding, x -> CAST(scale * ${codeOf("x")} AS FLOAT))"))
      .select(col("vec_id"), col("label"), col("dq"))
      .withColumn("nrm", sqrt(expr("vec_dot(dq, dq)")))
    val queries = dq.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("dq").as("qv"),
        col("nrm").as("q_nrm"))
    val scored = dq
      .join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("cos_sim", expr("vec_dot(qv, dq)") / (col("q_nrm") * col("nrm")))
    Similarity.topK(scored, k).select("query_id", "rank", "vec_id", "label", "cos_sim")
  }

  /** The dequantized-corpus CTE fragment of the knnInt8 oracle (DuckDB
    * list dialect, same arithmetic). */
  def dequantCteSql: String =
    s"""WITH base AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
       |  FROM embeddings
       |), scaled AS (
       |  SELECT vec_id, label, embedding,
       |    CASE WHEN max_abs / 127.0 = 0 THEN 1.0 ELSE max_abs / 127.0 END AS scale
       |  FROM base
       |), dqt AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(scale * ${codeOf("x")} AS FLOAT)) AS dq
       |  FROM scaled
       |)""".stripMargin

  /** DuckDB mirror: same per-element arithmetic via list_transform /
    * list_reduce (list_reduce seeds from the first element; 0.0 + x ≡ x
    * in IEEE double, so the fold matches Spark's aggregate-with-init). */
  def int8OracleSql: String = {
    def code(x: String): String = codeOf(x)
    s"""WITH base AS (
       |  SELECT vec_id, label, embedding,
       |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS max_abs
       |  FROM embeddings
       |), scaled AS (
       |  SELECT vec_id, label, embedding,
       |    CASE WHEN max_abs / 127.0 = 0 THEN 1.0 ELSE max_abs / 127.0 END AS scale
       |  FROM base
       |)
       |SELECT vec_id, label, scale,
       |  list_reduce(list_transform(embedding, x -> CAST(${code("x")} AS BIGINT)), (a, b) -> a + b) AS code_sum,
       |  list_reduce(list_transform(embedding, x -> abs(CAST(${code("x")} AS BIGINT))), (a, b) -> a + b) AS code_abs_sum,
       |  list_min(list_transform(embedding, x -> CAST(${code("x")} AS BIGINT))) AS code_min,
       |  list_max(list_transform(embedding, x -> CAST(${code("x")} AS BIGINT))) AS code_max,
       |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE) - scale * ${code("x")}))) AS max_abs_err,
       |  list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * scale * ${code("x")}), (a, b) -> a + b)
       |    / (sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
       |       * sqrt(list_reduce(list_transform(embedding, x -> (scale * ${code("x")}) * (scale * ${code("x")})), (a, b) -> a + b))) AS cos_self
       |FROM scaled
       |ORDER BY vec_id""".stripMargin
  }
}
