package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Embedding quantization for memory-bound similarity search.
 *
 * At 100 TB the embedding table, not the text, dominates storage and
 * shuffle: 64-dim float32 is 256 B/row; symmetric int8 cuts that 4× with
 * ~1e-3 cosine error, which is why every production ANN index (IVF-PQ,
 * ScaNN, FAISS SQ8) quantizes before it shards. This operator is the
 * storage/shuffle-side companion to [[Similarity]]'s index builders.
 *
 * Per-vector symmetric scheme: `scale = max|v| / 127`,
 * `q_i = round(v_i / scale)` ∈ [−127, 127]. Dequantization is `q_i · scale`,
 * and cosine against the dequantized vector equals cosine against `q`
 * directly (the scale cancels), so re-ranking can run on int8 alone.
 * Everything is expressible in codegen'd array expressions — no UDF, no
 * shuffle, runs inside the scan stage.
 */
object Quantization {

  private def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** max|v_i| / 127 as DOUBLE (0.0 only for the all-zero vector). */
  def int8Scale(vec: Column): Column =
    array_max(transform(toDouble(vec), x => abs(x))) / 127.0

  /** q = round(v / scale) as ARRAY<INT> in [−127, 127]; the all-zero vector
    * quantizes to all-zero (guarded division). */
  def int8Quantize(vec: Column, scale: Column): Column =
    transform(toDouble(vec), x =>
      when(scale === 0.0, lit(0)).otherwise(round(x / scale, 0).cast("int")))

  /**
   * Quantize `vecCol`, keeping id, scale, the int8 codes, and the
   * reconstruction cosine (original vs dequantized — the quality metric a
   * pipeline gates on before swapping its index to int8).
   *
   * @return (idCol, scale DOUBLE, qvec ARRAY<INT>, recon_cos DOUBLE)
   */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val scale = int8Scale(col(vecCol))
    val q = int8Quantize(col(vecCol), scale)
    df.select(col(idCol), col(vecCol), scale.as("scale"), q.as("qvec"))
      .select(col(idCol), col("scale"), col("qvec"),
        // the zero vector reconstructs exactly (and its cosine would be 0/0)
        when(col("scale") === 0.0, lit(1.0))
          .otherwise(Similarity.cosineHof(col(vecCol), col("qvec")))
          .as("recon_cos"))
  }
}
