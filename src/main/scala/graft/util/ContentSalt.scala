package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic per-row salting shared by the skew join and the hot-file
  * writer: pmod(xxhash64(hashable columns), n). Backtick-quotes names (a
  * dotted column name would parse as a struct access) and skips MapType
  * columns (xxhash64 rejects maps since Spark 3.0) — the salt needs
  * entropy, not completeness. */
object ContentSalt {
  def apply(df: DataFrame, n: Int): Column = {
    val hashable = df.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(s"`${f.name}`"))
    require(hashable.nonEmpty, "content salt needs at least one hashable column")
    pmod(xxhash64(hashable.toIndexedSeq: _*), lit(n))
  }
}
