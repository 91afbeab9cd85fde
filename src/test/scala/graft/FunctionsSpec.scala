package graft

import graft.functions.{GraftExtensions, VectorFunctions}
import org.apache.spark.sql.SparkSession

/**
 * SQL surface for the native vector expressions: the session-level
 * `VectorFunctions.register` path and the cluster-level
 * `SparkSessionExtensions` hook (`spark.sql.extensions=graft.functions
 * .GraftExtensions`) — both must make `vec_dot`/`vec_cosine` callable from
 * plain SQL with the same codegen'd expressions the Column API uses.
 */
class FunctionsSpec extends SparkSpec {

  test("register: vec_dot / vec_cosine callable from SQL on a live session") {
    VectorFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
      "vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("extensions hook: a fresh session built with GraftExtensions resolves the functions") {
    // the builder only applies withExtensions when it BUILDS a session, so
    // drop the active/default registrations (the SparkContext is reused),
    // build one with the hook, and restore the shared session after
    val old = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions()(_))
        .getOrCreate()
      assert(s2 ne old) // genuinely a new session, same context
      val r = s2.sql(
        "SELECT vec_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d").collect()(0)
      assert(r.getDouble(0) == 23.0)
      assert(s2.catalog.functionExists("vec_dot"))
    } finally {
      SparkSession.setDefaultSession(old)
      SparkSession.setActiveSession(old)
    }
  }

  test("SQL form matches the Column API form on real float embeddings") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$SF/embeddings.parquet").limit(20).cache()
    emb.createOrReplaceTempView("emb_fn_spec")
    val viaSql = spark.sql(
      "SELECT a.vec_id AS i, b.vec_id AS j, vec_cosine(a.embedding, b.embedding) AS s " +
      "FROM emb_fn_spec a JOIN emb_fn_spec b ON a.vec_id < b.vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val viaCol = emb.as("a").join(emb.as("b"),
        org.apache.spark.sql.functions.col("a.vec_id") < org.apache.spark.sql.functions.col("b.vec_id"))
      .select(org.apache.spark.sql.functions.col("a.vec_id"),
        org.apache.spark.sql.functions.col("b.vec_id"),
        graft.ml.Similarity.cosine(
          org.apache.spark.sql.functions.col("a.embedding"),
          org.apache.spark.sql.functions.col("b.embedding")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(viaSql == viaCol) // bit-identical, not approximately equal
  }
}
