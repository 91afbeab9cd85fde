package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity operators: exact cosine, brute-force top-k, near-dup
 * pairs, and a random-hyperplane-LSH bucketed variant as the 100 TB path.
 *
 * All arithmetic is double precision (float arrays are upcast before any
 * accumulation) and folds left-to-right, so results are bit-reproducible
 * and comparable against DuckDB's double-precision list functions.
 */
object Similarity {

  /** Σ aᵢbᵢ over two ARRAY<FLOAT/DOUBLE> columns, in double — fused codegen
    * loop (graft.functions.DotProduct). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — fused codegen loop (graft.functions.CosineSimilarity);
    * same double op sequence as [[cosineHof]], so results are bit-identical. */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorFunctions.vecCosine(a, b)

  /** The composable higher-order-function form — kept as the reference
    * semantics the native expressions must match (see SimilaritySpec). */
  def cosineHof(a: Column, b: Column): Column = {
    def hofDot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    def hofNorm(x: Column): Column =
      sqrt(aggregate(transform(x, v => v.cast("double") * v.cast("double")),
        lit(0.0), (acc, v) => acc + v))
    hofDot(a, b) / (hofNorm(a) * hofNorm(b))
  }

  /**
   * Brute-force cosine top-k: every query row against every corpus row.
   * The per-query candidate set is ranked by (rounded sim desc, id asc) —
   * rounding before ranking makes the order stable across engines and
   * float-summation orders.
   *
   * Scale note: this is the *baseline*; it broadcasts the query set (small)
   * against the corpus scan, so it is one pass over the corpus with no
   * shuffle of the corpus itself — correct at 100 TB when |queries| is
   * bounded. For large query sets use [[lshKnn]].
   */
  def bruteForceKnn(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * Near-duplicate pairs by cosine ≥ threshold. Baseline shape is the
   * block-nested self-join; the LSH variant below is the scale path.
   */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("a"), col("embedding").as("ea"))
    val b = corpus.select(col("vec_id").as("b"), col("embedding").as("eb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("ea"), col("eb")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /**
   * Random-hyperplane LSH signature: bit b = sign(v · h_b) where hyperplane
   * components are deterministic pseudo-randoms derived from xxhash64(b, dim)
   * mapped to [-1, 1]. Vectors in the same `numBits`-bit bucket are near in
   * angle with high probability.
   */
  def lshBucket(emb: Column, dim: Int, numBits: Int, seed: Int = 0): Column = {
    // Hyperplanes are driver-side deterministic constants (seeded LCG), shipped
    // as array literals: the per-row work is numBits fused zip_with folds, not
    // numBits×dim unrolled expressions (which overflowed janino codegen).
    val rnd = new scala.util.Random(seed * 7919L + 13L)
    val bits = (0 until numBits).map { b =>
      val hp = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      val proj = dot(emb, typedLit(hp))
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /**
   * IVF (inverted-file) ANN. Coarse quantizer = `numCells` corpus vectors
   * picked by deterministic hash-order sampling (a one-pass stand-in for an
   * offline k-means; swapping in trained centroids changes no plan shape).
   * Index build: one pass over the corpus against the broadcast centroid
   * set, assigning each vector to its nearest cell → an inverted list
   * shuffled by cell id. Query: rank cells per query, probe the `nprobe`
   * nearest, exact cosine only within probed cells.
   *
   * Scale: the corpus is never self-joined — it is scanned once for
   * assignment (broadcast, no shuffle of the corpus) and once per probe
   * via a cell-keyed equi-join, so cost is O(|corpus| · nprobe / numCells)
   * candidates instead of O(|corpus| · |queries|).
   */
  def ivfAssign(corpus: DataFrame, numCells: Int): DataFrame = {
    val centroids = corpus
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(numCells)
      .select(monotonically_increasing_id().as("cell"), col("embedding").as("c_emb"))
    val ranked = corpus.crossJoin(broadcast(centroids))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(cosine(col("embedding"), col("c_emb")), 6).as("c_sim"))
    val w = Window.partitionBy("vec_id").orderBy(col("c_sim").desc, col("cell").asc)
    ranked.withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("cell"), col("vec_id"), col("embedding"))
  }

  def ivfKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             numCells: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = corpus
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(numCells)
      .select(monotonically_increasing_id().as("cell"), col("embedding").as("c_emb"))
    val inverted = ivfAssign(corpus, numCells)
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val qw = Window.partitionBy("q_id").orderBy(col("c_sim").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("cell"),
        round(cosine(col("q_emb"), col("c_emb")), 6).as("c_sim"))
      .withColumn("rk", row_number().over(qw)).filter(col("rk") <= nprobe)
      .select("q_id", "q_emb", "cell")
    val scored = probed.join(inverted, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /**
   * LSH-bucketed ANN top-k: candidates restricted to vectors sharing any of
   * several hash-table buckets, then exact cosine rank within candidates.
   * Shuffle is by bucket key — no cross join, the 100 TB path.
   */
  def lshKnn(corpus: DataFrame, queries: DataFrame, k: Int,
             dim: Int, numBits: Int = 12, tables: Int = 4): DataFrame = {
    def withBuckets(df: DataFrame, idAs: String, embAs: String): DataFrame =
      df.select(col("vec_id").as(idAs), col("embedding").as(embAs),
        posexplode(array((0 until tables).map(t =>
          lshBucket(col("embedding"), dim, numBits, seed = t)): _*))
          .as(Seq("table", "bucket")))
    // table offset folded into the bucket: join key is (table, bucket)
    val cb = withBuckets(corpus, "vec_id", "emb")
    val qb = withBuckets(queries, "q_id", "q_emb")
    val cands = qb.join(cb, Seq("table", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "q_emb", "vec_id", "emb").distinct()
    val scored = cands.select(col("q_id"), col("vec_id"),
      round(cosine(col("q_emb"), col("emb")), 6).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
