package graft

import graft.text.TextOps

/** Dedup/text-analysis operators on hand-computable fixtures plus the real
  * documents table (planted near-dups at 5-gram Jaccard ≥ 0.9, TESTDATA.md). */
class TextSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),    // near-dup of 1
    (3L, "totally different words appear in this one here"),
    (4L, "the quick brown fox jumps over the lazy dog"),    // exact dup of 1
    (5L, "short text")                                      // < 5 words: no shingles
  ).toDF("doc_id", "text")

  test("shingles: n-grams, distinct, short docs dropped") {
    val sh = TextOps.shingles(docs, "doc_id", "text", 5)
    val byDoc = sh.groupBy("doc_id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDoc == Map(1L -> 5, 2L -> 5, 3L -> 4, 4L -> 5)) // 9 words → 5 5-grams
    assert(sh.filter($"doc_id" === 1 && $"shingle" === "the quick brown fox jumps").count() == 1)
  }

  test("exact dedup groups identical normalized text") {
    val d = TextOps.dedupExact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(d == Set((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L))) // doc1+4 merged
  }

  test("jaccard pairs finds the near-dup, not the unrelated doc") {
    val pairs = TextOps.jaccardPairs(docs, "doc_id", "text", 5, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 4L), (2L, 4L)))
    // doc1 vs doc2: 9 words, 5 shingles each, 4 shared → 4/6
    val j = TextOps.jaccardPairs(docs, "doc_id", "text", 5, 0.3)
      .filter($"a" === 1 && $"b" === 2).collect()(0).getDouble(2)
    assert(math.abs(j - 4.0 / 6.0) < 1e-6)
  }

  test("minhash and simhash dedup match exhaustive jaccard on documents table") {
    val documents = spark.read.parquet(s"$SF/documents.parquet")
    val exhaustive = TextOps.jaccardPairs(documents, "doc_id", "text", 5, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val minhash = TextOps.minhashDedup(documents, "doc_id", "text")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(minhash == exhaustive)
    val simhash = TextOps.simhashDedup(documents, "doc_id", "text")
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simhash == exhaustive)
    assert(exhaustive.nonEmpty) // the data has planted near-dups
  }

  test("dedup scratch caches are released after the first materializing action") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val result = TextOps.minhashDedup(docs, "doc_id", "text", threshold = 0.3)
    result.select("a", "b").count() // first action: cache serves the 3 scans
    // the release listener fires async on the listener bus — poll briefly
    val deadline = System.currentTimeMillis() + 20000
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    assert(leaked.isEmpty, s"shingle cache not released: RDDs $leaked")
    // a second action still computes the same (uncached) result
    assert(result.count() == 3)
  }

  test("token counts, quality, langid, fingerprint are deterministic projections") {
    val tc = TextOps.tokenCounts(docs, "doc_id", "text")
      .filter($"doc_id" === 1).collect()(0)
    assert(tc.getLong(1) == 9 && tc.getLong(2) == 9)
    val q = TextOps.qualityScore(docs, "doc_id", "text").filter($"doc_id" === 1).collect()(0)
    assert(q.getDouble(q.fieldIndex("alpha_ratio")) > 0.7)
    val lid = TextOps.langId(docs, "doc_id", "text").filter($"doc_id" === 1).collect()(0)
    assert(lid.getString(1) == "en") // 'the' twice
    val fp = TextOps.fingerprint(docs, "doc_id", "text")
    // exact dups share a fingerprint
    assert(fp.filter($"doc_id".isin(1L, 4L)).select("fp").distinct().count() == 1)
  }
}
