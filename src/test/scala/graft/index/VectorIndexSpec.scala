package graft.index

import graft.SparkSpec

class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(ids: Range) = ids.map { i =>
    val section = if (i % 2 == 0) "SECTION ALPHA" else "SECTION BETA"
    (i.toLong, s"$section\n\nparagraph about topic $i with enough words to survive chunking")
  }.toDF("doc_id", "text")

  test("append adds only new chunks, idempotently") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx_append").toString + "/idx"
    val base = docs(0 until 20)
    val embedder = VectorIndex.fit(base)
    VectorIndex.write(VectorIndex.buildWith(base, embedder), path)
    val n0 = VectorIndex.load(spark, path).count()

    val delta = docs(15 until 30) // 5 already-indexed docs + 10 new
    val appended = VectorIndex.append(spark, delta, path, embedder)
    val after = VectorIndex.load(spark, path)
    assert(after.count() == n0 + appended)
    val expectedNew = VectorIndex.buildWith(docs(20 until 30), embedder).count()
    assert(appended == expectedNew,
      s"overlapping docs must contribute nothing: $appended vs $expectedNew")
    assert(after.select("chunk_id").distinct().count() == after.count())
    // idempotent: re-appending the same delta is a no-op
    assert(VectorIndex.append(spark, delta, path, embedder) == 0L)
  }

  test("append embeds the delta in the ORIGINAL corpus space") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx_space").toString + "/idx"
    val base = docs(0 until 10)
    val embedder = VectorIndex.fit(base)
    VectorIndex.write(VectorIndex.buildWith(base, embedder), path)
    VectorIndex.append(spark, docs(10 until 12), path, embedder)
    // doc 0's rows re-built standalone with the same fitted embedder must
    // equal what the index holds — same IDF statistics, same space
    val fromIndex = VectorIndex.load(spark, path)
      .where($"doc_id" === 0).select("chunk_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val rebuilt = VectorIndex.buildWith(docs(0 until 1), embedder)
      .select("chunk_id", "embedding")
      .as[(Long, Seq[Float])].collect().toMap
    assert(fromIndex == rebuilt)
  }

  test("append refuses an embedder with mismatched dimensions") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx_dims").toString + "/idx"
    val base = docs(0 until 10)
    val embedder64 = VectorIndex.fit(base)
    VectorIndex.write(VectorIndex.buildWith(base, embedder64), path)
    val embedder16 = new graft.embed.HashingTfIdfEmbedder(16)
      .fit(graft.transform.Chunker.chunk(
        graft.transform.Sectionizer.sectionize(base)), "chunk")
    val e = intercept[IllegalArgumentException] {
      VectorIndex.append(spark, docs(10 until 12), path, embedder16)
    }
    assert(e.getMessage.contains("64-d"))
  }

  test("first append onto a missing path bootstraps the index") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_idx_boot").toString + "/fresh"
    val d = docs(0 until 5)
    val embedder = VectorIndex.fit(d)
    val n = VectorIndex.append(spark, d, path, embedder)
    assert(n > 0)
    assert(VectorIndex.load(spark, path).count() == n)
  }
}
