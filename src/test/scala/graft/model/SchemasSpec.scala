package graft.model

import graft.SparkSpec
import graft.index.VectorIndex

class SchemasSpec extends SparkSpec {
  import spark.implicits._

  test("index rows round-trip through the typed IndexedChunk encoder") {
    val docs = Seq((1L, "TITLE HERE\n\nsome paragraph content")).toDF("doc_id", "text")
    val typed = VectorIndex.build(docs).as[IndexedChunk].collect()
    assert(typed.nonEmpty)
    assert(typed.head.section == "TITLE HERE")
    assert(typed.head.embedding.length == 64)
  }

  test("session turns and chat messages encode as Datasets") {
    val turns = Seq(SessionTurn("s1", 0, "user", "hi")).toDS()
    assert(turns.schema.fieldNames.toSeq ==
      Seq("session_id", "turn", "role", "content"))
    val usage = Seq(UsageRecord(100, 50, 150, 100 * 1e-5 + 50 * 3e-5)).toDS()
    assert(usage.head().total_tokens == 150)
  }
}
