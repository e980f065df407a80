package graft.embed

import com.fasterxml.jackson.databind.ObjectMapper
import graft.http.{HttpCall, HttpTarget}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType}

/** [[Embedder]] backed by a remote embeddings HTTP API — the binding the
  * reference's `OpenAIEmbeddings` call is
  * (`/root/reference/micro-infobot/app.py:122`; the request/response shape
  * is the published `POST /v1/embeddings` contract: `{"model", "input":
  * [texts]}` → `{"data": [{"index", "embedding"}]}`).
  *
  * Spark-side shape (the part that must scale):
  *  - `mapPartitions`, one output row per input row, schema = input schema
  *    plus `outCol ARRAY<FLOAT>` — identical column contract to the offline
  *    embedders, so every downstream operator (index build, kNN, ANN,
  *    dedup) is unaware the vectors came from a remote service.
  *  - texts stream through in bounded `batchSize` groups (one POST each):
  *    constant executor memory, bounded request payloads, and the API's
  *    native input batching amortizes per-request overhead.
  *  - requests are sequential WITHIN a partition, so total concurrency
  *    against the remote service = partition count. Repartition the input
  *    to match the service's rate budget; retries/backoff live in
  *    [[graft.http.HttpCall]].
  *
  * Responses are matched back by the API's `index` field, not response
  * order. A response missing an index or with a wrong-dimension vector
  * fails the task loudly — silently zero-filling would poison the index.
  */
class HttpEmbedder(
    val target: HttpTarget,
    val model: String,
    val dims: Int,
    val batchSize: Int = 64,
    val minIntervalMs: Long = 0L) extends Embedder {

  require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")

  override def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val outSchema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val textIdx = df.schema.fieldIndex(textCol)
    val (t, m, d, bs, interval) = (target, model, dims, batchSize, minIntervalMs)
    df.mapPartitions { rows =>
      val pacer = new graft.http.HttpCall.Pacer(interval)
      rows.grouped(bs).flatMap { batch =>
        // null text has no meaningful embedding and most APIs reject it;
        // send "" so row alignment (index i ↔ batch(i)) is preserved
        val texts = batch.map(r => Option(r.getString(textIdx)).getOrElse(""))
        pacer.pace()
        val vecs = HttpEmbedder.requestEmbeddings(t, m, d, texts)
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(outSchema))
  }
}

object HttpEmbedder {

  /** One POST for a bounded batch of texts; returns vectors in input order. */
  private[embed] def requestEmbeddings(
      target: HttpTarget,
      model: String,
      dims: Int,
      texts: Seq[String]): Seq[Array[Float]] = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("model", model)
    val input = root.putArray("input")
    texts.foreach(input.add)
    val resp = om.readTree(HttpCall.postJson(target, om.writeValueAsString(root)))
    val data = resp.get("data")
    require(data != null && data.isArray && data.size() == texts.size,
      s"embeddings response carries ${if (data == null) "no" else data.size()} " +
        s"rows for ${texts.size} inputs")
    val out = new Array[Array[Float]](texts.size)
    data.forEach { item =>
      val idx = item.get("index").asInt()
      val emb = item.get("embedding")
      require(emb != null && emb.size() == dims,
        s"embedding at index $idx has ${if (emb == null) 0 else emb.size()} " +
          s"dims, expected $dims")
      val v = new Array[Float](dims)
      var i = 0
      while (i < dims) { v(i) = emb.get(i).floatValue(); i += 1 }
      require(out(idx) == null, s"duplicate index $idx in embeddings response")
      out(idx) = v
    }
    require(!out.contains(null), "embeddings response is missing input indexes")
    out.toSeq
  }
}
