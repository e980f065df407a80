package graft.serve

import com.fasterxml.jackson.databind.ObjectMapper
import graft.http.{HttpCall, HttpTarget}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.StringType

/** [[Answerer]] backed by a remote chat-completions HTTP API — the binding
  * the reference's `ChatCompletion.create` call is
  * (`/root/reference/micro-infobot/app.py:246-250`; request/response is the
  * published `POST /v1/chat/completions` contract). The prompt shape
  * mirrors the reference: one system message carrying the retrieved
  * context, one user message carrying the question.
  *
  * Chat completions have no native input batching (one completion per
  * request), so the Spark shape is `mapPartitions` with one POST per row
  * over a pooled per-JVM connection: concurrency = partition count,
  * sequential within a partition, retry/backoff in [[graft.http.HttpCall]].
  * Partition the questions stream to match the service's rate budget —
  * answer generation is driver-free and horizontally scalable exactly like
  * every other operator.
  *
  * COST NOTE (applies to [[graft.embed.HttpEmbedder]] too): the result is
  * lazy like any DataFrame — every action, and even a global `orderBy`
  * (whose range partitioner runs a sampling pass), re-executes the map and
  * re-invokes the remote API. Persist or `localCheckpoint` the result
  * before multi-action use; the paid-API calls are not free to recompute.
  */
class HttpAnswerer(
    val target: HttpTarget,
    val model: String,
    val temperature: Double = 0.0,
    val minIntervalMs: Long = 0L) extends Answerer {

  override def answer(df: DataFrame, questionCol: String, contextCol: String,
      answerCol: String): DataFrame = {
    val outSchema = df.schema.add(answerCol, StringType)
    val qIdx = df.schema.fieldIndex(questionCol)
    val cIdx = df.schema.fieldIndex(contextCol)
    val (t, m, temp, interval) = (target, model, temperature, minIntervalMs)
    df.mapPartitions { rows =>
      val pacer = new graft.http.HttpCall.Pacer(interval)
      rows.map { r =>
        val question = Option(r.getString(qIdx)).getOrElse("")
        val context = Option(r.getString(cIdx)).getOrElse("")
        pacer.pace()
        Row.fromSeq(r.toSeq :+ HttpAnswerer.requestCompletion(t, m, temp, question, context))
      }
    }(Encoders.row(outSchema))
  }
}

object HttpAnswerer {

  private[serve] def requestCompletion(
      target: HttpTarget,
      model: String,
      temperature: Double,
      question: String,
      context: String): String = {
    val om = new ObjectMapper()
    val root = om.createObjectNode()
    root.put("model", model)
    root.put("temperature", temperature)
    val msgs = root.putArray("messages")
    val sys = msgs.addObject()
    sys.put("role", "system")
    sys.put("content", s"Answer using only this context:\n$context")
    val usr = msgs.addObject()
    usr.put("role", "user")
    usr.put("content", question)
    val resp = om.readTree(HttpCall.postJson(target, om.writeValueAsString(root)))
    val choices = resp.get("choices")
    require(choices != null && choices.isArray && choices.size() > 0,
      "chat response carries no choices")
    val content = choices.get(0).path("message").path("content")
    require(!content.isMissingNode, "chat response choice has no message.content")
    content.asText()
  }
}
