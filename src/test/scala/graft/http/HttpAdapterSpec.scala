package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import graft.embed.HttpEmbedder
import graft.serve.HttpAnswerer
import org.apache.spark.sql.functions._

/** The HTTP adapters against an in-JVM stub server speaking the published
  * embeddings / chat-completions JSON contract: batching, row alignment,
  * retry-on-transient, fail-fast-on-4xx, auth-header resolution, and the
  * Spark plumbing (schema, partition-bounded concurrency) — everything
  * except the remote service itself, which is exactly the point of the
  * trait seam.
  */
class HttpAdapterSpec extends SparkSpec {
  import spark.implicits._

  private val om = new ObjectMapper()

  /** Deterministic fake embedding the test can recompute independently. */
  private def fakeVec(text: String, dims: Int): Array[Float] = {
    val v = new Array[Float](dims)
    v(0) = text.length.toFloat
    var i = 1
    while (i < dims) { v(i) = ((text.hashCode >>> (i % 24)) % 7).toFloat; i += 1 }
    v
  }

  private val embedRequests = new AtomicInteger(0)
  private val chatRequests = new AtomicInteger(0)
  private val failuresToServe = new AtomicInteger(0)
  @volatile private var lastAuthHeader: Option[String] = None
  private val Dims = 8

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/v1/embeddings", (ex: HttpExchange) => {
      embedRequests.incrementAndGet()
      lastAuthHeader = Option(ex.getRequestHeaders.getFirst("Authorization"))
      if (failuresToServe.getAndUpdate(n => math.max(0, n - 1)) > 0)
        respond(ex, 500, """{"error":"transient"}""")
      else {
        val input = om.readTree(readBody(ex)).get("input")
        val root = om.createObjectNode()
        val data = root.putArray("data")
        // respond in REVERSE order: clients must align by the index field,
        // not by response position
        for (i <- (input.size() - 1) to 0 by -1) {
          val item = data.addObject()
          item.put("index", i)
          val emb = item.putArray("embedding")
          fakeVec(input.get(i).asText(), Dims).foreach(emb.add)
        }
        respond(ex, 200, om.writeValueAsString(root))
      }
    })
    s.createContext("/v1/chat/completions", (ex: HttpExchange) => {
      chatRequests.incrementAndGet()
      val req = om.readTree(readBody(ex))
      val msgs = req.get("messages")
      val sysMsg = msgs.get(0).get("content").asText()
      val userMsg = msgs.get(1).get("content").asText()
      val root = om.createObjectNode()
      val choice = root.putArray("choices").addObject()
      choice.putObject("message")
        .put("role", "assistant")
        .put("content", s"A[$userMsg|ctxlen=${sysMsg.length}]")
      respond(ex, 200, om.writeValueAsString(root))
    })
    s.createContext("/v1/always400", (ex: HttpExchange) =>
      respond(ex, 400, """{"error":"bad request"}"""))
    s.start()
    s
  }

  private def target(path: String, keyName: Option[String] = None) = HttpTarget(
    endpoint = s"http://127.0.0.1:${server.getAddress.getPort}$path",
    apiKeyName = keyName, maxRetries = 3, backoffBaseMs = 1L)

  test("HttpEmbedder: batched requests, index-aligned vectors, schema plus ARRAY<FLOAT>") {
    embedRequests.set(0)
    val df = (1 to 10).map(i => (i.toLong, s"document text number $i"))
      .toDF("id", "chunk").repartition(1)
    val embedder = new HttpEmbedder(target("/v1/embeddings"), "fake-model", Dims, batchSize = 4)
    val out = embedder.embed(df, "chunk", "embedding")
    assert(out.schema.fieldNames.toSeq == Seq("id", "chunk", "embedding"))
    val rows = out.select($"id", $"chunk", $"embedding").as[(Long, String, Array[Float])]
      .collect().sortBy(_._1)
    assert(rows.length == 10)
    rows.foreach { case (_, text, vec) =>
      assert(vec.toSeq == fakeVec(text, Dims).toSeq, s"misaligned vector for '$text'")
    }
    // 10 rows / batchSize 4 in one partition = ceil(10/4) = 3 POSTs
    assert(embedRequests.get() == 3, s"expected 3 batched requests, saw ${embedRequests.get()}")
  }

  test("HttpEmbedder: transient 500s are retried, result unchanged") {
    failuresToServe.set(2)
    val df = Seq((1L, "retry me")).toDF("id", "chunk")
    val out = new HttpEmbedder(target("/v1/embeddings"), "fake-model", Dims)
      .embed(df, "chunk", "embedding")
      .select($"embedding").as[Array[Float]].head()
    assert(out.toSeq == fakeVec("retry me", Dims).toSeq)
    assert(failuresToServe.get() == 0, "server must have consumed the injected failures")
  }

  test("HttpEmbedder: non-transient 4xx fails fast (no retry burn)") {
    val df = Seq((1L, "doomed")).toDF("id", "chunk")
    val before = embedRequests.get()
    val e = intercept[Exception] {
      new HttpEmbedder(target("/v1/always400"), "fake-model", Dims)
        .embed(df, "chunk", "embedding").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("HTTP 400"))),
      s"expected HTTP 400 in cause chain, got: ${chain(e).map(_.getMessage)}")
    assert(embedRequests.get() == before, "4xx endpoint is separate; embeddings saw no call")
  }

  test("HttpEmbedder: api key resolves executor-side, never in the closure") {
    sys.props("GRAFT_TEST_API_KEY") = "sk-test-123"
    try {
      lastAuthHeader = None
      val df = Seq((1L, "authed")).toDF("id", "chunk")
      new HttpEmbedder(target("/v1/embeddings", Some("GRAFT_TEST_API_KEY")),
        "fake-model", Dims).embed(df, "chunk", "embedding").collect()
      assert(lastAuthHeader.contains("Bearer sk-test-123"))
    } finally sys.props.remove("GRAFT_TEST_API_KEY")
  }

  test("minIntervalMs paces consecutive requests within a partition") {
    val times = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    server.createContext("/v1/paced", (ex: HttpExchange) => {
      times.add(System.nanoTime())
      om.readTree(readBody(ex)) // drain
      val root = om.createObjectNode()
      val data = root.putArray("data")
      val item = data.addObject()
      item.put("index", 0)
      val e = item.putArray("embedding")
      (0 until Dims).foreach(_ => e.add(0.0))
      respond(ex, 200, om.writeValueAsString(root))
    })
    val df = (1 to 3).map(i => (i.toLong, s"t$i")).toDF("id", "chunk").repartition(1)
    new HttpEmbedder(target("/v1/paced"), "fake-model", Dims,
      batchSize = 1, minIntervalMs = 120)
      .embed(df, "chunk", "embedding").collect()
    val ts = times.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
    assert(ts.length == 3)
    val gapsMs = ts.sliding(2).map(w => (w(1) - w(0)) / 1e6).toSeq
    // generous slack: scheduling jitter may stretch gaps, never shrink
    // them below the pacer's floor
    assert(gapsMs.forall(_ >= 90.0), s"request gaps must be paced, got $gapsMs ms")
  }

  test("HttpAnswerer: one request per row, prompt carries question and context") {
    chatRequests.set(0)
    val df = Seq(
      (0L, "what is the total?", "ctx: totals table"),
      (1L, "who supplies part 7?", "ctx: supplier list"))
      .toDF("query_id", "question", "context")
    // sort DRIVER-side: a global orderBy on the lazy result would run the
    // range-partitioner's sampling pass over the mapPartitions, invoking
    // the remote API twice per row (see the Answerer scaladoc note)
    val out = new HttpAnswerer(target("/v1/chat/completions"), "fake-chat")
      .answer(df, "question", "context")
      .select($"query_id", $"answer").as[(Long, String)].collect()
      .sortBy(_._1).map(_._2)
    assert(out(0) == s"A[what is the total?|ctxlen=${"Answer using only this context:\nctx: totals table".length}]")
    assert(out(1).startsWith("A[who supplies part 7?|"))
    assert(chatRequests.get() == 2)
  }

  test("HttpReranker: per-query scoring, index-aligned, 1e-6 grid") {
    // deterministic stub: relevance = shared-token count / 10, served in
    // REVERSE order so alignment must come from the index field
    server.createContext("/v1/rerank", (ex: HttpExchange) => {
      val req = om.readTree(readBody(ex))
      val q = req.get("query").asText().split(" ").toSet
      val docs = req.get("documents")
      val root = om.createObjectNode()
      val results = root.putArray("results")
      for (i <- (docs.size() - 1) to 0 by -1) {
        val r = results.addObject()
        r.put("index", i)
        r.put("relevance_score",
          docs.get(i).asText().split(" ").count(q.contains) / 10.0)
      }
      respond(ex, 200, om.writeValueAsString(root))
    })
    val pairs = Seq(
      (1L, "alpha beta", "alpha beta gamma"), // 2 shared -> 0.2
      (1L, "alpha beta", "zzz yyy"), //          0 shared -> 0.0
      (2L, "delta", "delta delta")) //           2 shared -> 0.2
      .toDF("query_id", "query_text", "text").repartition(1)
    val rr = new graft.serve.HttpReranker(target("/v1/rerank"), "fake-rerank")
    val got = rr.score(pairs, "query_text", "text")
      .select($"text", $"rr_score").as[(String, Long)].collect().toMap
    assert(got("alpha beta gamma") == 200000L)
    assert(got("zzz yyy") == 0L)
    assert(got("delta delta") == 200000L)
  }

  test("HttpAnswerer slots into RagServing.answerBatch behind the Answerer seam") {
    val docs = Seq(
      (1L, "alpha beta gamma\n\ndelta epsilon"),
      (2L, "supplier nation region data")).toDF("doc_id", "text")
    val embedder = graft.index.VectorIndex.fit(docs)
    val index = graft.index.VectorIndex.buildWith(docs, embedder)
    val questions = Seq((0L, "alpha beta")).toDF("query_id", "question")
    val out = graft.serve.RagServing.answerBatch(
      questions, index, embedder, k = 2,
      answerer = new HttpAnswerer(target("/v1/chat/completions"), "fake-chat"))
    val row = out.select("query_id", "answer").as[(Long, String)].head()
    assert(row._1 == 0L)
    assert(row._2.startsWith("A[alpha beta|ctxlen="), s"got: ${row._2}")
  }
}
