package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions exposes all functions to pure SQL") {
    // isolated session (not the shared fixture): the point is that NO
    // register() call happens — the injector alone must suffice. The
    // `spark.sql.extensions` *config* is a static conf read from the
    // SparkContext at its creation, so in a shared-context test JVM we
    // exercise the same injector through builder.withExtensions (the
    // API Spark itself routes the config through). Detach the shared
    // session so getOrCreate builds a fresh one on the shared context.
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("ext-test")
      .withExtensions(new GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    assert(spark.sessionState.functionRegistry
      .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier("topk_by_dist")),
      "extension did not inject (getOrCreate reused a session?)")
    try {
      val d = spark.sql(
        "SELECT l2_distance(array(CAST(0.0 AS FLOAT), CAST(3.0 AS FLOAT)), " +
          "array(CAST(4.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head.getDouble(0)
      assert(d == 5.0)
      val cos = spark.sql(
        "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head.getDouble(0)
      assert(cos == 1.0)
      val topk = spark.sql(
        """SELECT topk_by_dist(d, id, 2) FROM VALUES
          |  (3.0D, 30L), (1.0D, 10L), (2.0D, 20L) AS t(d, id)""".stripMargin)
        .head.getSeq[org.apache.spark.sql.Row](0)
      assert(topk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((1.0, 10L), (2.0, 20L)))
      val chunks = spark.sql(
        "SELECT recursive_split('aaa bbb ccc', 7, 2) AS (i, c)").collect()
      assert(chunks.nonEmpty)
      val ratio = spark.sql(
        "SELECT compression_ratio('spam spam spam spam spam spam spam spam')")
        .head.getDouble(0)
      assert(ratio > 0 && ratio < 1.0, s"repetitive text must compress, got $ratio")
      assert(spark.sql("SELECT compression_ratio(NULL)").head.getDouble(0) == 1.0)
      // pdf_extract over a synthesized binary literal, end to end in SQL
      val pdfHex = graft.ingest.PdfText.synthesize(Seq("sql extraction works"))
        .map("%02X".format(_)).mkString
      val text = spark.sql(s"SELECT pdf_extract(X'$pdfHex')").head.getString(0)
      assert(text == "sql extraction works", s"got: $text")
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
